package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.HistoryOps

/** SCD2 construction invariants on hand-built change logs (collapse,
  * versioning, interval algebra, same-instant ties) and the
  * point-in-time join's at-most-one-match / boundary semantics.
  */
class HistoryOpsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new Timestamp(s * 1000L)

  // key 1: a→a→b→b→a (collapses to a, b, a); key 2: single row
  private def changes = Seq(
    (1L, t(10), 101L, "a"), (1L, t(20), 102L, "a"),
    (1L, t(30), 103L, "b"), (1L, t(40), 104L, "b"),
    (1L, t(50), 105L, "a"),
    (2L, t(15), 201L, "x"))
    .toDF("k", "ts", "id", "state")

  private def dim = HistoryOps.scd2(changes, "k", "ts",
    Seq("state"), Seq("id"))

  test("scd2 collapses no-op changes, versions in order, and carries " +
    "the pre-collapse change frontier") {
    val got = dim.orderBy("k", "version")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getBoolean(5),
        r.getTimestamp(6)))
    assert(got.toSeq === Seq(
      (1L, 1, "a", t(10), Some(t(30)), false, t(50)),
      (1L, 2, "b", t(30), Some(t(50)), false, t(50)),
      (1L, 3, "a", t(50), None, true, t(50)),
      (2L, 1, "x", t(15), None, true, t(15))))
  }

  test("last_changed advances past the last retained valid_from when " +
    "the newest change is a collapsed no-op") {
    val log = Seq((1L, t(10), 1L, "a"), (1L, t(20), 2L, "a"))
      .toDF("k", "ts", "id", "state")
    val d = HistoryOps.scd2(log, "k", "ts", Seq("state"), Seq("id"))
      .collect()
    assert(d.length === 1)
    assert(d.head.getTimestamp(3) === t(10), "one retained version")
    assert(d.head.getTimestamp(6) === t(20),
      "frontier must cover the collapsed change")
  }

  test("scd2 intervals tile the key's lifetime: each valid_to is the " +
    "next valid_from, exactly one open version per key") {
    val d = dim
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("k").orderBy("version")
    val bad = d.withColumn("next_from", lead("valid_from", 1).over(w))
      .filter(col("valid_to").isNotNull &&
        (col("valid_to") =!= col("next_from")))
    assert(bad.count() === 0)
    val open = d.filter(col("is_current")).groupBy("k").count()
      .filter(col("count") =!= 1)
    assert(open.count() === 0)
  }

  test("same-instant changes version by the tie-break and leave a " +
    "zero-length interval no probe can land in") {
    val log = Seq((1L, t(10), 1L, "a"), (1L, t(10), 2L, "b"),
      (1L, t(20), 3L, "c")).toDF("k", "ts", "id", "state")
    val d = HistoryOps.scd2(log, "k", "ts", Seq("state"), Seq("id"))
    val got = d.orderBy("version").collect()
      .map(r => (r.getInt(1), r.getString(2), r.getTimestamp(3),
        Option(r.getTimestamp(4))))
    assert(got.toSeq === Seq(
      (1, "a", t(10), Some(t(10))),
      (2, "b", t(10), Some(t(20))),
      (3, "c", t(20), None)))
    // a probe AT the shared instant resolves to the later version
    val probe = Seq((1L, 7L, t(10))).toDF("k", "pid", "at")
    val hit = HistoryOps.pointInTime(probe, d, "k", "at")
      .select("pid", "version").collect()
    assert(hit.map(r => (r.getLong(0), r.getInt(1))).toSeq ===
      Seq((7L, 2)))
  }

  test("pointInTime matches at most one version, half-open at the " +
    "right edge, and left-keeps unmatched probes") {
    val probes = Seq(
      (1L, 1L, t(5)),   // before first version → null dim
      (1L, 2L, t(10)),  // inclusive left edge of v1
      (1L, 3L, t(29)),  // inside v1
      (1L, 4L, t(30)),  // boundary: v1 closed, v2 opens
      (1L, 5L, t(99)),  // open current version
      (9L, 6L, t(10)))  // unknown key → null dim
      .toDF("k", "pid", "at")
    val got = HistoryOps.pointInTime(probes, dim, "k", "at")
      .select("pid", "version")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(got === Map(1L -> -1, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 3,
      6L -> -1))
    // at-most-one: probe count preserved
    assert(HistoryOps.pointInTime(probes, dim, "k", "at").count() === 6)
  }

  test("scd2 null-state transitions: NULL→value and value→NULL open " +
    "versions, NULL→NULL collapses") {
    val log = Seq((1L, t(10), 1L, null), (1L, t(20), 2L, null),
      (1L, t(30), 3L, "a"), (1L, t(40), 4L, null))
      .toDF("k", "ts", "id", "state")
    val d = HistoryOps.scd2(log, "k", "ts", Seq("state"), Seq("id"))
    val got = d.orderBy("version").collect()
      .map(r => (r.getInt(1), Option(r.getString(2))))
    assert(got.toSeq === Seq((1, None), (2, Some("a")), (3, None)))
  }

  test("scd2 result is partition-independent") {
    val a = dim.collect().toSet
    val b = HistoryOps.scd2(changes.repartition(7), "k", "ts",
      Seq("state"), Seq("id")).collect().toSet
    assert(a === b)
  }

  test("scd2Extend(scd2(a), b) equals scd2(a ∪ b): continuation " +
    "collapse, reopened state, new key, untouched key") {
    val batch = Seq(
      (1L, t(60), 301L, "a"),  // same state as k1's open tail → collapse
      (1L, t(70), 302L, "b"),  // then a real change
      (3L, t(5), 303L, "z"))   // brand-new key, batch-only
      .toDF("k", "ts", "id", "state") // k2 untouched
    val inc = HistoryOps.scd2Extend(dim, batch, "k", "ts",
      Seq("state"), Seq("id")).collect().toSet
    val full = HistoryOps.scd2(changes.unionByName(batch), "k", "ts",
      Seq("state"), Seq("id")).collect().toSet
    assert(inc === full)
    // the untouched key's row really is the original object
    assert(inc.exists(r => r.getLong(0) == 2L && r.getBoolean(5)))
  }

  test("scd2Extend rejects a batch row at or before the stored tail") {
    val stale = Seq((1L, t(50), 999L, "q")).toDF("k", "ts", "id", "state")
    val e = intercept[Exception] {
      HistoryOps.scd2Extend(dim, stale, "k", "ts",
        Seq("state"), Seq("id")).collect()
    }
    assert(e.getMessage.contains("append-only") ||
      Option(e.getCause).exists(_.getMessage.contains("append-only")))
  }

  test("scd2Extend guard covers COLLAPSED changes: a batch row after " +
    "the retained valid_from but before a collapsed no-op rejects") {
    // stored (t10,a),(t20,a) collapses to one version @t10 with
    // frontier t20; batch (t15,b) sits inside decided history — a
    // max(valid_from) guard would admit it and silently produce a
    // history diverging from the full rebuild
    val log = Seq((1L, t(10), 1L, "a"), (1L, t(20), 2L, "a"))
      .toDF("k", "ts", "id", "state")
    val d = HistoryOps.scd2(log, "k", "ts", Seq("state"), Seq("id"))
    val batch = Seq((1L, t(15), 3L, "b")).toDF("k", "ts", "id", "state")
    val e = intercept[Exception] {
      HistoryOps.scd2Extend(d, batch, "k", "ts",
        Seq("state"), Seq("id")).collect()
    }
    assert(e.getMessage.contains("append-only") ||
      Option(e.getCause).exists(_.getMessage.contains("append-only")))
    // while a row past the frontier extends fine and matches rebuild
    val ok = Seq((1L, t(25), 3L, "b")).toDF("k", "ts", "id", "state")
    val inc = HistoryOps.scd2Extend(d, ok, "k", "ts",
      Seq("state"), Seq("id")).collect().toSet
    val full = HistoryOps.scd2(log.unionByName(ok), "k", "ts",
      Seq("state"), Seq("id")).collect().toSet
    assert(inc === full)
  }

  test("scd2Extend replay order is version-true for string tie " +
    "columns with 10+ same-instant stored versions") {
    // 11 same-instant changes tie-broken by a STRING id ("i01".."i11"
    // sort correctly; a version-cast-to-string replay would re-sort
    // '10','11' before '2' and renumber history)
    val log = (1 to 11).map(i =>
      (1L, t(10), f"i$i%02d", s"s$i")) :+ ((1L, t(20), "i99", "s11"))
    val d = HistoryOps.scd2(log.toDF("k", "ts", "id", "state"),
      "k", "ts", Seq("state"), Seq("id"))
    val batch = Seq((1L, t(30), "j01", "zz")).toDF("k", "ts", "id", "state")
    val inc = HistoryOps.scd2Extend(d, batch, "k", "ts",
      Seq("state"), Seq("id")).collect().toSet
    val full = HistoryOps.scd2(
      log.toDF("k", "ts", "id", "state").unionByName(batch),
      "k", "ts", Seq("state"), Seq("id")).collect().toSet
    assert(inc === full)
  }
}
