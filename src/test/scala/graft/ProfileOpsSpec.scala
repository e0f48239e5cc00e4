package graft

import org.apache.spark.sql.functions._
import graft.operators.ProfileOps

/** Key-distribution profiler: exact fixed-point arithmetic on a
  * hand-built skewed table, the salt_factor → balanced-buckets contract
  * that ties the profile to the engine's salted-join machinery, and the
  * release discipline (no checkpoint RDD outlives a profiler call).
  */
class ProfileOpsSpec extends SparkSpec {
  import spark.implicits._

  // 4 keys: a hot one (60 rows), a warm one (30), two cold (6, 4) —
  // total 100 rows over 4 keys, mean 25
  private def skewed = Seq.fill(60)("hot") ++ Seq.fill(30)("warm") ++
    Seq.fill(6)("cold_a") ++ Seq.fill(4)("cold_b")

  test("keyProfile computes exact counts, fixed-point shares and salts") {
    val df = skewed.toDF("k")
    val rows = ProfileOps.keyProfile(df, "k", topN = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    // share_ppm = cnt·1e6 div 100; skew_x10k = cnt·4·1e4 div 100;
    // salt = exact ceil(cnt·4 / 100)
    assert(rows === Seq(
      (1, "hot", 60L, 600000L, 24000L, 3L),
      (2, "warm", 30L, 300000L, 12000L, 2L),
      (3, "cold_a", 6L, 60000L, 2400L, 1L)))
  }

  test("keyProfile rank ties break by key, deterministically") {
    val df = (Seq.fill(5)("b") ++ Seq.fill(5)("a") ++ Seq.fill(2)("c"))
      .toDF("k")
    val rows = ProfileOps.keyProfile(df, "k", topN = 3)
      .select("rank", "k").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(rows.toSeq === Seq((1, "a"), (2, "b"), (3, "c")))
  }

  test("keySummary matches the hand computation") {
    val df = skewed.toDF("k")
    val r = ProfileOps.keySummary(df, "k").head
    assert(r.getLong(0) === 100L)      // total_rows
    assert(r.getLong(1) === 4L)        // distinct_keys
    assert(r.getLong(2) === 60L)       // max_cnt
    assert(r.getLong(3) === 4L)        // min_cnt
    assert(r.getLong(4) === 250000L)   // avg_cnt_x10k = 25 × 1e4
    assert(r.getLong(5) === 24000L)    // skew_factor_x10k = 2.4 × 1e4
    assert(r.getLong(6) === 1000000L)  // top10_share_ppm (only 4 keys)
  }

  test("fixed-point division truncates (never rounds) on both ops") {
    // 3 keys over 7 rows: mean 7/3 — avg_cnt_x10k must be the exact
    // integral 23333, not a rounding-dependent 23333.33…
    val df = (Seq.fill(4)("x") ++ Seq.fill(2)("y") ++ Seq("z")).toDF("k")
    val s = ProfileOps.keySummary(df, "k").head
    assert(s.getLong(4) === 23333L)
    // x's share 4/7 → 571428.57… ppm, truncated
    val p = ProfileOps.keyProfile(df, "k", topN = 1).head
    assert(p.getLong(3) === 571428L)
    // skew 4·3/7 = 1.7142… → 17142; salt = ceil(12/7) = 2
    assert(p.getLong(4) === 17142L)
    assert(p.getLong(5) === 2L)
  }

  test("salt_factor splits the hot key back to ~mean-sized buckets") {
    val df = skewed.toDF("k")
    val salt = ProfileOps.keyProfile(df, "k", topN = 1)
      .head.getLong(5) // hot key's salt_factor = 3
    val bucketSizes = df.filter(col("k") === "hot")
      .withColumn("salt", pmod(crc32(monotonically_increasing_id()
        .cast("string")), lit(salt)))
      .groupBy("salt").count().collect().map(_.getLong(1))
    assert(bucketSizes.length === salt)
    // every salted bucket lands within 2× of the ideal 60/3 = 20
    assert(bucketSizes.forall(s => s <= 40),
      s"unbalanced salted buckets: ${bucketSizes.toSeq}")
  }

  test("profiler reads its input exactly once (counts materialized)") {
    val ev = graft.sources.Tables.events(spark, sf)
    // the audit hook is a shared mutable slot — it must be read right
    // after EACH call, not after both (a Seq of the two results would
    // evaluate both calls first and audit only the second plan, twice)
    for (run <- Seq(
        ("keyProfile", () => ProfileOps.keyProfile(ev, "user_id", 5)),
        ("keySummary", () => ProfileOps.keySummary(ev, "user_id")))) {
      run._2().collect()
      val plan = ProfileOps.lastPlanForAudit
      val scans = plan.split("Scan parquet").length - 1
      assert(scans <= 1,
        s"${run._1} should scan the input at most once, saw $scans:\n$plan")
    }
  }

  test("profiler releases its checkpoint RDD before returning") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    val ev = graft.sources.Tables.events(spark, sf)
    ProfileOps.keyProfile(ev, "user_id", 5).collect()
    ProfileOps.keySummary(ev, "user_id").collect()
    val leaked = sc.getPersistentRDDs.keySet.toSet -- before
    assert(leaked.isEmpty,
      s"profiler left persisted RDDs behind: $leaked")
  }

  test("summary and profile agree with each other on the live table") {
    val ev = graft.sources.Tables.events(spark, sf)
    val summary = ProfileOps.keySummary(ev, "user_id").head
    val top = ProfileOps.keyProfile(ev, "user_id", topN = 1).head
    assert(top.getLong(2) === summary.getLong(2),
      "profile rank-1 count must equal summary max_cnt")
    assert(summary.getLong(0) === ev.count())
  }
}
