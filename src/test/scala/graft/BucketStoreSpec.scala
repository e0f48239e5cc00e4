package graft

import org.apache.spark.sql.functions._
import graft.operators.BucketStore
import graft.sources.Tables

/** The bucketed store's whole contract: the layout changes the PLAN
  * (no exchange under the co-located join, bucket-pruned lookups),
  * never the ANSWER (row-for-row equal to the raw-table twins), and
  * survives a cold re-open and a rebuild.
  */
class BucketStoreSpec extends SparkSpec {

  private lazy val root = {
    val r = tmpDir("bucket-spec")
    BucketStore.create(Tables.orders(spark, sf),
      s"$r/orders", "o_orderkey", 8)
    BucketStore.create(Tables.lineitem(spark, sf),
      s"$r/lineitem", "l_orderkey", 8)
    r
  }

  private def withConf[A](key: String, value: String)(body: => A): A = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  private def bucketedJoin() =
    BucketStore.table(spark, s"$root/orders")
      .join(BucketStore.table(spark, s"$root/lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select("o_orderkey", "l_linenumber", "o_orderpriority")

  test("co-located join plans with zero exchange and zero sort; raw twin shuffles both sides") {
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val p = bucketedJoin().queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty,
        s"bucketed join must not shuffle either side:\n$p")
      assert(p.contains("SortMergeJoin"), s"expected an SMJ:\n$p")
      // SORTED BY elimination additionally needs the scan to report
      // its ordering (one file per bucket — create()'s repartition
      // guarantees it — plus the opt-in conf; see BucketStore docs).
      // Sort operator nodes print as `Sort [key ...` — distinct from
      // the SortMergeJoin node itself.
      withConf("spark.sql.legacy.bucketedTableScan.outputOrdering",
               "true") {
        val ps = bucketedJoin().queryExecution.executedPlan.toString
        assert("Sort \\[".r.findAllIn(ps).isEmpty,
          s"sorted buckets must remove the SMJ sorts:\n$ps")
      }

      val raw = Tables.orders(spark, sf)
        .join(Tables.lineitem(spark, sf),
          col("o_orderkey") === col("l_orderkey"))
        .select("o_orderkey", "l_linenumber", "o_orderpriority")
      val pr = raw.queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(pr).length >= 2,
        s"raw twin should shuffle both sides:\n$pr")

      assert(bucketedJoin().collect().toSet === raw.collect().toSet,
        "layout must not change the join answer")
    }
  }

  test("point lookup reads 1 bucket per key and never touches the " +
    "caller session's conf (child-session scoping)") {
    val auto = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    // audit the plan the lookup executes under: same conf, same scan
    withConf(auto, "false") {
      val p = spark.table(BucketStore.open(spark, s"$root/orders"))
        .filter(col("o_orderkey") === 411)
        .queryExecution.executedPlan.toString
      assert(p.contains("SelectedBucketsCount: 1 out of 8"),
        s"single-key lookup must prune to one bucket:\n$p")
    }
    // pin the caller's conf to TRUE for the duration: the old
    // set/restore window flipped the shared session conf mid-flight
    // (any concurrently-planned query silently lost auto bucketed
    // scans); the child-session lookup must leave the caller's value
    // untouched at every instant — the end-state check below would
    // pass under set/restore too, but a flipped child can never write
    // back here at all
    withConf(auto, "true") {
      val got = BucketStore.pointLookup(spark, s"$root/orders",
        Seq(7L, 411L, 1234L))
        .select("o_orderkey").collect().map(_.getLong(0)).sorted
      assert(got === Array(7L, 411L, 1234L))
      assert(spark.conf.get(auto) === "true",
        "pointLookup must not mutate the caller session's conf")
    }
  }

  test("cold re-open from the persisted meta alone keeps the bucketed plan") {
    // drop the catalog entries — the fresh-session simulation (the
    // in-memory catalog is shared state, so a real second session in
    // this JVM would see the same entries)
    spark.sql(s"DROP TABLE IF EXISTS " +
      BucketStore.registeredName(s"$root/orders"))
    spark.sql(s"DROP TABLE IF EXISTS " +
      BucketStore.registeredName(s"$root/lineitem"))
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val p = bucketedJoin().queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty,
        s"re-opened join must stay exchange-free:\n$p")
    }
  }

  test("rebuild over a live store swaps atomically; readers land on the new generation") {
    val r = tmpDir("bucket-rebuild")
    val v1 = Tables.orders(spark, sf).filter(col("o_orderkey") < 100)
    BucketStore.create(v1, s"$r/orders", "o_orderkey", 8)
    assert(BucketStore.table(spark, s"$r/orders").count() === v1.count())
    val v2 = Tables.orders(spark, sf).filter(col("o_orderkey") < 500)
    BucketStore.create(v2, s"$r/orders", "o_orderkey", 8)
    assert(BucketStore.table(spark, s"$r/orders").count() === v2.count(),
      "post-rebuild reads must serve the new generation")
  }

  test("co-located guard rejects mismatched bucket counts loudly") {
    val r = tmpDir("bucket-mismatch")
    BucketStore.create(Tables.orders(spark, sf),
      s"$r/o4", "o_orderkey", 4)
    val e = intercept[IllegalArgumentException] {
      BucketStore.requireCoBucketed(spark, s"$root/orders", s"$r/o4")
    }
    assert(e.getMessage.contains("equal bucket counts"))
  }

  test("gates run at sf0.001 and match their raw-table twins") {
    val j = SparkEntry.queries("join_bucketed")(spark, sf).collect()
    assert(j.length === 5)
    assert(j.map(_.getAs[Long]("line_count")).sum ===
      Tables.lineitem(spark, sf).count())
    val lk = SparkEntry.queries("bucket_pruned_lookup")(spark, sf)
      .collect()
    assert(lk.map(_.getAs[Long]("o_orderkey")).toList ===
      List(7L, 411L, 1234L))
  }

  test("lookup child session tracks caller conf both ways: sets " +
      "propagate, REMOVALS propagate too (ADVICE r9)") {
    val key = "spark.graft.test.bucket-conf-probe"
    // first lookup materialises the child for this caller session
    BucketStore.pointLookup(spark, s"$root/orders", Seq(7L)).count()
    val child = BucketStore.lookupChildren.synchronized {
      BucketStore.lookupChildren.get(spark)._1
    }
    spark.conf.set(key, "on")
    try {
      BucketStore.pointLookup(spark, s"$root/orders", Seq(7L)).count()
      assert(child.conf.get(key) == "on", "caller set must reach the child")
    } finally spark.conf.unset(key)
    // the stale-override half: after the caller UNSETS, the next
    // lookup must scrub the key from the child (the rotated-credential
    // persistence window)
    BucketStore.pointLookup(spark, s"$root/orders", Seq(7L)).count()
    assert(child.conf.getOption(key).isEmpty,
      "a key the caller removed must not persist in the lookup child")
    // the bucketed-scan override itself must survive every sync
    assert(child.conf.get(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled") == "false")
  }
}
