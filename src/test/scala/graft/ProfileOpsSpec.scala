package graft

import org.apache.spark.sql.functions._
import graft.operators.ProfileOps

/** Key-distribution profiler: exact arithmetic on a hand-built skewed
  * table, and the salt_factor → balanced-buckets contract that ties the
  * profile to the engine's salted-join machinery.
  */
class ProfileOpsSpec extends SparkSpec {
  import spark.implicits._

  // 4 keys: a hot one (60 rows), a warm one (30), two cold (6, 4) —
  // total 100 rows over 4 keys, mean 25
  private def skewed = Seq.fill(60)("hot") ++ Seq.fill(30)("warm") ++
    Seq.fill(6)("cold_a") ++ Seq.fill(4)("cold_b")

  test("keyProfile computes exact counts, shares and salt factors") {
    val df = skewed.toDF("k")
    val rows = ProfileOps.keyProfile(df, "k", topN = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5))).toSeq
    assert(rows === Seq(
      (1, "hot", 60L, 0.6, 2.4, 3L),
      (2, "warm", 30L, 0.3, 1.2, 2L),
      (3, "cold_a", 6L, 0.06, 0.24, 1L)))
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
    assert(r.getLong(0) === 100L)     // total_rows
    assert(r.getLong(1) === 4L)       // distinct_keys
    assert(r.getLong(2) === 60L)      // max_cnt
    assert(r.getLong(3) === 4L)       // min_cnt
    assert(r.getDouble(4) === 25.0)   // avg_cnt
    assert(r.getDouble(5) === 2.4)    // skew_factor
    assert(r.getDouble(6) === 1.0)    // top10_share (only 4 keys)
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
    for (df <- Seq(ProfileOps.keyProfile(ev, "user_id", 5),
        ProfileOps.keySummary(ev, "user_id"))) {
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val scans = plan.split("Scan parquet").length - 1
      assert(scans <= 1,
        s"profiler should scan the input at most once, saw $scans:\n$plan")
    }
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
