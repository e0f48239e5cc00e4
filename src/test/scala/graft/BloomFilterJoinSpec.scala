package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (enabled in
  * [[GraftSession.configure]]): when a shuffle join has a selective
  * creation side, the optimizer injects a `might_contain` filter into
  * the probe-side scan so most fact rows never enter the shuffle. The
  * production size thresholds are the defaults (10 GB probe-side
  * floor); this spec lowers them to test scale to pin the plan shape
  * and verify result-invariance.
  */
class BloomFilterJoinSpec extends SparkSpec {

  test("selective shuffle join injects a probe-side bloom filter") {
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
    try {
      val li = sources.Tables.lineitem(spark, "/root/testdata/sf0.01")
      val ords = sources.Tables.orders(spark, "/root/testdata/sf0.01")
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = li.join(ords, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      assert(j.queryExecution.optimizedPlan.toString.contains("might_contain"),
        "expected a runtime bloom filter on the probe side")
      val withBloom = j.collect()

      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val without = li.join(ords, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      assert(!without.queryExecution.optimizedPlan.toString.contains("might_contain"))
      assert(withBloom.toSeq === without.collect().toSeq,
        "bloom pruning must not change results")
    } finally {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
