package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the confs this engine relies on.
  *
  * Tuned for the local[32] test harness but the settings are the ones a
  * 1000-executor deployment would want too: AQE on (runtime re-plan, skew
  * join splitting), partition coalescing, and a shuffle-partition count
  * sized to the parallelism at hand rather than the 200 default.
  */
object GraftSession {

  /** Apply engine-required SQL confs to an externally-created session
    * (e.g. the driver's Verify/Bench session). Safe to call repeatedly.
    */
  def configure(spark: SparkSession): SparkSession = {
    // The driver's synthetic `events` table carries TIMESTAMP(NANOS)
    // parquet columns, which Spark rejects natively; read them as raw
    // nanosecond longs and convert in Tables.readTable.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // runtime bloom-filter join pruning: a selective dimension side
    // injects a might_contain() filter into the fact-side scan of a
    // shuffle join — at 100 TB that skips most of the probe shuffle.
    // Pinned on (it is the Spark 4 default) with the default size
    // thresholds: the 10 GB application-side floor is the right guard
    // against paying the filter build on small scans.
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // optimization r13 (guide §3.1/§9): let the planner choose
    // shuffled-hash over sort-merge when its own size conditions hold
    // (build side under autoBroadcastJoinThreshold × shuffle
    // partitions per partition) — most of this engine's joins feed
    // aggregations or very wide fan-outs, where SMJ's sort buys
    // nothing downstream. NOT a forced hint: the planner still
    // sort-merges anything it cannot size-bound, so spill safety at
    // 100 TB is unchanged. The AQE twin converts remaining SMJs at
    // runtime when every post-shuffle partition is under 64 MB —
    // runtime-measured, scale-adaptive by construction.
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    spark.conf.set(
      "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
    graft.functions.GraftFunctions.register(spark)
    spark.udf.register("geomean",
      org.apache.spark.sql.functions.udaf(graft.functions.GeoMean))
    graft.core.Metrics.attach(spark)
    spark
  }

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    configure(spark)
  }
}
