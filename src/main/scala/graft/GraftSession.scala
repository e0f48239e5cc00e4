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
    // partitions per partition, AND ≥3× smaller than the probe side)
    // — most of this engine's joins feed aggregations or very wide
    // fan-outs, where SMJ's sort buys nothing downstream. HONEST
    // CAVEAT: the static planner's bound is a Catalyst size ESTIMATE,
    // and SHJ's build map does not spill — a badly under-estimated
    // build side (post-filter/post-agg subtrees are the classic case)
    // that would have sorted-and-spilled under SMJ can OOM a task
    // under SHJ. The 3×-smaller + per-partition-bound conditions keep
    // that window narrow, and a deployment that hits it turns this
    // one conf back on. The AQE twin below is the safe half: it
    // converts remaining SMJs at runtime from MEASURED map output
    // (every post-shuffle partition under 64 MB) — runtime-sized,
    // scale-adaptive by construction.
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
