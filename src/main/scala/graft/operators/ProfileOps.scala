package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Key-distribution profiling: the dial you read BEFORE choosing a
  * join strategy. At 100 TB the difference between a clean shuffle
  * join and a straggler that never finishes is one hot key — this
  * operator measures exactly that, cheaply, and turns it into the
  * concrete knobs the engine's skew machinery takes
  * (`RelationalQueries.saltedJoin`'s bucket count, AQE's skew-join
  * threshold, a broadcast decision).
  *
  * Shape: one partial-agg shuffle on the key (`groupBy(key).count` —
  * map-side combine makes the exchange carry one row per distinct key
  * per task, not one per input row), then a one-row summary aggregate
  * broadcast back over the heavy-hitter rows. The heavy-hitter list
  * itself is `TakeOrderedAndProject` (top-N without a global sort).
  * Nothing here collects rows proportional to the input.
  */
object ProfileOps {

  /** Top-N heavy hitters with the skew arithmetic attached.
    *
    * Output per hitter: `rank` (by count desc, key asc — total order,
    * so the result is deterministic), `cnt`, `share` of all rows,
    * `skew` = cnt / mean-per-key (1.0 = perfectly uniform), and
    * `salt_factor` = ceil(skew) — the replication factor that splits
    * this key back to ~mean-sized partitions, i.e. the number a salted
    * join/agg should use for its bucket count.
    */
  def keyProfile(df: DataFrame, key: String, topN: Int = 20): DataFrame = {
    // materialize the per-key counts ONCE: the summary and the top-N
    // branch would otherwise each replay the full input scan (measured:
    // zero ReusedExchange across the two aggregate branches). The
    // checkpoint is bounded by the distinct-key count — the profiler's
    // natural intermediate — so the input is read exactly once however
    // many statistics are derived from it.
    // lazy checkpoint: materializes on FIRST execution (construction
    // of the profile plan stays free), then every derived statistic
    // reads the bounded counts instead of replaying the input scan
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false)
    val summary = counts.agg(
      sum("cnt").as("__total"),
      count(lit(1)).as("__keys"))
    val top = counts
      .orderBy(col("cnt").desc, col(key).asc)
      .limit(topN)
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("cnt").desc, col(key).asc)
    // the window runs over the already-top-N rows (≤ topN of them), so
    // the single-partition sort it implies is bounded by N, not |df|
    top.crossJoin(broadcast(summary))
      .withColumn("rank", row_number().over(w))
      .withColumn("share", round(col("cnt") / col("__total"), 6))
      // cnt·keys as DOUBLE: two longs can genuinely overflow at the
      // scales this profiler targets (1e10-row hot key × 1e9 keys),
      // and the result only feeds a rounded ratio / a ceil
      .withColumn("skew",
        round(col("cnt").cast("double") * col("__keys") / col("__total"), 4))
      .withColumn("salt_factor",
        ceil(col("cnt").cast("double") * col("__keys") / col("__total"))
          .cast("long"))
      .select(col("rank"), col(key), col("cnt"), col("share"), col("skew"),
        col("salt_factor"))
  }

  /** One-row distribution summary: the numbers a planner (or a human
    * sizing `spark.sql.shuffle.partitions`) wants before shuffling on
    * this key. `skew_factor` = max key count / mean key count;
    * `top10_share` = fraction of all rows held by the 10 hottest keys
    * (a high value says "broadcast or salt, don't plain-shuffle").
    */
  def keySummary(df: DataFrame, key: String): DataFrame = {
    // one input scan (the keyProfile lazy-materialization rationale)
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false)
    val top10 = counts.orderBy(col("cnt").desc, col(key).asc).limit(10)
      .agg(sum("cnt").as("__top10"))
    counts.agg(
      sum("cnt").as("total_rows"),
      count(lit(1)).as("distinct_keys"),
      max("cnt").as("max_cnt"),
      min("cnt").as("min_cnt"))
      .crossJoin(broadcast(top10))
      .withColumn("avg_cnt",
        round(col("total_rows") / col("distinct_keys"), 4))
      .withColumn("skew_factor",
        round(col("max_cnt").cast("double") * col("distinct_keys") /
          col("total_rows"), 4))
      .withColumn("top10_share", round(col("__top10") / col("total_rows"), 6))
      .select("total_rows", "distinct_keys", "max_cnt", "min_cnt", "avg_cnt",
        "skew_factor", "top10_share")
  }
}
