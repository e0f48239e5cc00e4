package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted EXACT materialized rollup — the incremental-view answer
  * to "never re-aggregate the fact table": per-key mergeable measures
  * (`cnt`, `sum`, `min`, `max`) stored at a fine grain and maintained
  * by DELTA, so a 100 TB fact history is scanned once ever and each
  * new batch costs one partial aggregation of the batch plus a merge
  * against rows-per-key state — never a recompute. Eighth persisted
  * family, completing the aggregation spectrum the sketch stores
  * bound from the approximate side ([[SketchStore]] distinct,
  * [[FrequencyStore]] frequency): this one is exact, because the
  * measures form a commutative monoid and merging partial aggregates
  * IS the aggregation (Spark's own map-side-combine algebra, made
  * durable).
  *
  * Serving is where the store earns its keep: the stored grain
  * answers its own GROUP BY as a bounded read, and — because every
  * measure is mergeable — any COARSER grouping re-aggregates from
  * stored rows-per-key rows instead of fact rows ([[rollup]]): the
  * classic materialized-view rewrite, done explicitly.
  *
  * Crash posture = [[FrequencyStore]]'s (merge is ADDITIVE, so replay
  * double-counts): exactly-once per (producer, batchId) via the
  * applied-batch ledger, with data + meta + ledger published in ONE
  * staged atomic swap ([[IndexStores.swapInto]]) — a crash anywhere
  * leaves the previous generation with the batch absent from the
  * ledger, and the replay applies it exactly once. Single quiesced
  * producer by contract; a generation tripwire rejects a detected
  * concurrent writer loudly.
  */
object RollupStore {

  /** Partial-aggregate `df` to the store grain: one map-side-combined
    * exchange on the key columns; every output measure is mergeable.
    * `valueCol` must be exactly representable in DECIMAL(38,4) (the
    * caller picks a fixed-point-safe measure; sums over it are then
    * exact in any engine).
    */
  private def partial(df: DataFrame, keyCols: Seq[String],
      valueCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("cnt"),
      sum(col(valueCol).cast("decimal(38,4)")).as("sum_val"),
      min(col(valueCol).cast("decimal(38,4)")).as("min_val"),
      max(col(valueCol).cast("decimal(38,4)")).as("max_val"))

  /** Merge two frames of per-key partial aggregates: the monoid ops,
    * one exchange on the key. `sum` of DECIMAL(38,4) re-aggregates at
    * DECIMAL(38,4) (Spark widens sum-of-decimal precision only up to
    * 38, already there), so merge is closed over the stored schema.
    */
  private def merge(frames: Seq[DataFrame],
      keyCols: Seq[String]): DataFrame =
    frames.reduce(_ unionByName _)
      .groupBy(keyCols.map(col): _*).agg(
        sum("cnt").as("cnt"),
        sum("sum_val").cast("decimal(38,4)").as("sum_val"),
        min("min_val").as("min_val"),
        max("max_val").as("max_val"))

  /** Build the store: aggregate `df` to the declared grain and publish
    * generation 1.
    */
  def write(df: DataFrame, path: String, keyCols: Seq[String],
      valueCol: String): Unit =
    publish(df.sparkSession, path,
      partial(df, keyCols, valueCol), keyCols, valueCol,
      batches = Seq.empty, generation = 1L)

  /** Merge a batch into the store, exactly once per (producer,
    * batchId). Cost: one partial aggregation of the BATCH + one merge
    * against stored rows-per-key rows — the fact history is never
    * re-read. A ledger hit is a crash-replay and returns untouched; an
    * absent store bootstraps at the declared grain; a grain mismatch
    * rejects loudly (rollups of different keys share no algebra).
    */
  def extend(df: DataFrame, path: String, batchId: Long,
      keyCols: Seq[String], valueCol: String,
      producer: String = "default"): Unit = {
    val spark = df.sparkSession
    IndexStores.healRoot(spark, path)
    if (!IndexStores.hasStore(spark, s"$path/data")) {
      publish(spark, path, partial(df, keyCols, valueCol), keyCols,
        valueCol, batches = Seq((producer, batchId)), generation = 1L)
      return
    }
    val m = metaOf(spark, path)
    require(m.keyCols == keyCols && m.valueCol == valueCol,
      s"rollup store at $path holds grain (${m.keyCols.mkString(",")}; " +
        s"${m.valueCol}); extend declared (${keyCols.mkString(",")}; " +
        s"$valueCol)")
    val applied = appliedBatches(spark, path)
    if (applied.contains((producer, batchId))) return // replay — merged
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    try {
      // pin BEFORE the swap: `merged` reads the store's own parquet —
      // writing the new generation over the path a lazy plan still
      // scans would race the swap against its own input. Release is
      // RDD-level (Dataset.unpersist is a no-op on checkpoints)
      val merged = merge(
        Seq(IndexStores.readStore(spark, s"$path/data"),
          partial(df, keyCols, valueCol)), keyCols)
        .localCheckpoint(true)
      val gNow = metaOf(spark, path).generation
      require(gNow == m.generation,
        s"rollup store at $path advanced (generation ${m.generation} " +
          s"-> $gNow) during extend — a second concurrent writer is " +
          "merging into this store; serialise producers")
      publish(spark, path, merged, keyCols, valueCol,
        batches = applied :+ ((producer, batchId)),
        generation = m.generation + 1L)
    } finally graft.BenchUtil.releaseNewRdds(sc, before)
  }

  /** The materialized rollup at its stored grain: a bounded read of
    * rows-per-key rows — no fact scan, no aggregation.
    */
  def serve(spark: SparkSession, path: String): DataFrame = {
    IndexStores.healRoot(spark, path)
    IndexStores.readStore(spark, s"$path/data")
  }

  /** A COARSER grouping served from the store — the materialized-view
    * rewrite: re-aggregate stored partials over `coarseKeys` (must be
    * a subset of the stored grain). Exact because every measure is
    * mergeable; cost is rows-per-stored-key, not fact rows.
    */
  def rollup(spark: SparkSession, path: String,
      coarseKeys: Seq[String]): DataFrame = {
    IndexStores.healRoot(spark, path)
    val m = metaOf(spark, path)
    require(coarseKeys.forall(m.keyCols.contains),
      s"coarse keys (${coarseKeys.mkString(",")}) must be a subset of " +
        s"the stored grain (${m.keyCols.mkString(",")})")
    merge(Seq(IndexStores.readStore(spark, s"$path/data")), coarseKeys)
  }

  /** One-row monitoring surface: grain, stored-key count, total
    * ingested rows, applied batches, generation.
    */
  def stats(spark: SparkSession, path: String): DataFrame = {
    IndexStores.healRoot(spark, path)
    val m = metaOf(spark, path)
    val d = IndexStores.readStore(spark, s"$path/data")
      .agg(count(lit(1)), coalesce(sum("cnt"), lit(0L))).head
    import spark.implicits._
    Seq((m.keyCols.mkString(","), m.valueCol, d.getLong(0),
      d.getLong(1), appliedBatches(spark, path).size.toLong,
      m.generation))
      .toDF("key_cols", "value_col", "stored_keys", "total_rows",
        "applied_batches", "generation")
  }

  private final case class Meta(keyCols: Seq[String], valueCol: String,
      generation: Long)

  private def metaOf(spark: SparkSession, path: String): Meta = {
    val r = IndexStores.readStore(spark, s"$path/meta").head
    Meta(r.getAs[String]("key_cols").split(",").toSeq,
      r.getAs[String]("value_col"), r.getAs[Long]("generation"))
  }

  private def appliedBatches(spark: SparkSession,
      path: String): Seq[(String, Long)] =
    if (!IndexStores.hasStore(spark, s"$path/batches")) Seq.empty
    else IndexStores.readStore(spark, s"$path/batches")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted

  /** Stage one complete generation (data + meta + ledger) and swap it
    * in atomically — the single publish path write, bootstrap and
    * merge all share.
    */
  private def publish(spark: SparkSession, path: String,
      data: DataFrame, keyCols: Seq[String], valueCol: String,
      batches: Seq[(String, Long)], generation: Long): Unit = {
    import spark.implicits._
    val staging = IndexStores.stagingFor(spark, path)
    data.write.mode("overwrite").parquet(s"$staging/data")
    Seq((keyCols.mkString(","), valueCol, generation))
      .toDF("key_cols", "value_col", "generation").coalesce(1)
      .write.mode("overwrite").parquet(s"$staging/meta")
    if (batches.nonEmpty)
      batches.toDF("producer", "batch_id").coalesce(1)
        .write.mode("overwrite").parquet(s"$staging/batches")
    IndexStores.swapInto(spark, path, staging)
  }
}
