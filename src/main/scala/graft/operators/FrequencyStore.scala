package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Persisted Count-Min frequency store — per-item occurrence counts
  * over an unbounded ingest stream under fixed memory: the
  * heavy-hitter / frequency-threshold dial (stop-shingle caps, DF
  * caps, domain quotas) as a stored artifact that keeps absorbing
  * batches. Seventh persisted family, and the deliberate design
  * CONTRAST to [[SketchStore]]:
  *
  *  - KMV merge is set-semantics IDEMPOTENT → replayed batches heal to
  *    a no-op with no bookkeeping.
  *  - CMS merge is ADDITIVE (cell-wise counter sums) → a replayed
  *    batch would DOUBLE-COUNT, so this store carries an applied-batch
  *    ledger and [[extend]] is exactly-once by batch id: sketch,
  *    meta and ledger update in ONE staged atomic swap, so a crash at
  *    any point leaves the previous generation with the batch absent
  *    from the ledger, and the replay applies it exactly once — the
  *    [[ShardManifest]] recovery posture applied to a sketch.
  *
  * Both merges are EXACT algebra: same (eps, confidence, seed) means
  * the same counter matrix, so `write(a); extend(b)` equals
  * `write(a ∪ b)` counter-for-counter (spec-pinned) and the
  * store-served gate can share the in-session gate's oracle verbatim.
  *
  * Layout under `path`: `sketch/` one row `(bytes)`, `meta/` one row
  * `(eps, confidence, seed, total_items)`, `batches/` applied batch
  * ids. The sketch is Spark's own `count_min_sketch` aggregate output
  * (merge-combinable counter matrix built map-side); serving is
  * [[graft.functions.Cms.estimate]] — the plan-riding-object probe,
  * a pure projection with no join and no shuffle.
  */
object FrequencyStore {

  /** Build the store over a corpus: one `count_min_sketch` aggregation
    * (map-side partials, one small binary result), staged + atomic
    * swap.
    */
  def write(df: DataFrame, key: Column, path: String,
      eps: Double = 0.001, confidence: Double = 0.99,
      seed: Int = 42): Unit = {
    val spark = df.sparkSession
    val staging = IndexStores.stagingFor(spark, path)
    writeGeneration(spark, staging, sketchOf(df, key, eps, confidence,
      seed), eps, confidence, seed,
      totalItems = df.filter(key.isNotNull).count(), batchIds = Seq.empty)
    IndexStores.swapInto(spark, path, staging)
  }

  /** Merge a batch into the store, exactly once per `batchId`: an id
    * already in the ledger is a crash-replay and returns without
    * touching the counters (CMS addition is NOT idempotent — this
    * ledger is what [[SketchStore]] gets for free from set semantics).
    * An absent store bootstraps, with the declared parameters; against
    * an existing store the parameters are checked against meta and a
    * mismatch rejects loudly (sketches of different geometry or seed
    * do not share hash functions — merging them is meaningless).
    */
  def extend(df: DataFrame, key: Column, path: String, batchId: Long,
      eps: Double = 0.001, confidence: Double = 0.99,
      seed: Int = 42): Unit = {
    val spark = df.sparkSession
    IndexStores.healRoot(spark, path)
    if (!IndexStores.hasStore(spark, s"$path/sketch")) {
      val staging = IndexStores.stagingFor(spark, path)
      writeGeneration(spark, staging, sketchOf(df, key, eps, confidence,
        seed), eps, confidence, seed,
        totalItems = df.filter(key.isNotNull).count(),
        batchIds = Seq(batchId))
      IndexStores.swapInto(spark, path, staging)
      return
    }
    val m = metaOf(spark, path)
    require(m.eps == eps && m.confidence == confidence && m.seed == seed,
      s"frequency store at $path was built as (eps=${m.eps}, " +
        s"confidence=${m.confidence}, seed=${m.seed}); extend declared " +
        s"(eps=$eps, confidence=$confidence, seed=$seed)")
    val applied = appliedBatches(spark, path)
    if (applied.contains(batchId)) return // replay — already counted
    val merged = CountMinSketch.readFrom(
      new ByteArrayInputStream(sketchBytes(spark, path)))
    merged.mergeInPlace(CountMinSketch.readFrom(new ByteArrayInputStream(
      sketchOf(df, key, eps, confidence, seed))))
    val staging = IndexStores.stagingFor(spark, path)
    writeGeneration(spark, staging, serialize(merged), eps, confidence,
      seed, totalItems = m.totalItems + df.filter(key.isNotNull).count(),
      batchIds = applied :+ batchId)
    IndexStores.swapInto(spark, path, staging)
  }

  /** Point estimates from the store: `df` + `est` (≥ the true count in
    * the ingested multiset; ≤ true + ε·N with probability
    * `confidence`). One bounded read of the sketch bytes, then a pure
    * projection — the [[graft.functions.Cms]] probe.
    */
  def estimate(df: DataFrame, key: Column, path: String): DataFrame =
    df.withColumn("est",
      graft.functions.Cms.estimate(
        sketchBytes(df.sparkSession, path), key.cast("string")))

  /** One-row store summary: the geometry, the exact ingested item
    * count (the N in the ε·N error bound) and the applied-batch count
    * — the monitoring surface.
    */
  def stats(spark: SparkSession, path: String): DataFrame = {
    val m = metaOf(spark, path)
    import spark.implicits._
    Seq((m.eps, m.confidence, m.seed, m.totalItems,
      appliedBatches(spark, path).size.toLong))
      .toDF("eps", "confidence", "seed", "total_items", "applied_batches")
  }

  private final case class Meta(eps: Double, confidence: Double,
      seed: Int, totalItems: Long)

  private def metaOf(spark: SparkSession, path: String): Meta = {
    IndexStores.healRoot(spark, path)
    val r = IndexStores.readStore(spark, s"$path/meta").head
    Meta(r.getAs[Double]("eps"), r.getAs[Double]("confidence"),
      r.getAs[Int]("seed"), r.getAs[Long]("total_items"))
  }

  private def sketchBytes(spark: SparkSession, path: String): Array[Byte] = {
    IndexStores.healRoot(spark, path)
    IndexStores.readStore(spark, s"$path/sketch").head.getAs[Array[Byte]](0)
  }

  /** The full applied-id ledger — one long per batch ever merged, read
    * driver-side per extend. Growth is 8 bytes/batch (a year of
    * once-a-minute triggers ≈ 4 MB), deliberate: keeping only a
    * max-id high-water mark would tie the store to a single
    * monotonic producer, and the ledger is also the
    * `applied_batches` audit surface in [[stats]].
    */
  private def appliedBatches(spark: SparkSession, path: String): Seq[Long] =
    if (!IndexStores.hasStore(spark, s"$path/batches")) Seq.empty
    else IndexStores.readStore(spark, s"$path/batches")
      .collect().map(_.getLong(0)).toSeq.sorted

  /** The distributed aggregation — map-side partial counter matrices,
    * one small binary result on the driver. Null keys are skipped by
    * the aggregate, matching the `totalItems` filter.
    */
  private def sketchOf(df: DataFrame, key: Column, eps: Double,
      confidence: Double, seed: Int): Array[Byte] =
    df.select(key.cast("string").as("__k"))
      .agg(expr(s"count_min_sketch(__k, ${eps}d, ${confidence}d, $seed)"))
      .head.getAs[Array[Byte]](0)

  private def serialize(s: CountMinSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    s.writeTo(out)
    out.toByteArray
  }

  /** All three stores of one generation under `staging` — the single
    * unit the atomic swap publishes, which is what makes [[extend]]
    * exactly-once: counters and ledger can never diverge.
    */
  private def writeGeneration(spark: SparkSession, staging: String,
      bytes: Array[Byte], eps: Double, confidence: Double, seed: Int,
      totalItems: Long, batchIds: Seq[Long]): Unit = {
    import spark.implicits._
    Seq(Tuple1(bytes)).toDF("sketch").coalesce(1)
      .write.mode("overwrite").parquet(s"$staging/sketch")
    Seq((eps, confidence, seed, totalItems))
      .toDF("eps", "confidence", "seed", "total_items").coalesce(1)
      .write.mode("overwrite").parquet(s"$staging/meta")
    if (batchIds.nonEmpty)
      batchIds.toDF("batch_id").coalesce(1)
        .write.mode("overwrite").parquet(s"$staging/batches")
  }
}
