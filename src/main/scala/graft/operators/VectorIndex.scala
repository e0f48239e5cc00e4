package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ index: the build-once / search-many separation a
  * production ANN deployment runs ([[VectorOps.ivfPqTopK]]'s Scaladoc
  * already names it — "a production deployment persists it"; this is
  * that artifact as parquet).
  *
  * Layout under `path`:
  *  - `codes/` — the encoded corpus `(vec_id, codes)` written
  *    `partitionBy("cell")`: one directory per coarse cell, so a
  *    search's cell filter is PARTITION PRUNING — the scan opens only
  *    the `nprobe` probed directories and never touches the other
  *    `nlist − nprobe`. At 100 TB this is the contract that makes an
  *    IVF index an index: per-query read cost is nprobe/nlist of the
  *    code bytes (themselves ~1% of the raw vector bytes), not a full
  *    scan that discards rows after reading them.
  *  - `meta/` — a one-row parquet holding the trained driver-side
  *    state: centroids, residual codebooks, shape (dim, dsub, m,
  *    kCent), and the build's default nprobe. Bounded by
  *    nlist·dim + m·kCent·dsub doubles (~a few MB at any sane shape) —
  *    parquet rather than a sidecar JSON so load needs no parser and
  *    the arrays round-trip bit-exact.
  *
  * Search loads the meta row, probes cells driver-side (the same math
  * [[VectorOps.ivfPqSearch]] runs over an in-memory model), and feeds
  * the pruned parquet scan through the identical broadcast-LUT + ADC
  * plan — one search implementation for both storage forms, so the
  * disk path can never drift from the spec-pinned in-memory one.
  */
object VectorIndex {

  import VectorOps.{Auto, IvfPqModel, MaxTrainRows, PqTrainRows}

  /** Build and persist an IVF-PQ index for `embeddings` under `path`.
    * Returns the written model (with `codes` re-pointed at the parquet)
    * so a caller can search immediately without re-loading.
    */
  def writeIvfPq(embeddings: DataFrame, path: String,
                 nlist: Int = Auto, m: Int = 8, kCent: Int = 256,
                 maxTrainRows: Long = MaxTrainRows,
                 pqTrainRows: Long = PqTrainRows): IvfPqModel = {
    val spark = embeddings.sparkSession
    val model = VectorOps.buildIvfPqModel(embeddings, nlist, Auto, m, kCent,
      maxTrainRows, pqTrainRows)
    // one file per cell: the shuffle groups each cell's codes into a
    // single task before the partitioned write — without it every
    // shuffle partition appends a fragment to every cell directory
    // (nlist × shufflePartitions small files, a listing-cost killer on
    // object stores)
    model.codes.repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/codes")
    import spark.implicits._
    Seq((model.dim, model.dsub, model.m, model.kCent, model.nprobe,
        model.centers.map(_.toSeq).toSeq,
        model.codebooks.map(_.map(_.toSeq).toSeq)))
      .toDF("dim", "dsub", "m", "k_cent", "nprobe", "centers", "codebooks")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/meta")
    model.copy(codes = loadCodes(spark, path))
  }

  private def loadCodes(spark: SparkSession, path: String): DataFrame =
    // cell comes back as the partition column; vec_id/codes from the
    // files. Schema order differs from the in-memory model (partition
    // cols go last) — the search plan joins by name, so it cannot care.
    spark.read.parquet(s"$path/codes")

  /** Load a persisted index's trained state; the code table stays a
    * lazy parquet scan pruned per search.
    */
  def loadIvfPq(spark: SparkSession, path: String): IvfPqModel = {
    val row = spark.read.parquet(s"$path/meta").collect() match {
      case Array(r) => r
      case rs => throw new IllegalStateException(
        s"$path/meta: expected exactly one meta row, found ${rs.length} — " +
          "not a VectorIndex layout (or a partial write)")
    }
    val centers = row.getSeq[scala.collection.Seq[Double]](5)
      .map(_.toArray).toArray
    val codebooks = row.getSeq[scala.collection.Seq[scala.collection.Seq[Double]]](6)
      .map(_.map(_.toArray).toArray)
    IvfPqModel(centers, row.getInt(4), row.getInt(0), row.getInt(1),
      row.getInt(2), row.getInt(3), codebooks.toSeq, loadCodes(spark, path))
  }

  /** Incrementally add vectors to a persisted index under its FROZEN
    * trained state — the ingest path a production ANN deployment runs
    * between (rare, full) rebuilds: load the meta row, assign each new
    * vector to its coarse cell and residual-encode it against the
    * frozen codebooks ([[VectorOps.encodeIntoModel]]), and APPEND the
    * codes to the cell partitions. Centroids/codebooks never move, so
    * previously-written codes stay valid byte-for-byte and a search
    * after the add sees old and new vectors through one identical plan
    * (spec-pinned: build(A) + add(B) search ≡ the same model over
    * A ∪ B's codes, and re-encoding an already-indexed vector yields
    * bit-identical codes).
    *
    * Write shape mirrors the build: the batch is repartitioned on
    * `cell` before the partitioned append, so each touched cell gains
    * AT MOST ONE new file per add (nlist × shufflePartitions fragments
    * otherwise — the object-store listing blowup the build guards
    * against). Untouched cell directories are not rewritten — the add
    * cost is O(batch), never O(corpus), matching the incremental-dedup
    * ingest contract. Periodic compaction of a hot cell's file count is
    * the same policy dial as queue-ack compaction
    * ([[Extractors.compactQueue]]).
    *
    * Caller contract: `vec_id`s not already in the index (an upsert
    * would need a rewrite of the touched cells — deliberately not this
    * operator); one add at a time (two concurrent appends to the same
    * cell directory are a parquet-commit race, same as any Spark
    * append).
    *
    * @return the updated model with `codes` re-pointed at the combined
    *         parquet
    */
  def addToIvfPq(spark: SparkSession, path: String,
                 newVectors: DataFrame): VectorOps.IvfPqModel = {
    val model = loadIvfPq(spark, path)
    VectorOps.encodeIntoModel(model, newVectors)
      .repartition(col("cell"))
      .write.mode("append").partitionBy("cell")
      .parquet(s"$path/codes")
    model.copy(codes = loadCodes(spark, path))
  }

  /** Top-k ADC search against a persisted index. `queries` are raw
    * (id, vector) pairs — the index is self-contained; the corpus that
    * built it is not needed at search time.
    */
  def searchIvfPq(spark: SparkSession, path: String,
                  queries: Seq[(Long, Array[Double])], k: Int = 10,
                  nprobe: Int = Auto): DataFrame =
    VectorOps.ivfPqSearch(loadIvfPq(spark, path), queries, k, nprobe)
}
