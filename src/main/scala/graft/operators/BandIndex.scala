package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash band index — the text-side twin of
  * [[VectorIndex]]: [[TextOps.incrementalNearDup]]'s docstring already
  * names it ("at 100 TB the corpus band table is the persisted LSH
  * index a near-dup stage keeps"); this is that artifact as parquet,
  * with the build / append / classify lifecycle the ingest loop runs.
  *
  * Layout under `path`:
  *  - `bands/` — the band table `(doc_id, band, bk)` written
  *    `partitionBy("bkp")` where `bkp` = "p" + the bucket key's first
  *    two hex chars (256 directories). The batch side of a classify
  *    carries a BOUNDED set of bucket keys (≤ bands × batch docs), so
  *    the corpus scan prunes to the directories holding matching
  *    prefixes — for a small streaming micro-batch that is a few
  *    percent of the index instead of all of it, and it degrades
  *    gracefully toward a full scan as the batch grows (every
  *    directory then holds a candidate). md5 bucket keys are uniform
  *    by construction, so the 256 partitions stay balanced at any
  *    corpus size.
  *  - `shingles/` (optional, `storeShingles = true`) — the raw shingle
  *    sets `(doc_id, s)` partitioned by `dp` = "p" + two hex chars of
  *    md5(doc_id): the [[VectorIndex]] `vectors/` posture applied to
  *    text, so the exact-Jaccard VERIFICATION leg
  *    ([[classify]] `minJaccard > 0`) runs entirely from the index —
  *    the colliders' prefixes (a bounded ≤256-entry IN-list) prune the
  *    shingle read to the directories holding colliding docs, instead
  *    of re-shingling the corpus.
  *
  * The ingest loop this enables, mirroring [[VectorIndex.addToIvfPq]]:
  * classify the batch against the index ([[classify]]) → act on the
  * verdicts → [[append]] the accepted docs' bands+shingles
  * (append-only, one file per touched prefix, untouched directories
  * never rewritten — O(batch), never O(corpus)).
  */
object BandIndex {

  /** Prefixes are "p" + two hex chars: the leading letter keeps the
    * partition columns non-numeric BY CONSTRUCTION, so Spark's
    * partition-column type inference can never read a directory set
    * that happens to be all-digits (e.g. prefixes 00–99) back as
    * IntegerType — which would coerce `bkp=07` to 7 and silently
    * defeat the `isin` pruning ('7' != '07').
    */
  private def bkp(c: Column) = concat(lit("p"), substring(c, 1, 2))
  private def dp(c: Column) =
    concat(lit("p"), substring(md5(c.cast("string")), 1, 2))

  private def bandsOf(docs: DataFrame): DataFrame =
    TextOps.minhashBands(docs).withColumn("bkp", bkp(col("bk")))

  private def shinglesOf(docs: DataFrame): DataFrame =
    TextOps.shingles(docs).select("doc_id", "s")
      .withColumn("dp", dp(col("doc_id")))

  private def hasShingles(spark: SparkSession, path: String): Boolean =
    dirExists(spark, s"$path/shingles")

  private def hasTombstones(spark: SparkSession, path: String): Boolean =
    dirExists(spark, s"$path/tombstones")

  private def dirExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Build the index for `docs` at `path` (overwrite). The WHOLE path
    * is cleared first: a rebuild must not inherit the previous
    * generation's `tombstones/` (its deletes would wrongly suppress
    * re-indexed docs) or a stale `shingles/` from a
    * `storeShingles = true` build (classify's verification would
    * silently join the OLD corpus's shingle sets).
    *
    * @param storeShingles also persist the raw shingle sets under
    *   `shingles/` so [[classify]]'s verification leg is served from
    *   the index. Costs the shingle bytes once — the standard trade
    *   for candidate→verified verdicts without keeping the corpus
    *   text around.
    */
  def write(docs: DataFrame, path: String,
            storeShingles: Boolean = false): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(
      docs.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    bandsOf(docs)
      .repartition(col("bkp"))
      .write.mode("overwrite").partitionBy("bkp")
      .parquet(s"$path/bands")
    if (storeShingles)
      shinglesOf(docs)
        .repartition(col("dp"))
        .write.mode("overwrite").partitionBy("dp")
        .parquet(s"$path/shingles")
  }

  /** Append `newDocs`' bands (and shingles, when the store exists) —
    * the accepted slice of a classified batch. One new file per
    * touched prefix directory (the [[VectorIndex.addToIvfPq]] write
    * shape). Shingles go FIRST: a failure between the two appends then
    * leaves orphan shingles (never consulted — verification starts
    * from band collisions), whereas the reverse order would leave
    * bands whose verification silently finds no shingles. The shingle
    * append additionally SKIPS docs whose shingles are already stored
    * (a doc-id-prefix-pruned presence probe, bounded by the batch), so
    * the natural crash-retry — re-appending a batch whose first
    * attempt died between the two writes — heals the missing bands
    * without doubling the survivor's shingle rows (doubled rows would
    * inflate every later exact-Jaccard verdict against that doc).
    * A full retry of a fully-committed append leaves duplicate BAND
    * rows — harmless for verdicts (the pair join is distinct) and
    * folded by the next [[compact]]'s rewrite of row storage, but not
    * deduplicated there. Caller contract: one append at a time.
    */
  def append(newDocs: DataFrame, path: String): Unit = {
    val spark = newDocs.sparkSession
    // a batch doc that is currently tombstoned would be suppressed by
    // the same anti-join that hides its old rows, then dropped WITH
    // them at the next compaction — reject loudly instead of losing
    // data (bounded probe: broadcast tombstone list, first hit only)
    if (hasTombstones(spark, path)) {
      val hit = newDocs.select("doc_id")
        .join(broadcast(spark.read.parquet(s"$path/tombstones")
          .select("doc_id").distinct()), Seq("doc_id"), "left_semi")
        .limit(1).collect()
      if (hit.nonEmpty)
        throw new IllegalArgumentException(
          s"BandIndex.append: doc_id=${hit(0).getLong(0)} is tombstoned — " +
            "run compact before re-adding a deleted id")
    }
    if (hasShingles(spark, path)) {
      val dps = newDocs.select(dp(col("doc_id")).as("p")).distinct()
        .collect().map(_.getString(0)).toSeq
      val present = spark.read.parquet(s"$path/shingles")
        .filter(col("dp").isin(dps: _*))
        .select("doc_id").distinct()
        .join(broadcast(newDocs.select("doc_id").distinct()),
          Seq("doc_id"), "left_semi")
      shinglesOf(newDocs)
        .join(present, Seq("doc_id"), "left_anti")
        .repartition(col("dp"))
        .write.mode("append").partitionBy("dp")
        .parquet(s"$path/shingles")
    }
    bandsOf(newDocs)
      .repartition(col("bkp"))
      .write.mode("append").partitionBy("bkp")
      .parquet(s"$path/bands")
  }

  /** Classify a batch against the persisted index —
    * [[TextOps.incrementalNearDup]]'s verdict surface served from the
    * index scan instead of a corpus recompute (value-identical for the
    * same corpus; spec-pinned). The index read is pruned to the
    * batch's bucket-key prefixes (a bounded ≤256-element IN-list
    * collected from the pinned batch band table).
    *
    * With `minJaccard > 0` every colliding pair is verified by EXACT
    * shingle Jaccard before it may support a verdict, served from the
    * index's `shingles/` store (requires [[write]]
    * `storeShingles = true`): the colliders' doc-id prefixes prune the
    * shingle read the same way the bucket-key prefixes prune the band
    * read — verification cost is bounded by the collision set, and the
    * corpus text is never touched.
    */
  def classify(spark: SparkSession, path: String, newDocs: DataFrame,
               minJaccard: Double = 0.0,
               broadcastBatch: Boolean = true): DataFrame = {
    require(minJaccard <= 0 || hasShingles(spark, path),
      s"$path has no shingles/ store — build with storeShingles = true " +
        "to verify (minJaccard > 0)")
    val bb = TextOps.minhashBands(newDocs).localCheckpoint()
    val prefixes = bb.select(bkp(col("bk")).as("p")).distinct()
      .collect().map(_.getString(0)).toSeq
    val pruned = spark.read.parquet(s"$path/bands")
      .filter(col("bkp").isin(prefixes: _*))
      .select("doc_id", "band", "bk")
    // deleted docs are suppressed at the band read (bounded broadcast
    // anti-join) — a doc with no surviving bands can never become a
    // collider, so the shingle store needs no filter of its own
    val corpusBands =
      if (hasTombstones(spark, path))
        pruned.join(
          broadcast(spark.read.parquet(s"$path/tombstones")
            .select("doc_id").distinct()),
          Seq("doc_id"), "left_anti")
      else pruned
    TextOps.incrementalNearDupFrom(bb, newDocs, corpusBands,
      prunedShingleRead(spark, path, _), minJaccard, broadcastBatch)
  }

  /** Delete docs from the index by id — the between-rebuilds
    * maintenance twin of [[VectorIndex.deleteFromIvfPq]]. Logical
    * delete: ids land in an append-only `tombstones/` table that
    * [[classify]]'s band read anti-joins (broadcast — bounded by
    * deletes since the last compaction), so verdicts exclude them
    * immediately while no prefix directory is rewritten.
    * [[compact]] physically drops the rows and clears the table.
    * Re-adding a deleted id is rejected loudly by [[append]] until a
    * compaction physically removes the old rows — compact first.
    */
  def delete(spark: SparkSession, path: String, ids: Seq[Long]): Unit = {
    require(ids.nonEmpty, "BandIndex.delete: empty id list")
    import spark.implicits._
    ids.toDF("doc_id").coalesce(1)
      .write.mode("append").parquet(s"$path/tombstones")
  }

  /** Maintenance: fold tombstones into the stores and rewrite each
    * prefix directory's accumulated append fragments to one file — the
    * file-count debt a long-running [[append]] ingest accumulates (one
    * file per touched prefix per batch), same policy dial as queue-ack
    * compaction ([[Extractors.compactQueue]]). REQUIRES a quiesced
    * producer: an append between the staged rewrite and the swap is
    * lost. Classify results are unchanged (spec-pinned). Crash-safe
    * order: bands, then shingles, then the tombstone table — replaying
    * the anti-join rewrite after a crash is a no-op, and the tombstone
    * list keeps suppressing until it is the last thing deleted.
    */
  def compact(spark: SparkSession, path: String): Unit = {
    def survivors(df: DataFrame): DataFrame =
      if (hasTombstones(spark, path))
        df.join(
          broadcast(spark.read.parquet(s"$path/tombstones")
            .select("doc_id").distinct()),
          Seq("doc_id"), "left_anti")
      else df
    graft.core.ParquetTable.overwriteAtomicPartitioned(spark,
      s"$path/bands",
      survivors(spark.read.parquet(s"$path/bands"))
        .repartition(col("bkp")), "bkp")
    if (hasShingles(spark, path))
      graft.core.ParquetTable.overwriteAtomicPartitioned(spark,
        s"$path/shingles",
        survivors(spark.read.parquet(s"$path/shingles"))
          .repartition(col("dp")), "dp")
    if (hasTombstones(spark, path)) {
      val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  /** The verification leg's corpus-side shingle table, pruned by the
    * pinned collision pairs: the colliders are known only once the
    * pair set exists, so the read is built FROM it — collect the
    * colliding docs' ≤256 distinct doc-id prefixes (bounded like the
    * band-side list) and scan only those directories.
    */
  private[graft] def prunedShingleRead(spark: SparkSession, path: String,
                                       pairs: DataFrame): DataFrame = {
    val dps = pairs.select(dp(col("other")).as("p")).distinct()
      .collect().map(_.getString(0)).toSeq
    val store = spark.read.parquet(s"$path/shingles")
    (if (dps.isEmpty) store.filter(lit(false))
     else store.filter(col("dp").isin(dps: _*)))
      .select("doc_id", "s")
  }
}
