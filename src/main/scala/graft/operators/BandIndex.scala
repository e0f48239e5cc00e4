package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash band index — the text-side twin of
  * [[VectorIndex]]: [[TextOps.incrementalNearDup]]'s docstring already
  * names it ("at 100 TB the corpus band table is the persisted LSH
  * index a near-dup stage keeps"); this is that artifact as parquet,
  * with the build / append / classify lifecycle the ingest loop runs.
  *
  * Layout under `path`: the band table `(doc_id, band, bk)` written
  * `partitionBy("bkp")` where `bkp` = the bucket key's first two hex
  * chars (256 directories). The batch side of a classify carries a
  * BOUNDED set of bucket keys (≤ bands × batch docs), so the corpus
  * scan prunes to the directories holding matching prefixes — for a
  * small streaming micro-batch that is a few percent of the index
  * instead of all of it, and it degrades gracefully toward a full scan
  * as the batch grows (every directory then holds a candidate). md5
  * bucket keys are uniform by construction, so the 256 partitions stay
  * balanced at any corpus size.
  *
  * The ingest loop this enables, mirroring [[VectorIndex.addToIvfPq]]:
  * classify the batch against the index ([[classify]]) → act on the
  * verdicts → [[append]] the accepted docs' bands (append-only, one
  * file per touched prefix, untouched directories never rewritten —
  * O(batch), never O(corpus)).
  */
object BandIndex {

  /** Prefix is "p" + first two hex chars: the leading letter keeps the
    * partition column non-numeric BY CONSTRUCTION, so Spark's
    * partition-column type inference can never read a directory set
    * that happens to be all-digits (e.g. prefixes 00–99) back as
    * IntegerType — which would coerce `bkp=07` to 7 and silently
    * defeat the `isin` pruning ('7' != '07').
    */
  private def bkp(c: org.apache.spark.sql.Column) =
    concat(lit("p"), substring(c, 1, 2))

  private def bandsOf(docs: DataFrame): DataFrame =
    TextOps.minhashBands(docs).withColumn("bkp", bkp(col("bk")))

  /** Build the index for `docs` at `path` (overwrite). */
  def write(docs: DataFrame, path: String): Unit =
    bandsOf(docs)
      .repartition(col("bkp"))
      .write.mode("overwrite").partitionBy("bkp")
      .parquet(path)

  /** Append `newDocs`' bands — the accepted slice of a classified
    * batch. One new file per touched prefix directory (the
    * [[VectorIndex.addToIvfPq]] write shape). Caller contract: ids not
    * already indexed; one append at a time.
    */
  def append(newDocs: DataFrame, path: String): Unit =
    bandsOf(newDocs)
      .repartition(col("bkp"))
      .write.mode("append").partitionBy("bkp")
      .parquet(path)

  /** Classify a batch against the persisted index —
    * [[TextOps.incrementalNearDup]]'s verdict surface served from the
    * index scan instead of a corpus recompute (value-identical for the
    * same corpus; spec-pinned). CANDIDATE-level by construction: the
    * index stores bands, not text, so the exact-Jaccard verification
    * leg needs the docs-side operator. The index read is pruned to the
    * batch's bucket-key prefixes (a bounded ≤256-element IN-list
    * collected from the pinned batch band table).
    */
  def classify(spark: SparkSession, path: String, newDocs: DataFrame,
               broadcastBatch: Boolean = true): DataFrame = {
    val bb = TextOps.minhashBands(newDocs).localCheckpoint()
    val prefixes = bb.select(bkp(col("bk")).as("p")).distinct()
      .collect().map(_.getString(0)).toSeq
    val corpusBands = spark.read.parquet(path)
      .filter(col("bkp").isin(prefixes: _*))
      .select("doc_id", "band", "bk")
    // corpus = newDocs is a placeholder: with minJaccard = 0 the
    // verification leg never evaluates it
    TextOps.incrementalNearDupFrom(bb, newDocs, corpusBands, newDocs,
      minJaccard = 0.0, broadcastBatch = broadcastBatch)
  }
}
