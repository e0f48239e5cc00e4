package graft

import org.apache.spark.SparkContext
import org.apache.spark.sql.DataFrame

/** Shared measurement helpers for the benchmark/probe mains
  * ([[Bench]], [[AnnRecall]], [[ScaleProbe]]) — one implementation of
  * the protocol so a change (pass count, sink, release policy) cannot
  * silently diverge across the three.
  */
private[graft] object BenchUtil {

  def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** Full materialisation through a noop-format write — a bare
    * `count()` would let Catalyst prune the computed columns and time
    * only the row count.
    */
  def sink(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Min-of-N wall time — the per-query Bench protocol: a host
    * contention spike must hit every pass to survive the min.
    */
  def minOf(passes: Int)(f: => Unit): Double =
    (1 to passes).map(_ => time(f)).min

  /** Unpersist every RDD pinned since `beforeIds` was snapshotted
    * (`sc.getPersistentRDDs.keySet`). This is the release path for
    * `localCheckpoint` artifacts: `Dataset.unpersist` does NOT cover
    * them (it only clears CacheManager entries; checkpoints persist at
    * the RDD level and otherwise wait for a nondeterministic GC +
    * ContextCleaner sweep).
    */
  def releaseNewRdds(sc: SparkContext, beforeIds: Set[Int]): Unit =
    sc.getPersistentRDDs.filterNot { case (id, _) => beforeIds(id) }
      .values.foreach(_.unpersist(blocking = false))

  /** Count the parquet data files under `dir` (recursive), skipping
    * `.__staging_`/`.__old_` directories a killed atomic rewrite can
    * leave behind — ONE implementation for the compaction probe and
    * the file-count specs, so they can never count differently.
    */
  def parquetDataFiles(dir: String): Int = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) {
        // skip staged/retired generations AND uncommitted task output —
        // IndexStores.hasStore judges presence by committed files only,
        // and a file count that disagreed with it after a killed write
        // would mislead the compaction dial
        if (f.getName.contains(".__staging_") ||
            f.getName.contains(".__old_") ||
            f.getName == "_temporary") Seq.empty
        else Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      } else Seq(f)
    walk(new java.io.File(dir)).count(_.getName.endsWith(".parquet"))
  }

  /** Bloom-prefilter selectivity measurement over distinct gram
    * tables — ONE implementation shared by [[ScaleProbe]] and
    * `DecontaminateSpec` so the published numbers and the spec's
    * bounds can never measure different pipelines.
    *
    * @return (total corpus grams, truly shared, sketch candidates)
    */
  def bloomStats(corpusGrams: DataFrame, benchGrams: DataFrame,
                 bitsPerItem: Int): (Long, Long, Long) = {
    import org.apache.spark.sql.functions.col
    val sketch = graft.functions.Bloom.sketchOf(benchGrams, "s", bitsPerItem)
    (corpusGrams.count(),
      corpusGrams.join(benchGrams, "s").count(),
      corpusGrams.filter(
        graft.functions.Bloom.mightContain(sketch, col("s"))).count())
  }
}
