package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Plain-parquet "table directory" helpers: existence-tolerant reads and
  * staged atomic-swap overwrites.
  *
  * The reference gets transactional batch loads from MySQL
  * (`loader_default.go:30-67`); on plain parquet we emulate the atomicity
  * with write-to-staging + directory rename, the classic pattern a Delta
  * transaction log replaces in production. The swap is two metadata ops —
  * on a 100 TB table the cost is the rewrite itself, which the loader
  * bounds by only rewriting when REPLACE/REMOVE rows exist (appends never
  * rewrite).
  */
object ParquetTable {

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) true
    else recoverFromOld(fs, p) // crash between the two swap renames
  }

  /** Crash recovery: a failure between `rename(p, old)` and
    * `rename(staging, p)` leaves the table only under a `.__old_` name.
    * Restore the newest such copy — without this, the next load would
    * see "no table" and quietly rebuild it from one batch.
    */
  private def recoverFromOld(fs: org.apache.hadoop.fs.FileSystem, p: Path): Boolean = {
    val parent = p.getParent
    if (parent == null || !fs.exists(parent)) return false
    val prefix = p.getName + ".__old_"
    val olds = fs.listStatus(parent).map(_.getPath)
      .filter(_.getName.startsWith(prefix)).sortBy(_.getName)
    olds.lastOption.exists(fs.rename(_, p))
  }

  /** `mergeSchema` because destinations evolve file-by-file (a
    * schema-widening upsert rewrites only touched partitions) — the
    * default single-footer schema would silently drop newer columns on
    * the next rewrite.
    */
  def read(spark: SparkSession, path: String): Option[DataFrame] =
    if (exists(spark, path))
      Some(spark.read.option("mergeSchema", true).parquet(path))
    else None

  /** Materialise `df` (which may itself read from `path`) into a staging
    * dir, then swap it in. The read happens fully before the old data is
    * touched.
    */
  def overwriteAtomic(spark: SparkSession, path: String, df: DataFrame): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(path + s".__staging_${System.nanoTime()}")
    df.write.mode("overwrite").parquet(staging.toString)
    val old = new Path(path + s".__old_${System.nanoTime()}")
    val hadOld = fs.exists(p)
    if (hadOld && !fs.rename(p, old))
      throw new java.io.IOException(s"could not stage out current table at $p")
    if (!fs.rename(staging, p)) {
      // roll the previous copy back before failing — never leave the
      // table path absent (Hadoop rename reports failure by boolean)
      if (hadOld) fs.rename(old, p)
      throw new java.io.IOException(s"could not swap staging into $p")
    }
    if (hadOld) fs.delete(old, true)
  }

  /** Compact a table's small files (the debt a long-running append /
    * streaming drain accumulates) into ~`targetRecordsPerFile`-row
    * files via an atomic rewrite. The maintenance companion to
    * streaming-mode loads, where per-trigger appends produce one file
    * per micro-batch.
    */
  def compact(spark: SparkSession, path: String,
              targetRecordsPerFile: Long = 1000000L): Unit =
    read(spark, path).foreach { df =>
      val total = df.count()
      val files = math.max(1, math.ceil(total.toDouble / targetRecordsPerFile).toInt)
      overwriteAtomic(spark, path, df.repartition(files))
    }

  /** Append with bounded rows per output file — the Spark analog of the
    * reference's multi-row statement chunking (`InsertBatchSize`,
    * `batched_queries.go:95-97`): both cap the unit of work a single
    * sink write handles.
    */
  def append(spark: SparkSession, path: String, df: DataFrame,
             maxRecordsPerFile: Int = 0): Unit = {
    val w = df.write.mode("append")
    (if (maxRecordsPerFile > 0)
      w.option("maxRecordsPerFile", maxRecordsPerFile.toLong) else w)
      .parquet(path)
  }
}
