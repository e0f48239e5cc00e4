package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._

/** Method-routed load (reference `loader_default.go:9-72`): bucket the
  * batch by its `_method` column — INSERT / REPLACE / REMOVE, unknown →
  * REPLACE (`loader_default.go:20-26`) — and apply each bucket to the
  * destination parquet table.
  *
  *  - INSERT  → plain append (`batched_queries.go:14-16`): no rewrite,
  *    no shuffle, scales with the batch only.
  *  - REPLACE → MERGE-shaped upsert emulation: `target LEFT ANTI JOIN
  *    touchedKeys` ∪ new rows (`batched_queries.go:21-23` semantics).
  *  - REMOVE  → the same anti-join with no replacement rows
  *    (`batched_queries.go:28-74`).
  *
  * REPLACE and REMOVE are folded into ONE rewrite pass per batch (one
  * anti-join, one atomic swap) — SURVEY §7.4 H4's "one MERGE-shaped
  * plan", so a REMOVE-then-reINSERT of the same PK in one batch resolves
  * by method, not by file-write ordering. The touched-key set is ≤ batch
  * size, so the anti-join broadcasts the keys and the target table
  * streams through without a shuffle — at 100 TB the cost is the
  * target-partition rewrite, which Delta/partition-pruned rewrites would
  * bound further (SURVEY §7.4 H1).
  *
  * Schema evolution: upsert batches may add or omit columns relative to
  * the destination (`allowMissingColumns` union) — absent sides fill
  * with NULL, the dynamic-schema posture the reference gets from MySQL
  * defaults (`types.go:58-61` schema-free rows).
  */
object MethodRoutedLoader {

  /** @return rows loaded per method, for logging/metrics parity with the
    *         reference's per-batch loglines (`loader_default.go:61`).
    */
  def load(spark: SparkSession, batch: TableBatch, destPath: String,
           pkCols: Seq[String], params: Params): Map[String, Long] = {
    require(batch.df.columns.contains(Method.Col),
      s"batch for ${batch.table} lacks the ${Method.Col} column")
    // NULL methods route to REPLACE like any other unknown verb
    // (`loader_default.go:20-26`) — without the coalesce they would fall
    // through every null-propagating bucket filter and be dropped while
    // still counted.
    val df = batch.df
      .withColumn(Method.Col, coalesce(col(Method.Col), lit(Method.Replace.name)))
      .cache()
    val target = s"$destPath/${batch.table}.parquet"

    val methodOf = col(Method.Col)
    val inserts = df.filter(methodOf === Method.Insert.name).drop(Method.Col)
    val replaces = df.filter(methodOf =!= Method.Insert.name &&
      methodOf =!= Method.Remove.name).drop(Method.Col)
    val removes = df.filter(methodOf === Method.Remove.name).drop(Method.Col)

    // one global-agg job for all three bucket counts (a count per bucket
    // would pay three scheduler round-trips per micro-batch — the
    // dominant cost of small-batch drains)
    val c = df.agg(
      sum(when(methodOf === Method.Insert.name, 1L).otherwise(0L)),
      sum(when(methodOf === Method.Remove.name, 1L).otherwise(0L)),
      count(lit(1))).head()
    val nIns = if (c.isNullAt(0)) 0L else c.getLong(0)
    val nRem = if (c.isNullAt(1)) 0L else c.getLong(1)
    val nRep = c.getLong(2) - nIns - nRem // unknown methods → REPLACE

    if (params.partitionBuckets > 0)
      loadBucketed(spark, target, pkCols, params, inserts, replaces, removes,
        nIns, nRep, nRem)
    else {
      if (nRep > 0 || nRem > 0) {
        val touchedKeys = replaces.select(pkCols.map(col): _*)
          .union(removes.select(pkCols.map(col): _*))
        val existing = ParquetTable.read(spark, target)
        val kept = existing match {
          case Some(t) => t.join(broadcast(touchedKeys), pkCols, "left_anti")
          case None    => replaces.limit(0) // empty, replaces schema
        }
        ParquetTable.overwriteAtomic(spark, target,
          kept.unionByName(replaces, allowMissingColumns = true))
      }
      if (nIns > 0)
        ParquetTable.append(spark, target, inserts, params.insertBatchSize)
    }

    df.unpersist()
    Map(Method.Insert.name -> nIns, Method.Replace.name -> nRep,
      Method.Remove.name -> nRem)
  }

  /** Partition-pruned variant (SURVEY §7.4 H1): the destination is
    * hash-bucketed on the PK into `partitionBuckets` directory
    * partitions; REPLACE/REMOVE computes the touched bucket set from the
    * batch keys (≤ batch size) and rewrites ONLY those partitions via
    * dynamic partition overwrite — on a 100 TB table the rewrite cost is
    * `touched_buckets / buckets` of the table, not all of it, and the
    * target read is partition-pruned by the same bucket filter.
    */
  private def loadBucketed(spark: SparkSession, target: String,
                           pkCols: Seq[String], params: Params,
                           inserts: DataFrame, replaces: DataFrame,
                           removes: DataFrame,
                           nIns: Long, nRep: Long, nRem: Long): Unit = {
    val n = params.partitionBuckets
    def bucketed(d: DataFrame): DataFrame =
      d.withColumn(BucketCol, pmod(xxhash64(pkCols.map(col): _*), lit(n.toLong)))

    if (nRep > 0 || nRem > 0) {
      val touched = bucketed(replaces).select(BucketCol)
        .union(bucketed(removes).select(BucketCol))
        .distinct().collect().map(_.getLong(0)).toSeq
      val touchedKeys = replaces.select(pkCols.map(col): _*)
        .union(removes.select(pkCols.map(col): _*))
      val kept = ParquetTable.read(spark, target) match {
        case Some(t) =>
          t.filter(col(BucketCol).isin(touched: _*)) // partition pruning
            .join(broadcast(touchedKeys), pkCols, "left_anti")
        case None => bucketed(replaces).limit(0)
      }
      val out = kept.unionByName(bucketed(replaces), allowMissingColumns = true)
        .cache()
      // dynamic partition overwrite only rewrites partitions PRESENT in
      // the output — a REMOVE that empties its bucket produces no rows
      // for it, so the stale partition must be deleted explicitly or the
      // deleted rows would silently survive
      val outBuckets = out.select(BucketCol).distinct()
        .collect().map(_.getLong(0)).toSet
      withDynamicOverwrite(spark) {
        out.write.mode("overwrite").partitionBy(BucketCol).parquet(target)
      }
      val emptied = touched.filterNot(outBuckets)
      if (emptied.nonEmpty) {
        val p = new org.apache.hadoop.fs.Path(target)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        emptied.foreach { b =>
          fs.delete(new org.apache.hadoop.fs.Path(p, s"$BucketCol=$b"), true)
        }
      }
      out.unpersist()
    }
    if (nIns > 0) {
      val w = bucketed(inserts).write.mode("append").partitionBy(BucketCol)
      (if (params.insertBatchSize > 0)
        w.option("maxRecordsPerFile", params.insertBatchSize.toLong) else w)
        .parquet(target)
    }
  }

  /** Partition column for bucketed destinations — a system column,
    * dropped by consumers that want the logical schema.
    */
  val BucketCol = "_bucket"

  private def withDynamicOverwrite[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
