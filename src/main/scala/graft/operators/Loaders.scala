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
  */
object MethodRoutedLoader {

  /** @return rows loaded per method, for logging/metrics parity with the
    *         reference's per-batch loglines (`loader_default.go:61`).
    */
  def load(spark: SparkSession, batch: TableBatch, destPath: String,
           pkCols: Seq[String], params: Params): Map[String, Long] = {
    require(batch.df.columns.contains(Method.Col),
      s"batch for ${batch.table} lacks the ${Method.Col} column")
    val df = batch.df.cache()
    val target = s"$destPath/${batch.table}.parquet"

    val methodOf = col(Method.Col)
    val inserts = df.filter(methodOf === Method.Insert.name).drop(Method.Col)
    val replaces = df.filter(methodOf =!= Method.Insert.name &&
      methodOf =!= Method.Remove.name).drop(Method.Col)
    val removes = df.filter(methodOf === Method.Remove.name).drop(Method.Col)

    val nIns = inserts.count()
    val nRep = replaces.count()
    val nRem = removes.count()

    if (nRep > 0 || nRem > 0) {
      val touchedKeys = replaces.select(pkCols.map(col): _*)
        .union(removes.select(pkCols.map(col): _*))
      val existing = ParquetTable.read(spark, target)
      val kept = existing match {
        case Some(t) => t.join(broadcast(touchedKeys), pkCols, "left_anti")
        case None    => replaces.limit(0) // empty, replaces schema
      }
      ParquetTable.overwriteAtomic(spark, target, kept.unionByName(replaces))
    }
    if (nIns > 0)
      ParquetTable.append(spark, target, inserts, params.insertBatchSize)

    df.unpersist()
    Map(Method.Insert.name -> nIns, Method.Replace.name -> nRep,
      Method.Remove.name -> nRem)
  }
}
