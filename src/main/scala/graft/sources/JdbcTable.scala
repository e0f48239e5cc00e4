package graft.sources

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.DataFrame

/** JDBC destination operations — the write half of the `jdbc:` root
  * (the read half lives in [[Tables.readTable]]). The reference engine
  * is JDBC-only on both sides (`migrator.go:208-229` opens two MySQL
  * pools); here a JDBC URL slots into the same loader contract as a
  * parquet directory.
  *
  * Write shape mirrors the reference's batched queries
  * (`batched_queries.go:14-74`): bulk INSERTs go through Spark's JDBC
  * writer (one connection per partition, `batchsize`-chunked
  * `executeBatch`), while REPLACE/REMOVE key deletes run as ONE
  * driver-side `PreparedStatement` batch — the key set is ≤ the
  * micro-batch size by construction, so shipping it to the driver costs
  * the same as the broadcast the parquet path does, and row-level
  * `DELETE` is something no distributed writer offers anyway.
  *
  * Atomicity: delete-then-append is not transactional across Spark
  * writer connections (nothing distributed over JDBC is). The engine's
  * commit-after-load ordering makes that safe: a crash between delete
  * and append leaves tracking unmoved, the batch replays, and both the
  * delete and the REPLACE re-apply idempotently.
  *
  * Identifier case: columns are quoted exactly as the DataFrame spells
  * them — matching tables created by Spark's own JDBC writer (which
  * quotes identifiers). Tables with unquoted DDL should use the DB's
  * canonical case in `PipelineSpec`.
  */
object JdbcTable {

  def isJdbc(root: String): Boolean = root.startsWith("jdbc:")

  private def withConnection[T](url: String)(f: Connection => T): T = {
    val conn = DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }

  /** Existence probe via catalog metadata (unquoted names are stored
    * upper-case by Derby/most engines; check both spellings).
    */
  def tableExists(url: String, table: String): Boolean =
    withConnection(url) { conn =>
      val md = conn.getMetaData
      Seq(table, table.toUpperCase, table.toLowerCase).exists { t =>
        val rs = md.getTables(null, null, t, null)
        try rs.next() finally rs.close()
      }
    }

  /** Bulk append through Spark's JDBC writer — creates the table from
    * the DataFrame schema when absent, chunks statements at `batchSize`.
    */
  def append(df: DataFrame, url: String, table: String, batchSize: Int): Unit = {
    val w = df.write.mode("append").format("jdbc")
      .option("url", url).option("dbtable", table)
    (if (batchSize > 0) w.option("batchsize", batchSize.toLong.toString) else w)
      .save()
  }

  /** Driver-side batched `DELETE` of the touched PKs — O(batch), the
    * JDBC analog of the parquet path's broadcast anti-join. No-op when
    * the destination table does not exist yet (first batch).
    * @return rows deleted
    */
  def deleteKeys(url: String, table: String, pkCols: Seq[String],
                 keys: Iterable[Seq[Any]], executeEvery: Int = 1000): Long = {
    if (keys.isEmpty || !tableExists(url, table)) return 0L
    withConnection(url) { conn =>
      val where = pkCols.map(c => s""""$c" = ?""").mkString(" AND ")
      val ps = conn.prepareStatement(s"DELETE FROM $table WHERE $where")
      try {
        var deleted = 0L
        var pending = 0
        keys.foreach { k =>
          k.zipWithIndex.foreach { case (v, i) => ps.setObject(i + 1, v) }
          ps.addBatch()
          pending += 1
          if (pending >= executeEvery) {
            deleted += ps.executeBatch().map(_.max(0).toLong).sum
            pending = 0
          }
        }
        if (pending > 0) deleted += ps.executeBatch().map(_.max(0).toLong).sum
        deleted
      } finally ps.close()
    }
  }
}
