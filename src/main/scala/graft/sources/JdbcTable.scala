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

  /** Existence probe via catalog metadata. `getTables` name arguments
    * are LIKE patterns (`_`/`%` are wildcards — a name like ORDER_ITEMS
    * would false-positive against ORDER1ITEMS, turning the absent-table
    * no-op guard in [[deleteKeys]] into a crash) and drivers disagree on
    * escape conventions (Derby reports an EMPTY escape string), so no
    * pattern is sent at all: list the connection's current schema with
    * `%` and compare returned names EXACTLY, case-insensitively
    * (unquoted DDL names are case-folded by the engine).
    */
  def tableExists(url: String, table: String): Boolean =
    withConnection(url) { conn =>
      val schema = try Option(conn.getSchema).filter(_.nonEmpty).orNull
                   catch { case _: Throwable => null }
      val rs = conn.getMetaData.getTables(null, schema, "%", null)
      try {
        Iterator.continually(rs)
          .takeWhile(_.next())
          .exists(_.getString("TABLE_NAME").equalsIgnoreCase(table))
      } finally rs.close()
    }

  /** (name, java.sql.Types code, precision, scale) of an existing
    * table's columns in catalog order — the schema contract the append
    * below must satisfy.
    */
  def tableSchema(url: String, table: String): Seq[(String, Int, Int, Int)] =
    withConnection(url) { conn =>
      val rs = conn.createStatement().executeQuery(
        s"SELECT * FROM $table WHERE 1 = 0")
      try {
        val md = rs.getMetaData
        (1 to md.getColumnCount).map(i =>
          (md.getColumnName(i), md.getColumnType(i),
            md.getPrecision(i), md.getScale(i)))
      } finally rs.close()
    }

  /** Spark type for a `java.sql.Types` code — the subset a migrator
    * meets in practice; unknowns fall back to string.
    */
  private def sparkType(sqlType: Int, precision: Int, scale: Int): String = {
    import java.sql.Types._
    sqlType match {
      case TINYINT | SMALLINT | INTEGER => "int"
      case BIGINT                       => "bigint"
      case REAL | FLOAT                 => "float"
      case DOUBLE                       => "double"
      case DECIMAL | NUMERIC            => s"decimal(${math.max(1, precision)},$scale)"
      case BOOLEAN | BIT                => "boolean"
      case DATE                         => "date"
      case TIMESTAMP                    => "timestamp"
      case _                            => "string"
    }
  }

  /** Align a batch to an existing destination's schema, BEFORE any
    * destructive step runs: destination columns the batch omits fill
    * with typed NULLs (the reference's MySQL-defaults posture); batch
    * columns the destination lacks fail fast — JDBC destinations do not
    * auto-evolve (the parquet path does, via mergeSchema), and finding
    * out mid-load after the key delete would leave the touched keys
    * absent until replay.
    */
  def align(df: DataFrame, url: String, table: String): DataFrame = {
    if (!tableExists(url, table)) return df
    val dest = tableSchema(url, table)
    val extra = df.columns.filterNot(c => dest.exists(_._1.equalsIgnoreCase(c)))
    require(extra.isEmpty,
      s"JDBC destination $table lacks batch columns ${extra.mkString(", ")}; " +
        "ALTER TABLE first — JDBC destinations do not auto-evolve schema")
    val missing = dest.filterNot { case (c, _, _, _) =>
      df.columns.exists(_.equalsIgnoreCase(c))
    }
    missing.foldLeft(df) { case (d, (c, t, p, s)) =>
      d.withColumn(c, org.apache.spark.sql.functions.lit(null)
        .cast(sparkType(t, p, s)))
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
        // SUCCESS_NO_INFO (-2) counts as 1: drivers in rewritten-batch
        // mode (notably MySQL) report it for every statement even when
        // rows were deleted, and 0 would read as "ack'd nothing"
        def tally(codes: Array[Int]): Long = codes.map {
          case java.sql.Statement.SUCCESS_NO_INFO => 1L
          case c                                  => c.max(0).toLong
        }.sum
        var deleted = 0L
        var pending = 0
        keys.foreach { k =>
          k.zipWithIndex.foreach { case (v, i) => ps.setObject(i + 1, v) }
          ps.addBatch()
          pending += 1
          if (pending >= executeEvery) {
            deleted += tally(ps.executeBatch())
            pending = 0
          }
        }
        if (pending > 0) deleted += tally(ps.executeBatch())
        deleted
      } finally ps.close()
    }
  }
}
