package graft

import org.apache.spark.sql.functions._

import graft.core._
import graft.operators.SequentialExtractor
import graft.sources.JdbcTable

/** End-to-end pipeline over an embedded Derby database — the JDBC
  * parity the reference has natively (it is MySQL-to-MySQL only,
  * `migrator.go:208-229`): sequential extract with the incremental
  * predicate PUSHED to the database, method-routed load into a JDBC
  * destination, watermark re-drain, and REPLACE upsert.
  */
class JdbcPipelineSpec extends SparkSpec {

  private lazy val dbRoot = tmpDir("graft-derby")
  private def url(db: String) = s"jdbc:derby:$dbRoot/$db;create=true"

  private def readJdbc(u: String, table: String) =
    spark.read.format("jdbc").option("url", u).option("dbtable", table).load()

  test("full drain over JDBC: pushed-down sequential extract, JDBC load") {
    import spark.implicits._
    val srcUrl = url("srcdb"); val dstUrl = url("dstdb")
    (1L to 100L).map(i => (i, s"name_$i", i * 10.0)).toDF("id", "name", "score")
      .coalesce(1).write.format("jdbc")
      .option("url", srcUrl).option("dbtable", "SRC").save()

    val spec = PipelineSpec(
      sourceDatabase = "srcdb", sourceTable = "SRC", sourceKey = "id",
      destinationDatabase = "dstdb", destinationTable = "DST",
      sourcePath = srcUrl, destinationPath = dstUrl,
      params = Params(batchSize = 40, sleepBetweenRunsSec = 0.01))

    // the incremental predicate must reach the database, not Spark —
    // the reference ships its WHERE clause to MySQL the same way
    val res = SequentialExtractor.extract(spark, spec,
      TrackingStatus("srcdb", "SRC", "id", sequentialPosition = 10L))
    try {
      val scan = res.df.queryExecution.executedPlan.toString
      assert(scan.contains("PushedFilters") && scan.contains("GreaterThan(id,10)"),
        s"incremental predicate not pushed to JDBC:\n$scan")
      assert(res.df.count() === 40)
    } finally res.cleanup()

    val runner = new Runner(spark, Seq(spec), tmpDir("graft-track-jdbc"))
    val totals = runner.drainOnce()
    assert(totals("SRC")(Method.Insert.name) === 100)

    val dst = readJdbc(dstUrl, "DST")
    assert(dst.count() === 100)
    assert(graft.sources.Tables.readTable(spark, srcUrl, "SRC")
      .join(dst, Seq("id", "name", "score"), "left_anti").count() === 0)

    // watermark held: a second drain moves nothing
    val again = runner.drainOnce()
    assert(again("SRC").values.sum === 0)
    assert(readJdbc(dstUrl, "DST").count() === 100)
  }

  test("REPLACE upsert over JDBC deletes touched keys and re-inserts") {
    val srcUrl = url("srcdb"); val dstUrl = url("dstdb")
    // mutate the source, then re-extract everything as REPLACE through a
    // fresh tracking store: the loader must upsert, not duplicate
    val conn = java.sql.DriverManager.getConnection(srcUrl)
    try conn.createStatement()
      .executeUpdate("""UPDATE SRC SET "score" = 0 WHERE "id" <= 10""")
    finally conn.close()

    val spec = PipelineSpec(
      sourceDatabase = "srcdb", sourceTable = "SRC", sourceKey = "id",
      destinationDatabase = "dstdb", destinationTable = "DST",
      sourcePath = srcUrl, destinationPath = dstUrl,
      params = Params(batchSize = 40, sleepBetweenRunsSec = 0.01,
        sequentialReplace = true))
    val totals = new Runner(spark, Seq(spec), tmpDir("graft-track-jdbc2"))
      .drainOnce()
    assert(totals("SRC")(Method.Replace.name) === 100)

    val dst = readJdbc(dstUrl, "DST").cache()
    assert(dst.count() === 100) // upsert, no duplicates
    assert(dst.filter(col("score") === 0).count() === 10)
    dst.unpersist()
  }

  test("jdbc helpers: existence probe and key delete are batch-bounded") {
    val dstUrl = url("dstdb")
    assert(JdbcTable.tableExists(dstUrl, "DST"))
    assert(!JdbcTable.tableExists(dstUrl, "NO_SUCH_TABLE"))
    // deleting absent keys is a no-op; deleting present keys is counted
    assert(JdbcTable.deleteKeys(dstUrl, "DST", Seq("id"),
      Seq(Seq(9999L))) === 0L)
    assert(JdbcTable.deleteKeys(dstUrl, "DST", Seq("id"),
      Seq(Seq(1L), Seq(2L))) === 2L)
    assert(readJdbc(dstUrl, "DST").count() === 98)
  }
}
