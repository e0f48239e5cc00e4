package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.core._

/** Golden end-to-end ports of the reference's three manual scenarios
  * (`/root/reference/testdata/`, the only "tests" it has — SURVEY §5):
  * the canonical 4-row table x(id, name, dob, enabled)
  * (`delete-enabled-queuing.sql:121-125`) driven through queue pipelines
  * configured exactly like the scenario YAMLs.
  */
class GoldenScenariosSpec extends SparkSpec {
  import spark.implicits._

  private def mkTs(s: String) = Timestamp.valueOf(s)

  /** Seed rows per `testdata/delete-enabled-queuing.sql:121-125`. */
  private def seedX(path: String): Unit =
    Seq(
      (1L, "Andrew Abramson", mkTs("1930-01-02 00:00:00"), true),
      (2L, "Brett Baker", mkTs("1942-03-14 00:00:00"), true),
      (3L, "Charlie Collins", mkTs("1945-11-09 00:00:00"), false),
      (4L, "Dirk Delta", mkTs("1982-03-18 00:00:00"), true))
      .toDF("id", "name", "dob", "enabled")
      .write.mode("overwrite").parquet(path)

  private def queueEntries(path: String, entries: Seq[(String, String)]): Unit =
    entries.zipWithIndex.map { case ((pk, method), i) =>
      ("a", "x", "id", pk, mkTs(f"2024-06-01 00:00:${i}%02d"), method)
    }.toDF("sourceDatabase", "sourceTable", "pkColumn", "pkValue",
      "timestampUpdated", "method")
      .write.mode("overwrite").parquet(path)

  private def yaml(src: String, dest: String, extra: String = "") =
    s"""pipelines:
       |  - source-database: a
       |    source-table: x
       |    key: id
       |    destination-database: b
       |    source-path: $src
       |    destination-path: $dest
       |    extractor: queue
       |$extra""".stripMargin

  test("scenario: delete-enabled queuing — REMOVE propagates to the target") {
    val src = tmpDir("ge-src"); val dest = tmpDir("ge-dest")
    seedX(s"$src/x.parquet")
    seedX(s"$dest/x.parquet") // already replicated once
    // source deletes id=3, updates id=4 — both queued by triggers
    queueEntries(s"$src/MigratorRecordQueue",
      Seq("3" -> "REMOVE", "4" -> "UPDATE"))
    val specs = Config.parse(yaml(src, dest))
    new Runner(spark, specs, s"$dest/_tracking").drainOnce()
    val ids = spark.read.parquet(s"$dest/x.parquet")
      .select("id").orderBy("id").as[Long].collect().toSeq
    assert(ids === Seq(1L, 2L, 4L)) // 3 deleted, 4 still present
  }

  test("scenario: delete-disabled queuing — deletions are NOT replicated") {
    val src = tmpDir("gd-src"); val dest = tmpDir("gd-dest")
    seedX(s"$src/x.parquet")
    seedX(s"$dest/x.parquet")
    // no DELETE trigger: the source row disappears but only UPDATEs queue
    spark.read.parquet(s"$src/x.parquet").filter(col("id") =!= 3L)
      .write.mode("overwrite").parquet(s"$src/x2.parquet")
    // (re-point the source table at the reduced copy)
    queueEntries(s"$src/MigratorRecordQueue", Seq("4" -> "UPDATE"))
    val specs = Config.parse(yaml(src, dest))
    new Runner(spark, specs, s"$dest/_tracking").drainOnce()
    val ids = spark.read.parquet(s"$dest/x.parquet")
      .select("id").orderBy("id").as[Long].collect().toSeq
    assert(ids === Seq(1L, 2L, 3L, 4L)) // 3 intentionally survives
  }

  test("scenario: table renamer — a.x lands in b.y") {
    val src = tmpDir("gr-src"); val dest = tmpDir("gr-dest")
    seedX(s"$src/x.parquet")
    queueEntries(s"$src/MigratorRecordQueue",
      Seq("1" -> "UPDATE", "2" -> "UPDATE", "3" -> "UPDATE", "4" -> "UPDATE"))
    val specs = Config.parse(yaml(src, dest,
      """    transformer: tablerenamer
        |    parameters:
        |      TableName: y
        |""".stripMargin))
    new Runner(spark, specs, s"$dest/_tracking").drainOnce()
    assert(!ParquetTable.exists(spark, s"$dest/x.parquet"))
    val y = spark.read.parquet(s"$dest/y.parquet")
    assert(y.count() === 4)
    assert(y.filter(col("name") === "Dirk Delta").count() === 1)
  }
}
