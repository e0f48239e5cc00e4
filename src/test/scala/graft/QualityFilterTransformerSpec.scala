package graft

import org.apache.spark.sql.functions._

import graft.core._
import graft.operators.QualityFilterTransformer

/** Ingest-time quality gate: the `quality_filter` transformer. */
class QualityFilterTransformerSpec extends SparkSpec {
  import spark.implicits._

  private def words(n: Int, distinct: Boolean = true): String =
    (1 to n).map(i => if (distinct) s"w$i" else "w").mkString(" ")

  test("INSERT rows outside the token band or diversity floor are dropped") {
    val params = Params(extra = Map(
      "MinTokens" -> "5", "MaxTokens" -> "10", "MinDistinctRatio" -> "0.5"))
    val batch = Seq(
      (1L, words(7)),                  // in band, diverse -> keep
      (2L, words(3)),                  // too short -> drop
      (3L, words(20)),                 // too long -> drop
      (4L, words(8, distinct = false)) // distinct_ratio 1/8 -> drop
    ).toDF("id", "text").withColumn(Method.Col, lit("INSERT"))
    val out = QualityFilterTransformer(TableBatch("b", "t", batch), params).head.df
    assert(out.select("id").collect().map(_.getLong(0)).toSet === Set(1L))
  }

  test("punctuation ceiling applies; NULL content never passes as INSERT") {
    val params = Params(extra = Map("MinTokens" -> "1", "MaxPunctRatio" -> "0.2"))
    val batch = Seq(
      (1L, "clean words here"),
      (2L, "!!! ??? ### $$$"), // punct-dominated -> drop
      (3L, null: String)       // no content -> drop
    ).toDF("id", "text").withColumn(Method.Col, lit("INSERT"))
    val out = QualityFilterTransformer(TableBatch("b", "t", batch), params).head.df
    assert(out.select("id").collect().map(_.getLong(0)).toSet === Set(1L))
  }

  test("REPLACE and REMOVE rows pass regardless of content quality") {
    val params = Params(extra = Map("MinTokens" -> "5"))
    val batch = Seq(
      (1L, "x", "REPLACE"),          // low quality but an update -> pass
      (2L, null: String, "REMOVE"),  // delete carries no content -> pass
      (3L, "x", "INSERT"),           // low quality insert -> drop
      (4L, "x", null: String)        // NULL method routes to REPLACE -> pass
    ).toDF("id", "text", Method.Col)
    val out = QualityFilterTransformer(TableBatch("b", "t", batch), params).head.df
    assert(out.select("id").collect().map(_.getLong(0)).toSet === Set(1L, 2L, 4L))
  }

  test("a method-less batch is treated as inserts (the filter applies)") {
    val params = Params(extra = Map("MinTokens" -> "3"))
    val batch = Seq((1L, words(5)), (2L, words(2))).toDF("id", "text")
    val out = QualityFilterTransformer(TableBatch("b", "t", batch), params).head.df
    assert(out.select("id").collect().map(_.getLong(0)).toSet === Set(1L))
  }

  test("a full pipeline drain with the quality gate loads only passing rows") {
    val src = tmpDir("qf-src"); val dest = tmpDir("qf-pipe")
    // ids 1..60: even ids get 25 distinct tokens (pass), odd ids get 3 (fail)
    (1L to 60L).map(i => (i, words(if (i % 2 == 0) 25 else 3)))
      .toDF("id", "text").write.parquet(s"$src/t.parquet")
    val cfg = Config.parse(
      s"""pipelines:
         |  - source-database: a
         |    source-table: t
         |    key: id
         |    source-path: $src
         |    destination-path: $dest
         |    transformer: quality_filter
         |    parameters: { BatchSize: 25, MinTokens: "20" }
         |""".stripMargin)
    new Pipeline(spark, cfg.head, new TrackingStore(spark, s"$dest/_tracking")).drain()
    val got = spark.read.parquet(s"$dest/t.parquet")
    assert(got.count() === 30)
    assert(got.filter(col("id") % 2 =!= 0).count() === 0)
  }
}
