package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.core._
import graft.operators._

class TransformersSpec extends SparkSpec {
  import spark.implicits._

  test("expr transformer applies Catalyst expression strings per column") {
    val df = Seq((1L, 2.0), (2L, 3.5)).toDF("id", "v")
    val out = ExprTransformer(TableBatch("b", "t", df),
      Params(expressions = Map(
        "v2" -> "v * 2",
        "tag" -> "concat('row-', cast(id as string))"))).head.df
    val rows = out.orderBy("id").collect()
    assert(rows.map(_.getDouble(2)).toSeq === Seq(4.0, 7.0))
    assert(rows.map(_.getString(3)).toSeq === Seq("row-1", "row-2"))
  }

  test("transformer fanout: one batch may emit several destination tables") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    object Splitter extends Transformer {
      val name = "splitter"
      def apply(b: TableBatch, p: Params): Seq[TableBatch] = Seq(
        b.copy(table = "evens", df = b.df.filter(col("id") % 2 === 0)),
        b.copy(table = "odds", df = b.df.filter(col("id") % 2 === 1)))
    }
    val out = Splitter(TableBatch("b", "t", df), Params())
    assert(out.map(_.table) === Seq("evens", "odds"))
    assert(out.map(_.df.count()) === Seq(1L, 1L))
  }

  test("config: unknown transformer fails fast at parse") {
    val y = """pipelines:
              |  - source-database: a
              |    source-table: t
              |    key: id
              |    source-path: /tmp/x
              |    destination-path: /tmp/y
              |    transformer: nope
              |""".stripMargin
    val e = intercept[IllegalArgumentException](Config.parse(y))
    assert(e.getMessage.contains("nope"))
  }

  test("config: top-level tracking-path surfaces (reference TrackingTableName)") {
    val y = """tracking-path: /state/track
              |pipelines:
              |  - source-database: a
              |    source-table: t
              |    key: id
              |    source-path: /tmp/x
              |    destination-path: /tmp/y
              |""".stripMargin
    val loaded = Config.parseFull(y)
    assert(loaded.trackingPath === Some("/state/track"))
    assert(loaded.pipelines.size === 1)
    // absent key -> None (callers fall back to env / sink-side default)
    assert(Config.parseFull(y.linesIterator.drop(1).mkString("\n"))
      .trackingPath.isEmpty)
  }

  test("property: REPLACE load is idempotent (twice ≡ once)") {
    val src = tmpDir("prop-src")
    (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v")
      .write.parquet(s"$src/t.parquet")
    def drained(): Seq[(Long, String)] = {
      val dest = tmpDir("prop-dest")
      val spec = PipelineSpec("a", "t", "id", "b", "t", src, dest,
        params = Params(sequentialReplace = true, batchSize = 17))
      val tr = new TrackingStore(spark, s"$dest/_tracking")
      new Pipeline(spark, spec, tr).drain()
      // replay from scratch tracking: REPLACE must converge, not duplicate
      new TrackingStore(spark, s"$dest/_tracking2").synchronized {
        new Pipeline(spark, spec, new TrackingStore(spark, s"$dest/_tracking2")).drain()
      }
      spark.read.parquet(s"$dest/t.parquet").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    }
    assert(drained() === (1L to 50L).map(i => (i, s"v$i")))
  }

  test("property: final state is batch-size invariant") {
    val src = tmpDir("bs-src")
    (1L to 101L).map(i => (i, i * 3)).toDF("id", "v")
      .write.parquet(s"$src/t.parquet")
    val expected = (1L to 101L).map(i => (i, i * 3))
    // scalacheck-generated sizes incl. the boundary cases
    val gen = Gen.choose(2, 99)
    val sizes = (0 until 3).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i))) ++ Seq(1, 101, 120)
    sizes.distinct.foreach { bs =>
      val dest = tmpDir(s"bs-dest$bs")
      val spec = PipelineSpec("a", "t", "id", "b", "t", src, dest,
        params = Params(batchSize = bs))
      new Pipeline(spark, spec, new TrackingStore(spark, s"$dest/_tracking")).drain()
      val got = spark.read.parquet(s"$dest/t.parquet").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === expected)
    }
  }
}
