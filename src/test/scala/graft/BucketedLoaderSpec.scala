package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.core._
import graft.operators.MethodRoutedLoader

class BucketedLoaderSpec extends SparkSpec {
  import spark.implicits._

  private def filesPerBucket(target: String): Map[String, Set[String]] = {
    import scala.jdk.CollectionConverters._
    Files.list(Paths.get(target)).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("_bucket="))
      .map { p =>
        p.getFileName.toString ->
          Files.list(p).iterator().asScala.map(_.getFileName.toString)
            .filter(_.endsWith(".parquet")).toSet
      }.toMap
  }

  test("bucketed upsert rewrites only the touched partitions") {
    val src = tmpDir("bk-src"); val dest = tmpDir("bk-dest")
    (1L to 1000L).map(i => (i, s"v$i")).toDF("id", "v")
      .write.parquet(s"$src/t.parquet")
    val params = Params(partitionBuckets = 8)
    val spec = PipelineSpec("a", "t", "id", "b", "t", src, dest,
      params = params)
    new Pipeline(spark, spec, new TrackingStore(spark, s"$dest/_tracking")).drain()

    val target = s"$dest/t.parquet"
    val before = filesPerBucket(target)
    assert(before.size === 8)

    // upsert ONE key -> exactly one bucket's files may change
    val batch = Seq((500L, "v500-NEW")).toDF("id", "v")
      .withColumn(Method.Col, lit("REPLACE"))
    MethodRoutedLoader.load(spark, TableBatch("b", "t", batch), dest,
      Seq("id"), params)

    val after = filesPerBucket(target)
    val changed = before.keySet.filter(b => before(b) != after.getOrElse(b, Set.empty))
    assert(changed.size === 1, s"expected 1 rewritten bucket, got $changed")

    // content equals the logical expectation
    val got = spark.read.parquet(target).drop(MethodRoutedLoader.BucketCol)
    assert(got.count() === 1000)
    assert(got.filter(col("id") === 500L).head().getString(1) === "v500-NEW")
  }

  test("bucketed delete prunes partitions and preserves the rest") {
    val src = tmpDir("bd-src"); val dest = tmpDir("bd-dest")
    (1L to 200L).map(i => (i, i * 2)).toDF("id", "v")
      .write.parquet(s"$src/t.parquet")
    val params = Params(partitionBuckets = 4)
    val spec = PipelineSpec("a", "t", "id", "b", "t", src, dest, params = params)
    new Pipeline(spark, spec, new TrackingStore(spark, s"$dest/_tracking")).drain()

    val removes = Seq((7L, 0L), (8L, 0L)).toDF("id", "v")
      .withColumn(Method.Col, lit("REMOVE"))
    MethodRoutedLoader.load(spark, TableBatch("b", "t", removes),
      dest, Seq("id"), params)

    val got = spark.read.parquet(s"$dest/t.parquet")
      .drop(MethodRoutedLoader.BucketCol)
    assert(got.count() === 198)
    assert(got.filter(col("id").isin(7L, 8L)).count() === 0)
    // untouched row intact
    assert(got.filter(col("id") === 100L).head().getLong(1) === 200L)
  }
}

class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.operators.MethodRoutedLoader

  test("upsert batch with a new column evolves the destination schema") {
    val dest = tmpDir("se-dest")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.parquet(s"$dest/t.parquet")
    val batch = Seq((2L, "b2", "extra")).toDF("id", "v", "note")
      .withColumn(graft.core.Method.Col, lit("REPLACE"))
    MethodRoutedLoader.load(spark, graft.core.TableBatch("b", "t", batch),
      dest, Seq("id"), graft.core.Params())
    val got = spark.read.parquet(s"$dest/t.parquet").orderBy("id").collect()
    assert(got.map(_.getString(1)).toSeq === Seq("a", "b2"))
    // old row null in the new column, new row carries it
    assert(got(0).isNullAt(2) && got(1).getString(2) === "extra")
  }
}
