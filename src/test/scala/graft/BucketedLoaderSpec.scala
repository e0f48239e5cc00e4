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

  test("auto policy: flat until growth makes pruning worth it, then migrates") {
    val dest = tmpDir("am-dest")
    val target = s"$dest/t.parquet"
    // thresholds scaled down so a ~10 KB table triggers: wanted =
    // bytes/1024 (a few dozen buckets) >= max(2, factor * batchSize)
    // with the CONFIGURED batch size as the steady-state key bound
    val params = Params(batchSize = 2, extra = Map(
      "autoBucketTargetBytes" -> "1024", "autoBucketPruneFactor" -> "2"))

    // insert-only creation stays flat (appends never rewrite)
    val seed = (1L to 1000L).map(i => (i, s"v$i")).toDF("id", "v")
      .withColumn(Method.Col, lit("INSERT"))
    MethodRoutedLoader.load(spark, TableBatch("b", "t", seed), dest, Seq("id"), params)
    assert(ParquetTable.readBucketMarker(spark, target).isEmpty)

    // a small upsert against the small table stays flat too: with
    // pruneFactor 1000 the bucket count can never out-prune the batch
    val stayFlat = Seq((1L, "v1-NEW")).toDF("id", "v")
      .withColumn(Method.Col, lit("REPLACE"))
    MethodRoutedLoader.load(spark, TableBatch("b", "t", stayFlat), dest, Seq("id"),
      Params(extra = Map(
        "autoBucketTargetBytes" -> "1024", "autoBucketPruneFactor" -> "100000")))
    assert(ParquetTable.readBucketMarker(spark, target).isEmpty)

    // past the threshold the same load migrates to 2^ceil(log2(bytes/1024))
    val upsert = Seq((2L, "v2-NEW"), (3L, "v3-NEW")).toDF("id", "v")
      .withColumn(Method.Col, lit("REPLACE"))
    MethodRoutedLoader.load(spark, TableBatch("b", "t", upsert), dest, Seq("id"), params)
    val marker = ParquetTable.readBucketMarker(spark, target)
    assert(marker.exists(n => n >= 8 && (n & (n - 1)) == 0),
      s"expected a pow-2 bucket count >= 8, got $marker")
    assert(filesPerBucket(target).nonEmpty)

    // data survived the migration and the upsert applied
    val got = spark.read.parquet(target).drop(MethodRoutedLoader.BucketCol)
    assert(got.count() === 1000)
    assert(got.filter(col("id") === 1L).head().getString(1) === "v1-NEW")
    assert(got.filter(col("id") === 2L).head().getString(1) === "v2-NEW")

    // the recorded layout is now law: later loads prune against it
    val before = filesPerBucket(target)
    val one = Seq((500L, "v500-NEW")).toDF("id", "v")
      .withColumn(Method.Col, lit("REPLACE"))
    MethodRoutedLoader.load(spark, TableBatch("b", "t", one), dest, Seq("id"), params)
    val after = filesPerBucket(target)
    val changed = before.keySet.filter(b => before(b) != after.getOrElse(b, Set.empty))
    assert(changed.size === 1, s"expected 1 rewritten bucket, got $changed")
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

class ReviewRegressionSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.core._
  import graft.operators.MethodRoutedLoader

  test("REMOVE that empties its bucket actually deletes the rows") {
    val dest = tmpDir("eb-dest")
    val params = Params(partitionBuckets = 4)
    // seed via the bucketed loader so layout matches
    val seed = (1L to 40L).map(i => (i, s"v$i")).toDF("id", "v")
      .withColumn(Method.Col, lit("INSERT"))
    MethodRoutedLoader.load(spark, TableBatch("b", "t", seed), dest, Seq("id"), params)
    // find one bucket and remove ALL its keys
    val withB = spark.read.parquet(s"$dest/t.parquet")
    val bucketOfInterest = withB
      .select(col(MethodRoutedLoader.BucketCol).cast("long"))
      .head().getLong(0)
    val doomedIds = withB
      .filter(col(MethodRoutedLoader.BucketCol).cast("long") === bucketOfInterest)
      .select("id").as[Long].collect().toSeq
    val removes = doomedIds.map(i => (i, "")).toDF("id", "v")
      .withColumn(Method.Col, lit("REMOVE"))
    MethodRoutedLoader.load(spark, TableBatch("b", "t", removes), dest, Seq("id"), params)
    val after = spark.read.parquet(s"$dest/t.parquet")
    assert(after.filter(col("id").isin(doomedIds: _*)).count() === 0)
    assert(after.count() === 40 - doomedIds.size)
  }

  test("timestamp ties spanning a batch boundary are not lost") {
    val src = tmpDir("tie-src"); val dest = tmpDir("tie-dest")
    val t = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    // 5 rows share one timestamp; batchSize 2 cuts through the group
    (1L to 5L).map(i => (i, t)).toDF("id", "ts").write.parquet(s"$src/t.parquet")
    val spec = PipelineSpec("a", "t", "ts", "b", "t", src, dest,
      extractor = "timestamp", primaryKey = Some("id"),
      params = Params(batchSize = 2))
    new Pipeline(spark, spec, new TrackingStore(spark, s"$dest/_tracking")).drain()
    assert(spark.read.parquet(s"$dest/t.parquet").count() === 5)
  }

  test("NULL _method routes to REPLACE instead of vanishing") {
    val dest = tmpDir("nm-dest")
    Seq((1L, "old")).toDF("id", "v").write.parquet(s"$dest/t.parquet")
    val batch = Seq((1L, "new"), (2L, "added")).toDF("id", "v")
      .withColumn(Method.Col, lit(null).cast("string"))
    val counts = MethodRoutedLoader.load(spark,
      TableBatch("b", "t", batch), dest, Seq("id"), Params())
    assert(counts("REPLACE") === 2L)
    val got = spark.read.parquet(s"$dest/t.parquet").orderBy("id").collect()
    assert(got.map(_.getString(1)).toSeq === Seq("new", "added"))
  }

  test("tracking survives a lost pointer (crash recovery)") {
    val root = tmpDir("tp-root")
    val store = new TrackingStore(spark, root)
    store.put(TrackingStatus("a", "t", "id", sequentialPosition = 42L))
    // simulate crash losing the pointer file
    new java.io.File(s"$root/_CURRENT").delete()
    val fresh = new TrackingStore(spark, root)
    assert(fresh.get("a", "t").map(_.sequentialPosition) === Some(42L))
  }
}
