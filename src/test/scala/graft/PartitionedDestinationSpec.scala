package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.core._
import graft.operators.MethodRoutedLoader

/** `PartitionBy` value-partitioned destinations: predicate pruning on
  * the read side (PartitionFilters in the scan), pruned rewrites on the
  * load side, and the full-rewrite fallback when a batch is unprunable.
  */
class PartitionedDestinationSpec extends SparkSpec {
  import spark.implicits._

  private def partDirs(target: String): Map[String, Set[String]] = {
    import scala.jdk.CollectionConverters._
    Files.list(Paths.get(target)).iterator().asScala
      .filter(p => p.getFileName.toString.contains("="))
      .map { p =>
        p.getFileName.toString ->
          Files.list(p).iterator().asScala.map(_.getFileName.toString)
            .filter(_.endsWith(".parquet")).toSet
      }.toMap
  }

  private val params = Params(partitionByCol = Some("cat"))

  private def seed(dest: String): String = {
    val target = s"$dest/t.parquet"
    val batch = (1L to 300L).map(i => (i, s"c${i % 3}", s"v$i"))
      .toDF("id", "cat", "v")
      .withColumn(Method.Col, lit("INSERT"))
    MethodRoutedLoader.load(spark, TableBatch("b", "t", batch), dest,
      Seq("id"), params)
    target
  }

  test("drain through YAML PartitionBy lays the table out by value") {
    val src = tmpDir("pb-src"); val dest = tmpDir("pb-dest")
    (1L to 300L).map(i => (i, s"c${i % 3}", s"v$i")).toDF("id", "cat", "v")
      .write.parquet(s"$src/t.parquet")
    val cfg = graft.core.Config.parse(
      s"""pipelines:
         |  - source-database: a
         |    source-table: t
         |    key: id
         |    source-path: $src
         |    destination-path: $dest
         |    parameters: { PartitionBy: cat, BatchSize: 100000 }
         |""".stripMargin)
    new Pipeline(spark, cfg.head, new TrackingStore(spark, s"$dest/_tracking")).drain()
    val dirs = partDirs(s"$dest/t.parquet")
    assert(dirs.keySet === Set("cat=c0", "cat=c1", "cat=c2"))
    assert(spark.read.parquet(s"$dest/t.parquet").count() === 300)
  }

  test("reads filtering on the partition column prune at the source") {
    val dest = tmpDir("pb-prune")
    val target = seed(dest)
    val q = spark.read.parquet(target).filter(col("cat") === "c1")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(cat"),
      s"expected a partition filter in:\n$scan")
    assert(q.count() === 100)
    // and the physical read touched only the one matching directory
    val files = q.select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSet
    assert(files.nonEmpty && files.forall(_.contains("cat=c1")))
  }

  test("REPLACE rewrites only the partitions its rows live in") {
    val dest = tmpDir("pb-rw")
    val target = seed(dest)
    val before = partDirs(target)
    val batch = Seq((5L, "c2", "v5-NEW")).toDF("id", "cat", "v")
      .withColumn(Method.Col, lit("REPLACE"))
    MethodRoutedLoader.load(spark, TableBatch("b", "t", batch), dest,
      Seq("id"), params)
    val after = partDirs(target)
    val changed = before.keySet.filter(k => before(k) != after.getOrElse(k, Set.empty))
    assert(changed === Set("cat=c2"), s"expected only cat=c2 rewritten, got $changed")
    val got = spark.read.parquet(target)
    assert(got.count() === 300)
    assert(got.filter(col("id") === 5L).select("v", "cat").head() ===
      org.apache.spark.sql.Row("v5-NEW", "c2"))
  }

  test("REMOVE that empties a partition deletes its directory") {
    val dest = tmpDir("pb-empty")
    val target = seed(dest)
    val ids = (1L to 300L).filter(_ % 3 == 1) // the whole of cat=c1
    val batch = ids.map(i => (i, "c1")).toDF("id", "cat")
      .withColumn(Method.Col, lit("REMOVE"))
    MethodRoutedLoader.load(spark, TableBatch("b", "t", batch), dest,
      Seq("id"), params)
    assert(!partDirs(target).contains("cat=c1"))
    assert(spark.read.parquet(target).count() === 200)
  }

  test("a pre-existing FLAT table migrates to the layout before any pruned swap") {
    val dest = tmpDir("pb-flat")
    val target = s"$dest/t.parquet"
    // seeded WITHOUT PartitionBy: root-level part-* files
    (1L to 300L).map(i => (i, s"c${i % 3}", s"v$i")).toDF("id", "cat", "v")
      .write.parquet(target)
    // first PartitionBy load is a rewrite batch — it must not leave the
    // old flat files beside fresh partition dirs (duplicate rows)
    val batch = Seq((5L, "c2", "v5-NEW")).toDF("id", "cat", "v")
      .withColumn(Method.Col, lit("REPLACE"))
    MethodRoutedLoader.load(spark, TableBatch("b", "t", batch), dest,
      Seq("id"), params)
    assert(partDirs(target).keySet === Set("cat=c0", "cat=c1", "cat=c2"))
    val got = spark.read.parquet(target)
    assert(got.count() === 300, "no duplicated or resurrected rows")
    // NB the partition column reads back LAST after migration — select
    assert(got.filter(col("id") === 5L).select("v").head().getString(0) === "v5-NEW")
    // and insert-only loads migrate too (mixed layout breaks discovery)
    val dest2 = tmpDir("pb-flat2")
    (1L to 10L).map(i => (i, s"c${i % 2}", s"v$i")).toDF("id", "cat", "v")
      .write.parquet(s"$dest2/t.parquet")
    val ins = Seq((11L, "c0", "v11")).toDF("id", "cat", "v")
      .withColumn(Method.Col, lit("INSERT"))
    MethodRoutedLoader.load(spark, TableBatch("b", "t", ins), dest2,
      Seq("id"), params)
    assert(spark.read.parquet(s"$dest2/t.parquet").count() === 11)
  }

  test("NULL partition value (PK-only REMOVE) falls back to a full rewrite") {
    val dest = tmpDir("pb-null")
    val target = seed(dest)
    val batch = Seq((7L, null: String)).toDF("id", "cat")
      .withColumn(Method.Col, lit("REMOVE"))
    MethodRoutedLoader.load(spark, TableBatch("b", "t", batch), dest,
      Seq("id"), params)
    val got = spark.read.parquet(target)
    assert(got.count() === 299)
    assert(got.filter(col("id") === 7L).isEmpty)
    // layout preserved by the fallback
    assert(partDirs(target).keySet === Set("cat=c0", "cat=c1", "cat=c2"))
  }
}
