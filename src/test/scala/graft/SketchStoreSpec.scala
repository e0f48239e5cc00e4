package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{SketchOps, SketchStore}

/** Persisted KMV sketch lifecycle: build/extend/serve equivalences
  * (the store must be indistinguishable from the in-session sketch),
  * the exact-merge algebra (write+extend ≡ one-shot write), replay
  * idempotence (the crash-recovery story), loud mismatch rejects, and
  * the streaming ingest leg's stream ≡ batch pin.
  */
class SketchStoreSpec extends SparkSpec {
  import spark.implicits._

  private def mk(groups: Seq[(String, Range)]): DataFrame =
    groups.flatMap { case (g, r) => r.map(i => (g, s"w$i")) }
      .toDF("g", "v")

  private val corpus = mk(Seq("a" -> (1 to 800), "b" -> (500 to 1200),
    "c" -> (1 to 60)))

  private def dumpSketches(path: String) =
    SketchStore.sketches(spark, path)
      .collect()
      .map(r => (r.getAs[String]("g"), r.getSeq[String](1).toList,
        r.getAs[Int]("sk_k")))
      .sortBy(_._1).toList

  test("store-served sketches, estimates and overlap equal the in-session operators") {
    val path = tmpDir("kmv-store") + "/store"
    SketchStore.write(corpus, "g", col("v"), 64, path)
    val direct = SketchOps.kmvSketch(corpus, Seq("g"), col("v"), 64)
      .collect().map(r => (r.getString(0), r.getSeq[String](1).toList, 64))
      .sortBy(_._1).toList
    assert(dumpSketches(path) === direct)
    val est = SketchStore.distinctFrom(spark, path)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toList
    val directEst = SketchOps.kmvDistinct(corpus, Seq("g"), col("v"), 64)
      .select("g", "n_kept", "est")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toList
    assert(est === directEst)
    val ov = SketchStore.overlapFrom(spark, path)
      .orderBy("src_a", "src_b").collect().toSeq
    val directOv = SketchOps.kmvOverlap(
      SketchOps.kmvSketch(corpus, Seq("g"), col("v"), 64), "g")
      .orderBy("src_a", "src_b").collect().toSeq
    assert(ov === directOv)
  }

  test("extend is the exact merge: write(a); extend(b) == write(a ∪ b)") {
    val split = tmpDir("kmv-split") + "/store"
    val whole = tmpDir("kmv-whole") + "/store"
    val a = mk(Seq("a" -> (1 to 400), "b" -> (500 to 700)))
    val b = mk(Seq("a" -> (300 to 800), "b" -> (700 to 1200),
      "c" -> (1 to 60)))
    SketchStore.write(a, "g", col("v"), 64, split)
    SketchStore.extend(b, "g", col("v"), 64, split)
    SketchStore.write(a.unionByName(b), "g", col("v"), 64, whole)
    assert(dumpSketches(split) === dumpSketches(whole))
  }

  test("extend is replay-idempotent: merging the same batch twice is a no-op") {
    val path = tmpDir("kmv-replay") + "/store"
    val b = mk(Seq("a" -> (300 to 900)))
    SketchStore.write(corpus, "g", col("v"), 64, path)
    SketchStore.extend(b, "g", col("v"), 64, path)
    val once = dumpSketches(path)
    SketchStore.extend(b, "g", col("v"), 64, path)
    assert(dumpSketches(path) === once,
      "a crash-replayed ingest batch must heal to a no-op")
  }

  test("extend bootstraps an absent store and rejects k/group drift loudly") {
    val path = tmpDir("kmv-boot") + "/store"
    SketchStore.extend(corpus, "g", col("v"), 64, path)
    assert(dumpSketches(path).map(_._1) === List("a", "b", "c"))
    val eK = intercept[IllegalArgumentException] {
      SketchStore.extend(corpus, "g", col("v"), 128, path)
    }
    assert(eK.getMessage.contains("k=64"))
    val eG = intercept[IllegalArgumentException] {
      SketchStore.extend(corpus.withColumnRenamed("g", "h"), "h",
        col("v"), 64, path)
    }
    assert(eG.getMessage.contains("group=g"))
  }

  test("extend heals the root swap window instead of bootstrapping from the replayed batch") {
    val path = tmpDir("kmv-heal") + "/store"
    SketchStore.write(corpus, "g", col("v"), 64, path)
    val expected = {
      val probe = tmpDir("kmv-heal-ref") + "/store"
      SketchStore.write(corpus, "g", col("v"), 64, probe)
      SketchStore.extend(mk(Seq("a" -> (700 to 1000))), "g", col("v"),
        64, probe)
      dumpSketches(probe)
    }
    // simulate a crash between swap's two renames: the store exists
    // only under its .__old_ name
    java.nio.file.Files.move(
      java.nio.file.Paths.get(path),
      java.nio.file.Paths.get(path + ".__old_999999999999"))
    SketchStore.extend(mk(Seq("a" -> (700 to 1000))), "g", col("v"),
      64, path)
    assert(dumpSketches(path) === expected,
      "extend after a root swap-window crash must merge into the " +
        "healed store, not rebuild from the one batch")
  }

  test("a group with an empty sketch (all-NULL keys) survives extend") {
    val path = tmpDir("kmv-nullg") + "/store"
    val withNull = corpus.unionByName(
      Seq(("z", null.asInstanceOf[String])).toDF("g", "v"))
    SketchStore.write(withNull, "g", col("v"), 64, path)
    assert(dumpSketches(path).exists(r => r._1 == "z" && r._2.isEmpty))
    SketchStore.extend(mk(Seq("a" -> (700 to 1000))), "g", col("v"),
      64, path)
    assert(dumpSketches(path).exists(r => r._1 == "z" && r._2.isEmpty),
      "the empty-sketch group vanished in the merge")
  }

  test("streaming ingest equals the one-shot build") {
    import graft.streaming.StreamingPipeline
    val path = tmpDir("kmv-stream") + "/store"
    val ref = tmpDir("kmv-stream-ref") + "/store"
    SketchStore.write(corpus, "g", col("v"), 64, ref)
    // three one-file slices → three triggers under AvailableNow
    val src = tmpDir("kmv-stream-src")
    val slices = Seq(
      corpus.filter(col("g") === "a"),
      corpus.filter(col("g") === "b"),
      corpus.filter(col("g") === "c"))
    slices.foreach(_.coalesce(1).write.mode("append").parquet(src))
    val stream = spark.readStream.schema(corpus.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    StreamingPipeline.sketchIngestStream(stream, "g", col("v"), 64,
      path, tmpDir("kmv-stream-ckpt"))
      .awaitTermination()
    assert(dumpSketches(path) === dumpSketches(ref),
      "trigger-by-trigger ingest diverged from the one-shot build")
  }
}
