package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.FrequencyStore

/** Persisted CMS lifecycle: the additive-merge algebra (write+extend
  * equals one-shot counter-for-counter — asserted on the serialized
  * BYTES), the exactly-once batch ledger under replay (the deliberate
  * contrast with SketchStore's free idempotence), loud geometry
  * rejects, the ≥-exact probe invariant through the store, and the
  * streaming leg's stream ≡ batch pin.
  */
class FrequencyStoreSpec extends SparkSpec {
  import spark.implicits._

  private def mk(rows: Seq[String]): DataFrame =
    rows.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id", "w")

  private val a = mk((1 to 300).map(i => s"tok${i % 40}"))
  private val b = mk((1 to 500).map(i => s"tok${i % 90}"))

  private def bytesOf(path: String): Seq[Byte] =
    spark.read.parquet(s"$path/sketch").head.getAs[Array[Byte]](0).toSeq

  test("write+extend equals the one-shot sketch byte-for-byte; probes stay ≥ exact") {
    val split = tmpDir("cms-split") + "/store"
    val whole = tmpDir("cms-whole") + "/store"
    FrequencyStore.write(a, col("w"), split)
    FrequencyStore.extend(b, col("w"), split, batchId = 1L)
    FrequencyStore.write(a.unionByName(b), col("w"), whole)
    assert(bytesOf(split) === bytesOf(whole),
      "additive merge must reproduce the one-shot counter matrix")
    val exact = a.unionByName(b).groupBy("w")
      .agg(count(lit(1)).as("n"))
    val bad = FrequencyStore.estimate(exact, col("w"), split)
      .filter(col("est") < col("n")).count()
    assert(bad === 0, "a CMS probe under the exact count means the " +
      "add/probe hash pairing broke")
    val st = FrequencyStore.stats(spark, split).head
    assert(st.getAs[Long]("total_items") === 800L)
    assert(st.getAs[Long]("applied_batches") === 1L)
  }

  test("a replayed batch id is exactly-once: counters and totals untouched") {
    val path = tmpDir("cms-replay") + "/store"
    FrequencyStore.write(a, col("w"), path)
    FrequencyStore.extend(b, col("w"), path, batchId = 7L)
    val once = bytesOf(path)
    FrequencyStore.extend(b, col("w"), path, batchId = 7L)
    assert(bytesOf(path) === once, "replay double-counted")
    assert(FrequencyStore.stats(spark, path)
      .head.getAs[Long]("total_items") === 800L)
    // a NEW id does count
    FrequencyStore.extend(b, col("w"), path, batchId = 8L)
    assert(bytesOf(path) !== once)
    assert(FrequencyStore.stats(spark, path)
      .head.getAs[Long]("total_items") === 1300L)
  }

  test("ledger ids are producer-scoped: two producers' batch 0 both count") {
    val path = tmpDir("cms-prod") + "/store"
    FrequencyStore.write(a, col("w"), path)
    FrequencyStore.extend(b, col("w"), path, batchId = 0L,
      producer = "stream-one")
    FrequencyStore.extend(b, col("w"), path, batchId = 0L,
      producer = "stream-two")
    val st = FrequencyStore.stats(spark, path).head
    assert(st.getAs[Long]("total_items") === 1300L,
      "a second producer's batch 0 was swallowed by the first's ledger entry")
    assert(st.getAs[Long]("applied_batches") === 2L)
    // while the SAME producer's replay still dedups
    FrequencyStore.extend(b, col("w"), path, batchId = 0L,
      producer = "stream-two")
    assert(FrequencyStore.stats(spark, path)
      .head.getAs[Long]("total_items") === 1300L)
  }

  test("extend bootstraps an absent store and rejects geometry drift loudly") {
    val path = tmpDir("cms-boot") + "/store"
    FrequencyStore.extend(a, col("w"), path, batchId = 0L)
    assert(FrequencyStore.stats(spark, path)
      .head.getAs[Long]("total_items") === 300L)
    val e = intercept[IllegalArgumentException] {
      FrequencyStore.extend(b, col("w"), path, batchId = 1L, seed = 43)
    }
    assert(e.getMessage.contains("seed=42"))
  }

  test("key-format fence: a store counted under a different key " +
    "derivation rejects loudly instead of estimating 0 (ADVICE r12)") {
    val path = tmpDir("cms-keyfmt") + "/store"
    // an unversioned store (the pre-marker shape: key_format = "")
    FrequencyStore.write(a, col("w"), path)
    // a versioned consumer must NOT probe or extend it silently
    val e1 = intercept[IllegalArgumentException] {
      FrequencyStore.requireKeyFormat(spark, path, "dk:v1")
    }
    assert(e1.getMessage.contains("rebuild"))
    val e2 = intercept[IllegalArgumentException] {
      FrequencyStore.extend(b, col("w"), path, batchId = 1L,
        keyFormat = "dk:v1")
    }
    assert(e2.getMessage.contains("key"))
    // and the ledger/counters were untouched by the rejected extend
    assert(FrequencyStore.stats(spark, path)
      .head.getAs[Long]("total_items") === 300L)
    // a matching format passes
    val path2 = tmpDir("cms-keyfmt2") + "/store"
    FrequencyStore.write(a, col("w"), path2, keyFormat = "dk:v1")
    FrequencyStore.requireKeyFormat(spark, path2, "dk:v1")
    FrequencyStore.extend(b, col("w"), path2, batchId = 1L,
      keyFormat = "dk:v1")
    assert(FrequencyStore.stats(spark, path2)
      .head.getAs[Long]("total_items") === 800L)
  }

  test("novelty: per-group unseen share from the stored frequencies, " +
    "fixed-point, never inflated") {
    val path = tmpDir("cms-novelty") + "/store"
    // corpus: "hot" appears 5x, "warm" 2x, "cold" 1x
    FrequencyStore.write(
      mk(Seq.fill(5)("hot") ++ Seq.fill(2)("warm") ++ Seq("cold")),
      col("w"), path)
    // group g1: hot, warm, fresh -> seen(>=2): hot, warm -> novelty 1/3
    // group g2: cold, fresh2     -> seen: none        -> novelty 2/2
    val items = Seq(("g1", "hot"), ("g1", "warm"), ("g1", "fresh"),
      ("g2", "cold"), ("g2", "fresh2")).toDF("doc", "w")
    val got = FrequencyStore.novelty(items, "doc", col("w"), path,
      minCount = 2L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // the tiny vocabulary cannot collide a width-2719 sketch into
    // flipping a verdict, so the estimates are exact here
    assert(got("g1") === ((3L, 2L, 333333L)))
    assert(got("g2") === ((2L, 0L, 1000000L)))
    // one-sided invariant on a larger draw: novelty from the sketch
    // never EXCEEDS the exact novelty (est >= true => seen_est >=
    // exact_seen)
    val probe = b.withColumn("doc", col("id") % 7)
    val exactSeen = probe.join(
      a.groupBy("w").agg(count(lit(1)).as("n")).filter(col("n") >= 2L),
      Seq("w"), "left_semi")
      .groupBy("doc").agg(count(lit(1)).as("exact_seen"))
    val path2 = tmpDir("cms-novelty-2") + "/store"
    FrequencyStore.write(a, col("w"), path2)
    val inflated = FrequencyStore.novelty(probe, "doc", col("w"), path2,
      minCount = 2L)
      .join(exactSeen, Seq("doc"), "left")
      .na.fill(0L, Seq("exact_seen"))
      .filter(col("seen_est") < col("exact_seen")).count()
    assert(inflated === 0L,
      "CMS novelty must never exceed exact novelty (one-sided bound)")
  }

  test("streaming ingest equals the one-shot build") {
    import graft.streaming.StreamingPipeline
    val path = tmpDir("cms-stream") + "/store"
    val ref = tmpDir("cms-stream-ref") + "/store"
    val corpus = a.unionByName(b).localCheckpoint()
    FrequencyStore.write(corpus, col("w"), ref)
    val src = tmpDir("cms-stream-src")
    Seq(corpus.filter(col("id") < 100),
        corpus.filter(col("id") >= 100 && col("id") < 300),
        corpus.filter(col("id") >= 300))
      .foreach(_.coalesce(1).write.mode("append").parquet(src))
    val stream = spark.readStream.schema(corpus.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    StreamingPipeline.frequencyIngestStream(stream, col("w"), path,
      tmpDir("cms-stream-ckpt"))
      .awaitTermination()
    assert(bytesOf(path) === bytesOf(ref),
      "trigger-by-trigger ingest diverged from the one-shot build")
    assert(FrequencyStore.stats(spark, path)
      .head.getAs[Long]("applied_batches") === 3L)
  }
}
