package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.MembershipStore

/** Persisted Bloom membership lifecycle: zero false negatives through
  * write+extend (the add/probe hash-agreement pin), the noise-floor-
  * free behaviour at corpus scale that CMS membership cannot give
  * (the bug the store exists to fix), bounded false positives,
  * ledger-fenced replays, loud geometry rejects, the saturation dial,
  * and the novelty-gated curation stream (dedup across triggers,
  * stream ≡ sequential fold, idempotent replay).
  */
class MembershipStoreSpec extends SparkSpec {
  import spark.implicits._

  private def keys(range: Range, tag: String): DataFrame =
    range.map(i => s"${tag}_$i").toDF("w")

  test("no false negatives through write+extend; false positives " +
    "bounded; geometry drift and replay fenced") {
    val path = tmpDir("mem-basic") + "/store"
    MembershipStore.write(keys(1 to 50000, "a"), col("w"), path,
      expectedItems = 200000L, fpp = 0.01)
    MembershipStore.extend(keys(1 to 50000, "b"), col("w"), path,
      batchId = 1L, expectedItems = 200000L, fpp = 0.01)
    // every inserted key from BOTH batches must read seen — a single
    // false negative means the add/probe hash pairing broke
    val ins = keys(1 to 50000, "a").unionByName(keys(1 to 50000, "b"))
    assert(MembershipStore.seen(ins, col("w"), path)
      .filter(!col("seen")).count() === 0L,
      "Bloom filters have no false negatives")
    // fresh keys: false-positive rate near the declared 1%
    val fresh = keys(1 to 50000, "z")
    val fp = MembershipStore.seen(fresh, col("w"), path)
      .filter(col("seen")).count()
    assert(fp < 50000L * 0.03,
      s"false-positive rate ${fp / 50000.0} far above the declared 1%")
    val st = MembershipStore.stats(spark, path).head
    assert(st.getAs[Long]("items_added") === 100000L)
    assert(st.getAs[Long]("applied_batches") === 1L)
    // replay: ledger-fenced (accounting unchanged)
    MembershipStore.extend(keys(1 to 50000, "b"), col("w"), path,
      batchId = 1L, expectedItems = 200000L, fpp = 0.01)
    assert(MembershipStore.stats(spark, path).head
      .getAs[Long]("items_added") === 100000L)
    // geometry drift rejects loudly
    val e = intercept[IllegalArgumentException] {
      MembershipStore.extend(fresh, col("w"), path, batchId = 2L,
        expectedItems = 999L)
    }
    assert(e.getMessage.contains("expectedItems"))
  }

  test("membership novelty has NO noise floor at corpus scale — the " +
    "regime where CMS minCount=1 reads everything as seen") {
    // a store holding 100k items: a CMS of default geometry would
    // estimate ~N/width ≈ 50 for UNSEEN keys (est >= 1 everywhere);
    // the Bloom answer stays crisp
    val path = tmpDir("mem-floor") + "/store"
    MembershipStore.write(keys(1 to 100000, "corpus"), col("w"), path,
      expectedItems = 200000L)
    val probe = keys(1 to 1000, "fresh").withColumn("doc", col("w")
      .substr(lit(1), lit(7)))  // one group
    val nov = MembershipStore.novelty(probe, "doc", col("w"), path)
      .head
    assert(nov.getAs[Long]("novelty_est_ppm") > 950000L,
      s"fresh keys against a 100k-item store must stay ~fully novel, " +
        s"got ${nov.getAs[Long]("novelty_est_ppm")} ppm")
    // and the saturation dial reads sane
    val st = MembershipStore.stats(spark, path).head
    assert(st.getAs[Double]("current_fpp") < 0.011,
      "under capacity the current fpp must not exceed the declared")
  }

  test("novelty-gated curation stream: duplicates arriving in later " +
    "triggers are dropped; stream equals the sequential fold; " +
    "replayed triggers are exactly-once") {
    import graft.streaming.StreamingPipeline
    val store = tmpDir("cur-store") + "/freq"
    val out = tmpDir("cur-out")
    val src = tmpDir("cur-src")
    // token space unique per seed: distinct seeds share ZERO shingles,
    // equal seeds are verbatim repeats
    def doc(id: Long, seed: Long) =
      (id, (1 to 30).map(j => s"w${seed}_$j").mkString(" "))
    val t1 = (1L to 10L).map(i => doc(i, i))
    val t2 = (11L to 15L).map(i => doc(i, i - 10)) ++ // repeats of 1..5
      (16L to 20L).map(i => doc(i, i * 100))          // fresh
    val t3 = (21L to 25L).map(i => doc(i, i - 20))    // repeats again
    Seq(t1, t2, t3).foreach(b =>
      b.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(src))
    val stream = spark.readStream
      .schema(t1.toDF("doc_id", "text").schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    StreamingPipeline.noveltyCurationStream(stream, store, out,
      tmpDir("cur-ckpt"), expectedItems = 100000L,
      minNoveltyPpm = 500000L)
      .awaitTermination()
    val kept = spark.read.parquet(s"$out/b_*")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((1L to 10L).forall(kept), "the first batch is all-novel")
    assert((16L to 20L).forall(kept), "fresh docs in trigger 2 survive")
    assert(!(11L to 15L).exists(kept),
      "repeats of already-kept docs must be dropped")
    assert(!(21L to 25L).exists(kept),
      "late repeats must be dropped too")
    // stream ≡ sequential fold: replay the same three batches through
    // curateBatch by hand into a fresh store and compare kept sets
    val store2 = tmpDir("cur-store2") + "/freq"
    val out2 = tmpDir("cur-out2")
    Seq(t1, t2, t3).zipWithIndex.foreach { case (b, i) =>
      MembershipStore.curateBatch(b.toDF("doc_id", "text"), store2,
        out2, batchId = i.toLong, expectedItems = 100000L,
        producer = "manual")
    }
    val kept2 = spark.read.parquet(s"$out2/b_*")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept2 === kept, "stream and sequential fold diverged")
    // a replayed trigger is fully idempotent: same output, same store
    val addedBefore = MembershipStore.stats(spark, store2).head
      .getAs[Long]("items_added")
    MembershipStore.curateBatch(t2.toDF("doc_id", "text"), store2,
      out2, batchId = 1L, expectedItems = 100000L, producer = "manual")
    assert(MembershipStore.stats(spark, store2).head
      .getAs[Long]("items_added") === addedBefore,
      "replay must not re-count into the store")
    assert(spark.read.parquet(s"$out2/b_*")
      .select("doc_id").collect().map(_.getLong(0)).toSet === kept,
      "replay must not change the landed output")
  }
}
