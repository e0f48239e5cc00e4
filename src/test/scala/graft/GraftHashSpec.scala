package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** The one-pass hash kernels ([[graft.functions.SimHash64]],
  * [[graft.functions.MinhashSig]]) must be bit-identical to the
  * composed explode/aggregate plans they replace — the composed plans
  * are what the DuckDB oracle SQL replays, so any divergence here is a
  * silent correctness-gate failure.
  */
class GraftHashSpec extends SparkSpec {

  private lazy val docs = sources.Tables.documents(spark, sf)

  /** Edge shapes the clean corpus never exercises: single token, fewer
    * tokens than the shingle width, repeated tokens, consecutive /
    * trailing separators (split keeps the empty tokens), unicode.
    */
  private def edgeDocs = {
    import spark.implicits._
    Seq(
      (1L, "one"),
      (2L, "two tokens"),
      (3L, "a a a a a a"),
      (4L, "double  space"),
      (5L, "trailing space "),
      (6L, "naïve café über tokens here"),
      (7L, "x y z x y z x y z"),
      (8L, null: String) // composed plans drop null text via explode
    ).toDF("doc_id", "text")
  }

  test("simhash64 kernel ≡ composed 64-vote-sum plan (corpus + edges)") {
    for (d <- Seq(docs.select("doc_id", "text"), edgeDocs)) {
      val kernel = TextOps.simhash(d)
      val composed = TextOps.simhashComposed(d)
      assert(kernel.exceptAll(composed).isEmpty &&
        composed.exceptAll(kernel).isEmpty,
        "simhash kernel diverges from the composed plan")
    }
  }

  test("minhash_sig kernel ≡ composed shingle-min plan (corpus + edges)") {
    for (d <- Seq(docs.select("doc_id", "text"), edgeDocs)) {
      val kernel = TextOps.minhashSignatures(d)
      val composed = TextOps.minhashSignaturesComposed(d)
      assert(kernel.exceptAll(composed).isEmpty &&
        composed.exceptAll(kernel).isEmpty,
        "minhash kernel diverges from the composed plan")
    }
  }

  test("minhash_sig is null (and docs filtered) below the shingle width") {
    // doc 1 ("one") and 2 ("two tokens") have < 3 tokens → no shingles
    val sigs = TextOps.minhashSignatures(edgeDocs)
    assert(sigs.filter(col("doc_id").isin(1L, 2L)).isEmpty)
    assert(sigs.count() === 5)
  }

  test("kernels are registered as SQL functions") {
    docs.limit(8).createOrReplaceTempView("ghs_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, simhash64(text) AS simhash64 FROM ghs_docs")
    val viaApi = TextOps.simhash(docs.limit(8))
    assert(viaSql.exceptAll(viaApi).isEmpty)
    val sig = spark.sql(
      "SELECT minhash_sig(text, 3, 8) AS s FROM ghs_docs").head().getSeq[String](0)
    assert(sig.length === 8 && sig.forall(_.matches("[0-9a-f]{32}")))
  }

  test("signature stage plans contain no exchange (map-side only)") {
    for (plan <- Seq(
        TextOps.simhash(docs).queryExecution.executedPlan,
        TextOps.minhashSignatures(docs).queryExecution.executedPlan)) {
      val txt = plan.toString
      assert(!txt.contains("Exchange"),
        s"signature stage should be shuffle-free:\n$txt")
    }
  }
}
