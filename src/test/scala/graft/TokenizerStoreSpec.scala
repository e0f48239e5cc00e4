package graft

import org.apache.spark.sql.functions._

import graft.operators.{TextOps, TokenizerStore}
import graft.streaming.StreamingPipeline

class TokenizerStoreSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = sources.Tables.documents(spark, sf)
    .select("doc_id", "text").limit(120)

  test("store round-trip: load returns the trained merges in order, tokenize matches direct") {
    val docs = corpus
    val path = tmpDir("bpe-store")
    val merges = TextOps.bpeTrain(docs, numMerges = 60)
    TokenizerStore.saveMerges(spark, merges, path, 50000)
    assert(TokenizerStore.load(spark, path) === merges)
    val direct = docs.select(col("doc_id"),
      md5(concat_ws(" ", TextOps.bpeTokens(merges))).as("d"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    val served = TokenizerStore.tokenize(docs, path)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[String]("toks_digest")))
    assert(served.toSeq === direct.toSeq)
  }

  test("write trains and persists in one step; staged swap keeps the old generation on crash-free rebuild") {
    val docs = corpus
    val path = tmpDir("bpe-store-w")
    TokenizerStore.write(docs, path, numMerges = 40)
    val g1 = TokenizerStore.load(spark, path)
    assert(g1.length === 40)
    // rebuild at a bigger budget atomically replaces the artifact
    TokenizerStore.write(docs, path, numMerges = 60)
    val g2 = TokenizerStore.load(spark, path)
    assert(g2.length === 60 && g2.take(40) === g1,
      "BPE training is deterministic-prefix: a bigger budget extends, never rewrites")
  }

  test("extend grows the stored model in place; corpus drift rejects loudly") {
    val docs = corpus
    val path = tmpDir("bpe-store-ext")
    TokenizerStore.write(docs, path, numMerges = 30)
    val g1 = TokenizerStore.load(spark, path)
    TokenizerStore.extend(docs, path, extraMerges = 20)
    val g2 = TokenizerStore.load(spark, path)
    assert(g2.length === 50 && g2.take(30) === g1)
    assert(g2 === TextOps.bpeTrain(docs, numMerges = 50),
      "extend must land on exactly the bigger-budget training result")
    // a different corpus cannot silently extend this artifact
    val drifted = docs.withColumn("text",
      concat(lit("zzq zzq zzq zzq zzq zzq zzq zzq "), col("text")))
    val e = intercept[IllegalArgumentException] {
      TokenizerStore.extend(drifted, path, extraMerges = 5)
    }
    assert(e.getMessage.contains("drifted"))
  }

  test("coverage: exact fixed-point fragmentation metrics under the stored tokenizer") {
    val docs = Seq((1L, "ab ab ab"), (2L, "xyz")).toDF("doc_id", "text")
    val path = tmpDir("bpe-store-cov")
    // train on a corpus where 'a b' merges immediately
    TokenizerStore.write(docs, path, numMerges = 1)
    val r = TokenizerStore.coverage(docs, path).orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getAs[Long]("n_tokens"),
        x.getAs[Long]("n_chars"), x.getAs[Long]("n_char_tokens"),
        x.getAs[Long]("chars_per_token_x10k")))
    val merges = TokenizerStore.load(spark, path)
    // whatever the single merge is, counts must be internally exact
    r.foreach { case (_, nTok, nChars, nCharToks, cpt) =>
      assert(cpt === nChars * 10000 / nTok)
      assert(nCharToks <= nTok && nChars >= nTok)
    }
    assert(merges.length === 1)
  }

  test("tokenizeStream under the frozen store matches the batch pass") {
    val docs = corpus
    val path = tmpDir("bpe-stream-store")
    TokenizerStore.write(docs, path, numMerges = 40)
    val src = tmpDir("bpe-stream-src")
    docs.coalesce(2).write.mode("append").parquet(src)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val out = tmpDir("bpe-stream-out")
    StreamingPipeline.tokenizeStream(stream, path, out,
      tmpDir("bpe-stream-ckpt")).awaitTermination()
    val streamed = spark.read.parquet(s"$out/b_*").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_tokens"),
        r.getAs[String]("toks_digest")))
    val batch = TokenizerStore.tokenize(docs, path).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_tokens"),
        r.getAs[String]("toks_digest")))
    assert(streamed.toSeq === batch.toSeq)
  }
}
