package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.Bloom
import graft.operators.TextOps

/** Train-batch / serve-stream: the round-5 trained artifacts (BPE merge
  * table, decontamination Bloom sketch) ride the plan as expression
  * literals, so the SAME Column serves a `readStream` source unchanged —
  * no state store, no watermark, no re-training. These specs pin
  * stream-vs-batch row parity for both, which is the production
  * contract: artifacts build once in a batch job, then score the
  * ingest stream.
  */
class StreamServeSpec extends SparkSpec {

  import spark.implicits._

  private def streamOf(dir: String) = spark.readStream
    .schema(spark.read.parquet(dir).schema)
    .parquet(dir)

  private def runToParquet(df: org.apache.spark.sql.DataFrame): String = {
    val out = tmpDir("serve-out"); val ckpt = tmpDir("serve-ckpt")
    val q = df.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .format("parquet").option("path", out).start()
    q.awaitTermination()
    out
  }

  test("trained BPE tokenizer scores a stream identically to batch") {
    val docs = sources.Tables.documents(spark, sf)
    val src = tmpDir("bpe-src")
    docs.write.mode("overwrite").parquet(src)
    val merges = TextOps.bpeTrain(docs, numMerges = 80)
    val toks = TextOps.bpeTokens(merges)
    val project = (d: org.apache.spark.sql.DataFrame) => d.select(col("doc_id"),
      size(toks).as("n"), md5(concat_ws(" ", toks)).as("digest"))
    val streamed = spark.read.parquet(runToParquet(project(streamOf(src))))
      .orderBy("doc_id").collect()
    val batch = project(docs).orderBy("doc_id").collect()
    assert(streamed.nonEmpty && streamed.sameElements(batch),
      "stream-served tokenization must match batch row-for-row")
  }

  test("bloom sketch prefilters a shingle stream identically to batch") {
    val docs = sources.Tables.documents(spark, sf)
    val bench = TextOps.shingles(docs.filter(col("doc_id") % 100 === 0))
      .select("s").distinct()
    val n = math.max(1L, bench.count())
    val sketch = bench.agg(Bloom.bloomAgg(col("s"), n, n * 16)).head
      .getAs[Array[Byte]](0)
    val corpus = docs.filter(col("doc_id") % 100 =!= 0)
    val src = tmpDir("bloom-src")
    corpus.write.mode("overwrite").parquet(src)
    val candidates = (d: org.apache.spark.sql.DataFrame) =>
      TextOps.shingles(d).filter(Bloom.mightContain(sketch, col("s")))
    val streamed = spark.read.parquet(runToParquet(candidates(streamOf(src))))
      .orderBy("doc_id", "s").collect()
    val batch = candidates(corpus).orderBy("doc_id", "s").collect()
    assert(streamed.nonEmpty && streamed.sameElements(batch),
      "stream-served sketch prefilter must match batch row-for-row")
  }
}
