package graft

import org.apache.spark.sql.functions._

import graft.operators.LanguageModelStore
import graft.streaming.StreamingPipeline

class LanguageModelStoreSpec extends SparkSpec {
  import spark.implicits._

  test("score replays the Laplace contract exactly on a hand corpus") {
    // reference: "a b" x3 and "a c" -> cw(a)=4, cb(a,b)=3, cb(a,c)=1,
    // unigrams {a:4, b:3, c:1} -> V=3 (tokens of ref: a b a b a b a c)
    val ref = Seq((1L, "a b a b a b a c")).toDF("doc_id", "text")
    val path = tmpDir("lm-store")
    LanguageModelStore.write(ref, path)
    val target = Seq(
      (10L, "a b"),   // -ln((3+1)/(7+4)) ; cw(a)=7 in ref stream? no:
      (11L, "a z"),   // unseen bigram: -ln((0+1)/(cw(a)+V))
      (12L, "z q")    // unseen word: -ln(1/(0+V))
    ).toDF("doc_id", "text")
    val got = LanguageModelStore.score(target, path)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // ref token stream: a b a b a b a c -> cw(a)=4, cw(b)=3, cw(c)=1;
    // V=3; bigrams: (a,b)=3, (b,a)=3, (a,c)=1
    def s(cb: Long, cw: Long) =
      -math.log((cb + 1).toDouble / (cw + 3).toDouble)
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    assert(got(0) === ((10L, r4(s(3, 4)), 1L)))
    assert(got(1) === ((11L, r4(s(0, 4)), 1L)))
    assert(got(2) === ((12L, r4(s(0, 0)), 1L)))
  }

  test("frozen model: identical docs score identically across corpus versions") {
    val docs = sources.Tables.documents(spark, sf).select("doc_id", "text")
    val path = tmpDir("lm-frozen")
    LanguageModelStore.write(docs.filter($"doc_id" % 3 === 0), path)
    val probe = docs.filter($"doc_id" % 3 === 1).limit(30)
    val v1 = LanguageModelStore.score(probe, path)
      .orderBy("doc_id").collect().toSeq
    // "next month's crawl": same probe docs inside a different corpus —
    // score the UNION, then keep only the probe rows of the OUTPUT; a
    // corpus-internal scorer (whose statistics shift with the extra
    // docs) would fail this, the frozen artifact must not
    val v2 = LanguageModelStore.score(
      probe.unionByName(docs.filter($"doc_id" % 3 === 2).limit(200)),
      path)
      .filter($"doc_id" % 3 === 1)
      .orderBy("doc_id").collect().toSeq
    assert(v1 === v2 && v1.nonEmpty)
  }

  test("extend reproduces the full recount's count tables and scores") {
    val docs = sources.Tables.documents(spark, sf).select("doc_id", "text")
    val a = docs.filter($"doc_id" % 6 === 0)
    val b = docs.filter($"doc_id" % 6 === 3)
    val incr = tmpDir("lm-extend-incr")
    LanguageModelStore.write(a, incr)
    LanguageModelStore.extend(b, incr)
    val full = tmpDir("lm-extend-full")
    LanguageModelStore.write(a.unionByName(b), full)
    def tables(p: String) = {
      val m = LanguageModelStore.load(spark, p)
      (m.uni.orderBy("w1").collect().toSeq,
       m.big.orderBy("w1", "w2").collect().toSeq, m.vocabSize)
    }
    assert(tables(incr) === tables(full))
    val probe = docs.filter($"doc_id" % 3 === 1).limit(25)
    assert(LanguageModelStore.score(probe, incr)
      .orderBy("doc_id").collect().toSeq ===
      LanguageModelStore.score(probe, full)
        .orderBy("doc_id").collect().toSeq)
  }

  test("coverage counts OOV tokens and unseen bigrams exactly") {
    val ref = Seq((1L, "a b a b a b a c")).toDF("doc_id", "text")
    val path = tmpDir("lm-cov")
    LanguageModelStore.write(ref, path)
    val m = LanguageModelStore.load(spark, path)
    val got = LanguageModelStore.coverage(Seq(
      (10L, "a b c"),   // 0 OOV of 3; bigrams (a,b) seen, (b,c) unseen
      (11L, "a z"),     // 1 OOV of 2; 1 unseen bigram of 1
      (12L, "x")        // under two tokens: skipped
    ).toDF("doc_id", "text"), m)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (10L, 0L, 3L, 500000L, 2L),
      (11L, 500000L, 2L, 1000000L, 1L)))
  }

  test("importanceWeight replays the two-model log-ratio exactly") {
    val tgtPath = tmpDir("dsir-t"); val bgPath = tmpDir("dsir-b")
    // target: "a b" twice -> uni {a:2, b:2} V=2, big {(a,b):2, (b,a):1}
    LanguageModelStore.write(
      Seq((1L, "a b a b")).toDF("doc_id", "text"), tgtPath)
    // background: adds c -> uni {a:2, b:2, c:1} V=3,
    // big {(a,b):2, (b,a):1, (b,c):1}... stream: a b a b c
    LanguageModelStore.write(
      Seq((1L, "a b a b c")).toDF("doc_id", "text"), bgPath)
    val got = LanguageModelStore.importanceWeight(
      Seq((10L, "a b")).toDF("doc_id", "text"),
      LanguageModelStore.load(spark, tgtPath),
      LanguageModelStore.load(spark, bgPath))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // ln((2+1)/(2+2)) - ln((2+1)/(2+3))
    val want = math.log(3.0 / 4.0) - math.log(3.0 / 5.0)
    assert(got.toSeq === Seq((10L, math.rint(want * 1e4) / 1e4, 1L)))
  }

  test("importanceSelect favours target-domain documents") {
    val docs = sources.Tables.documents(spark, sf)
      .select("doc_id", "text", "lang")
    val tgtPath = tmpDir("dsir-sel-t"); val bgPath = tmpDir("dsir-sel-b")
    LanguageModelStore.write(docs.filter($"lang" === "en"), tgtPath)
    LanguageModelStore.write(docs, bgPath)
    val k = 50
    val kept = LanguageModelStore.importanceSelect(docs,
        LanguageModelStore.load(spark, tgtPath),
        LanguageModelStore.load(spark, bgPath), k)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.size === k)
    val enShareKept = docs.filter($"doc_id".isin(kept.toSeq: _*))
      .filter($"lang" === "en").count().toDouble / k
    val enShareAll = docs.filter($"lang" === "en").count().toDouble /
      docs.count()
    assert(enShareKept > enShareAll,
      s"DSIR keep set en-share $enShareKept not above corpus $enShareAll")
  }

  test("write rejects an empty reference corpus loudly") {
    val e = intercept[IllegalArgumentException] {
      LanguageModelStore.write(
        Seq.empty[(Long, String)].toDF("doc_id", "text"), tmpDir("lm-empty"))
    }
    assert(e.getMessage.contains("empty reference corpus"))
  }

  test("perplexityFilterStream keeps exactly the batch filter's accept set") {
    val docs = sources.Tables.documents(spark, sf)
      .select("doc_id", "text").limit(90)
    val path = tmpDir("lm-stream-model")
    LanguageModelStore.write(docs.filter($"doc_id" % 3 === 0), path)
    val target = docs.filter($"doc_id" % 3 =!= 0)
    // pick a threshold that splits the corpus nontrivially
    val med = LanguageModelStore.score(target, path)
      .select("mean_lm_surprisal").orderBy("mean_lm_surprisal")
      .collect().map(_.getDouble(0))
    val thr = med(med.length / 2)
    val src = tmpDir("lm-stream-src")
    target.coalesce(2).write.mode("append").parquet(src)
    val stream = spark.readStream.schema(target.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val kept = tmpDir("lm-stream-kept")
    StreamingPipeline.perplexityFilterStream(stream, path, kept,
      tmpDir("lm-stream-ckpt"), maxSurprisal = thr)
      .awaitTermination()
    val streamed = spark.read.parquet(s"$kept/b_*")
      .select("doc_id").as[Long].collect().toSet
    val direct = LanguageModelStore.filter(target, path, thr)
      .select("doc_id").as[Long].collect().toSet
    assert(streamed === direct && direct.nonEmpty)
  }
}
