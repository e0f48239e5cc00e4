package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityClassifier

/** Trained hashed-ngram logistic classifier: deterministic training,
  * actual learning on separable data, scoring ≡ driver-side math, and
  * the round-trip through the exported weights table.
  */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // separable corpus: "good" docs share a quality vocabulary,
  // "bad" docs a spam vocabulary
  private def labeled = (0 until 60).map { i =>
    val good = i % 2 == 0
    val words =
      if (good) Seq("insight", "method", "результат", "analysis", s"tok$i")
      else Seq("buy", "click", "now", "free", s"tok$i")
    (i.toLong, (words ++ words.take(i % 3)).mkString(" "),
      if (good) 1 else 0)
  }.toDF("doc_id", "text", "label")

  test("training is deterministic: same corpus, bit-identical weights") {
    val m1 = QualityClassifier.train(labeled, epochs = 50)
    val m2 = QualityClassifier.train(labeled, epochs = 50)
    assert(m1.bias === m2.bias)
    assert(m1.weights.toSeq === m2.weights.toSeq)
  }

  test("the model actually learns: separable vocabularies separate") {
    val m = QualityClassifier.train(labeled)
    val scored = QualityClassifier.score(labeled, m)
      .join(labeled.select("doc_id", "label"), "doc_id")
    val wrong = scored.filter(col("pred") =!= col("label")).count()
    assert(wrong === 0L, s"$wrong of 60 separable docs misclassified")
    // and the margins are confidently signed, not boundary noise
    val minAbs = scored.agg(min(abs(col("margin")))).head.getDouble(0)
    assert(minAbs > 0.1, s"margins too close to the boundary: $minAbs")
  }

  test("scoring matches the driver-side model arithmetic") {
    val m = QualityClassifier.train(labeled, epochs = 50)
    val got = QualityClassifier.score(labeled, m)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val texts = labeled.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nib = 3
    texts.zip(got).foreach { case ((id, text), (gid, margin, prob)) =>
      assert(id === gid)
      val toks = text.split(" ", -1)
      val z = m.bias + toks.groupBy { t =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString
        Integer.parseInt(h.take(nib), 16)
      }.map { case (b, g) => m.weights(b) * g.length.toDouble / toks.length }
        .sum +
        m.weights(m.dim) * math.log(toks.length.toDouble) / 5.0 +
        m.weights(m.dim + 1) * toks.distinct.length.toDouble / toks.length +
        m.weights(m.dim + 2) *
          text.count(ch => !((ch >= '0' && ch <= '9') || ch == ' ' ||
            (ch >= 'a' && ch <= 'z'))).toDouble / text.length
      assert(math.abs(margin - z) < 5e-4, s"doc $id margin")
      assert(math.abs(prob - 1.0 / (1.0 + math.exp(-z))) < 5e-4)
    }
  }

  test("weights round-trip through the exported table") {
    val m = QualityClassifier.train(labeled, epochs = 50)
    val back = QualityClassifier.loadModel(m.toDF(spark))
    assert(back.bias === m.bias)
    assert(back.dim === m.dim)
    assert(back.weights.toSeq === m.weights.toSeq)
  }

  test("empty and null texts don't crash: empty scores (punct=0), null drops") {
    val m = QualityClassifier.train(labeled, epochs = 50)
    val weird = Seq((900L, Some("")), (901L, None: Option[String]),
      (902L, Some("normal text here")))
      .toDF("doc_id", "text")
    val got = QualityClassifier.score(weird, m)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    // empty text is a legal minimal doc; null text carries no features
    assert(got === Array(900L, 902L))
    // and an empty doc in the TRAINING set must not abort training
    val m2 = QualityClassifier.train(
      labeled.union(Seq((903L, "", 0)).toDF("doc_id", "text", "label")),
      epochs = 10)
    assert(m2.weights.length === m.weights.length)
  }

  test("qualityFilterStream keeps exactly the batch operator's accept set") {
    import graft.streaming.StreamingPipeline
    val m = QualityClassifier.train(labeled, epochs = 200)
    val docs = labeled.select("doc_id", "text").localCheckpoint()
    // two one-file slices → two triggers under AvailableNow
    val src = tmpDir("qf-stream-src")
    Seq(docs.filter(col("doc_id") < 30), docs.filter(col("doc_id") >= 30))
      .foreach(_.coalesce(1).write.mode("append").parquet(src))
    val kept = tmpDir("qf-kept") + "/kept"
    StreamingPipeline.qualityFilterStream(
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(src),
      m, kept, tmpDir("qf-ckpt"))
      .awaitTermination()
    val got = spark.read.parquet(s"$kept/b_*")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val want = QualityClassifier.score(docs, m)
      .filter(col("prob") >= 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(got === want,
      "stream accept set diverged from the batch scorer")
    assert(want.nonEmpty && want.length < 60,
      "test corpus should split into kept and dropped")
  }

  test("maxTrainRows bounds the collected sample deterministically") {
    val mAll = QualityClassifier.train(labeled, epochs = 20)
    val mCap = QualityClassifier.train(labeled, epochs = 20,
      maxTrainRows = 10)
    val mCap2 = QualityClassifier.train(labeled, epochs = 20,
      maxTrainRows = 10)
    assert(mCap.weights.toSeq === mCap2.weights.toSeq,
      "capped sample must be deterministic")
    assert(mCap.weights.toSeq !== mAll.weights.toSeq,
      "cap of 10 of 60 docs must actually change the fit")
  }
}
