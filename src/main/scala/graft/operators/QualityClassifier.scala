package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trained quality classifier: logistic regression over hashed
  * bag-of-tokens features — the fastText/CCNet-style model-based
  * quality filter ([[TextOps.qualityScore]]'s Scaladoc promises
  * exactly this upgrade: "swap the hard-coded weights for trained
  * ones and nothing else moves").
  *
  * Split of labor, mirroring the PQ-codebook posture
  * ([[VectorOps.trainPqModel]]'s driver-side k-means over a bounded
  * sample):
  *  - **Training is driver-side and deterministic** — full-batch
  *    gradient descent over a bounded, doc_id-ordered sample
  *    (`maxTrainRows`). No Spark-ML iteration nondeterminism; the same
  *    corpus always yields bit-identical weights, which is what lets
  *    the scoring oracle replay from an exported weights table.
  *  - **Featurization and scoring are distributed, relational and
  *    O(tokens)** — explode → md5-nibble hash bucket → per-doc
  *    normalized counts → broadcast-join the (≤ `dim`-row) weights →
  *    one partial-agg sum per doc. No UDFs; the scoring plan is the
  *    same shape as the tf-idf/BM25 family.
  *
  * The hash is the oracle-portable md5-nibble trick used across the
  * query surface: bucket = value of the first log16(dim) hex nibbles
  * of md5(token), so DuckDB reproduces the feature space exactly.
  *
  * Scale: training reads `maxTrainRows` docs once (collected sparse —
  * bounded); scoring touches each token once and shuffles one
  * (doc_id, bucket) partial aggregate. Weights are a broadcast of at
  * most `dim` rows.
  */
object QualityClassifier {

  /** dim must be a power of 16 (whole md5 nibbles): 16, 256, 4096... */
  val DefaultDim = 4096

  case class Model(dim: Int, bias: Double, weights: Array[Double]) {
    /** Weights as a broadcastable table (bucket −1 carries the bias,
      * keeping the exported artifact a single parquet).
      */
    def toDF(spark: SparkSession): DataFrame = {
      import spark.implicits._
      ((-1, bias) +: weights.zipWithIndex.map { case (w, b) => (b, w) }.toSeq)
        .toDF("bucket", "weight")
    }
  }

  def loadModel(weights: DataFrame): Model = {
    val rows = weights.collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toMap
    // buckets run 0..dim+ExtraFeatures−1
    val dim = rows.keys.max + 1 - ExtraFeatures
    Model(dim, rows(-1),
      Array.tabulate(dim + ExtraFeatures)(b => rows.getOrElse(b, 0.0)))
  }

  private[graft] def nibblesFor(dim: Int): Int = {
    val n = (math.log(dim) / math.log(16)).round.toInt
    require(BigInt(16).pow(n) == dim,
      s"dim=$dim must be a power of 16 (md5 nibbles)")
    n
  }

  /** Number of engineered feature slots past the hash space. */
  val ExtraFeatures = 3

  /** Per-doc sparse features: hashed token buckets 0..dim−1 with
    * x = count/doc-length, PLUS three reserved engineered buckets the
    * fastText-style quality models carry — `dim` = log-length
    * (ln n / 5), `dim+1` = lexical diversity (distinct/n), `dim+2` =
    * punctuation share ([[TextOps.punctRatio]]). The L1-normalized
    * bag alone is length-blind (every doc's x sums to 1), and quality
    * labels are driven precisely by these statistics; without the
    * engineered slots the model measurably cannot fit them.
    */
  def featurize(docs: DataFrame, dim: Int = DefaultDim): DataFrame = {
    val nib = nibblesFor(dim)
    // null text carries no features (the simhash/qualityScore stance);
    // EMPTY text is a legal minimal document — its punct ratio is 0 by
    // convention, because the shared punctRatio's length(text) divisor
    // throws DIVIDE_BY_ZERO under ANSI mode on it
    val d = docs.filter(col("text").isNotNull)
    val toks = d.select(col("doc_id"),
      size(TextOps.tokens).cast("double").as("n"),
      explode(TextOps.tokens).as("w"))
      .withColumn("bucket",
        conv(substring(md5(col("w")), 1, nib), 16, 10).cast("int"))
      .groupBy("doc_id", "bucket")
      .agg((count(lit(1)) / first("n")).as("x"))
    // one scan for all three engineered slots (three union branches
    // would re-read the corpus once each)
    val engineered = d.select(col("doc_id"),
      explode(array(
        struct(lit(dim).as("bucket"),
          (log(size(TextOps.tokens).cast("double")) / 5.0).as("x")),
        struct(lit(dim + 1).as("bucket"),
          TextOps.distinctRatio(TextOps.tokens).as("x")),
        struct(lit(dim + 2).as("bucket"),
          when(length(col("text")) === 0, 0.0)
            .otherwise(TextOps.punctRatio(col("text"))).as("x"))))
        .as("f"))
      .select(col("doc_id"), col("f.bucket"), col("f.x"))
    toks.unionByName(engineered)
  }

  private def sigmoid(z: Double): Double = 1.0 / (1.0 + math.exp(-z))

  /** Deterministic full-batch GD over a doc_id-ordered bounded sample.
    * `labeled` needs (doc_id, text, label∈{0,1}). Features are L1-
    * normalized token counts, so a unit learning rate is stable at any
    * document length.
    */
  def train(labeled: DataFrame, dim: Int = DefaultDim, epochs: Int = 200,
            lr: Double = 2.0, maxTrainRows: Int = 10000): Model = {
    val sample = labeled.select("doc_id", "text", "label")
      .orderBy("doc_id").limit(maxTrainRows)
    val feats = featurize(sample, dim)
      .join(sample.select(col("doc_id"), col("label").cast("double")),
        "doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    // per-doc sparse vectors as primitive parallel arrays, doc_id
    // order → deterministic gradient accumulation → bit-identical
    // weights every run; the unboxed while-loops matter because the
    // epochs × docs × nnz hot path runs 10^8-ish steps at the gate's
    // training budget
    val docs = feats.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (_, rows) =>
        val sorted = rows.sortBy(_._2)
        (rows.head._4, sorted.map(_._2).toArray, sorted.map(_._3).toArray)
    }.toArray
    require(docs.nonEmpty, "QualityClassifier.train: empty training set")
    val nw = dim + ExtraFeatures // hash buckets + engineered slots
    val w = new Array[Double](nw)
    val gw = new Array[Double](nw)
    var bias = 0.0
    val n = docs.length.toDouble
    var e = 0
    while (e < epochs) {
      java.util.Arrays.fill(gw, 0.0)
      var gb = 0.0
      var di = 0
      while (di < docs.length) {
        val (y, bs, xs) = docs(di)
        var z = bias
        var i = 0
        while (i < bs.length) { z += w(bs(i)) * xs(i); i += 1 }
        val g = sigmoid(z) - y
        i = 0
        while (i < bs.length) { gw(bs(i)) += g * xs(i); i += 1 }
        gb += g
        di += 1
      }
      var b = 0
      while (b < nw) { w(b) -= lr * gw(b) / n; b += 1 }
      bias -= lr * gb / n
      e += 1
    }
    Model(dim, bias, w)
  }

  /** Distributed scoring: margin z = bias + Σ w·x, probability σ(z),
    * predicted label. One broadcast join + one per-doc sum;
    * margin/prob rounded to 4 dp (the cross-engine float-sum grain the
    * cosine family already uses), and the label derived from the
    * ROUNDED margin — the oracle replays the same 4-dp grain, so a
    * document whose float-sum margin sits within an ulp of 0 cannot
    * flip `pred` between engines while `margin` agrees.
    */
  def score(docs: DataFrame, model: Model): DataFrame = {
    val spark = docs.sparkSession
    val wdf = broadcast(
      model.toDF(spark).filter(col("bucket") >= 0))
    featurize(docs, model.dim)
      .join(wdf, "bucket")
      .groupBy("doc_id")
      .agg(sum(col("x") * col("weight")).as("dotp"))
      .select(col("doc_id"),
        round(col("dotp") + model.bias, 4).as("margin"),
        round(lit(1.0) /
          (lit(1.0) + exp(-(col("dotp") + model.bias))), 4).as("prob"))
      .withColumn("pred", (col("margin") >= 0).cast("int"))
  }
}
