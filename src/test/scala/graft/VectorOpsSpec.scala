package graft

import org.apache.spark.sql.functions._

import graft.operators.VectorOps

class VectorOpsSpec extends SparkSpec {

  private lazy val embs = sources.Tables.embeddings(spark, sf)

  test("cosine of a vector with itself is 1") {
    val self = embs.limit(5)
      .select(VectorOps.cosine(col("embedding"), col("embedding")).as("c"))
      .collect()
    self.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-9))
  }

  test("top-k returns k ranked neighbours per query, self excluded") {
    val res = VectorOps.cosineTopK(embs, Seq(0L, 1L), k = 5).cache()
    assert(res.count() === 10)
    assert(res.filter(col("vec_id") === col("qid")).count() === 0)
    // rank ordering: cos non-increasing within each query
    val perQ = res.orderBy("qid", "rn").collect().groupBy(_.getAs[Long]("qid"))
    perQ.values.foreach { rows =>
      val cs = rows.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (x, y) => x >= y })
    }
    res.unpersist()
  }

  test("bucketed near-dup pairs agree with brute force within buckets") {
    val bucketed = VectorOps.nearDupPairs(embs, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force restricted to same bucket must give the same set
    val e = embs.select(col("vec_id"), col("embedding"),
      VectorOps.signBucket(col("embedding")).as("bkt"))
    val brute = e.as("x").join(e.as("y"),
        col("x.bkt") === col("y.bkt") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        VectorOps.cosine(col("x.embedding"), col("y.embedding")).as("c"))
      .filter(round(col("c"), 4) >= 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed === brute)
  }

  test("ivf top-k: deterministic, well-formed, and overlaps brute force") {
    val ivf1 = VectorOps.ivfTopK(embs, Seq(0L, 1L, 2L), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val ivf2 = VectorOps.ivfTopK(embs, Seq(0L, 1L, 2L), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(ivf1 === ivf2) // fixed-seed KMeans → reproducible
    assert(ivf1.size === 30)
    // recall vs exact brute force: probing 4/16 cells must still find a
    // meaningful share of the true neighbours
    val exact = VectorOps.cosineTopK(embs, Seq(0L, 1L, 2L), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = ivf1.map { case (q, v, _) => (q, v) }.count(exact.contains)
    assert(hits >= 6, s"IVF recall too low: $hits/30")
  }

  test("lsh bucket histogram partitions the corpus") {
    val total = VectorOps.lshBuckets(embs).agg(sum("n")).head().getLong(0)
    assert(total === embs.count())
  }
}
