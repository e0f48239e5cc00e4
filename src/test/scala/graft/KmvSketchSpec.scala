package graft

import org.apache.spark.sql.functions._
import graft.operators.SketchOps

/** KMV sketch contract: set semantics (duplicates can't inflate),
  * merge/partition independence, exact-below-saturation, the
  * saturated estimator's error bound, and the sketch-space overlap
  * identities against exact set arithmetic. The gates themselves are
  * hash-checked end-to-end by the DuckDB replay (the estimator is
  * deterministic given md5) — these specs pin the ALGEBRA the replay
  * can't see: that the result is independent of row order,
  * partitioning and merge tree.
  */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketchRows(df: org.apache.spark.sql.DataFrame, k: Int) =
    SketchOps.kmvSketch(df, Seq("g"), col("v"), k)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList)
      .toMap

  test("duplicates occupy no slot: sketch of multiset == sketch of its distinct set") {
    val base = (1 to 200).map(i => ("a", s"val$i"))
    val dup = base ++ base ++ base.take(50)
    val s1 = sketchRows(dup.toDF("g", "v"), 32)
    val s2 = sketchRows(base.toDF("g", "v"), 32)
    assert(s1 === s2)
    assert(s1("a").size === 32)
    assert(s1("a") === s1("a").sorted)
    assert(s1("a").distinct.size === 32)
  }

  test("partition/merge-tree independence: repartitioned input yields the identical sketch") {
    val df = (1 to 500).map(i => (s"g${i % 3}", s"tok$i")).toDF("g", "v")
    assert(sketchRows(df.repartition(7), 64) ===
      sketchRows(df.coalesce(1), 64))
  }

  test("below saturation the sketch IS the distinct set and est is exact") {
    val df = (1 to 40).map(i => ("a", s"x$i")).toDF("g", "v")
    val row = SketchOps.kmvDistinct(df, Seq("g"), col("v"), 64)
      .collect().head
    assert(row.getAs[Long]("n_kept") === 40L)
    assert(row.getAs[Long]("exact_cnt") === 40L)
    assert(row.getAs[Long]("est") === 40L)
    assert(row.getAs[Long]("err_ppm") === 0L)
  }

  test("saturated estimator lands inside the KMV error bound") {
    // rse ≈ 1/sqrt(k−2); assert 5·rse — a regression that breaks the
    // order statistics or the fixed-point arithmetic misses by far more
    val n = 5000
    val k = 256
    val df = (1 to n).map(i => ("a", s"token-$i")).toDF("g", "v")
    val row = SketchOps.kmvDistinct(df, Seq("g"), col("v"), k)
      .collect().head
    val est = row.getAs[Long]("est")
    val bound = 5.0 * n / math.sqrt(k - 2)
    assert(math.abs(est - n) <= bound,
      s"est $est vs exact $n exceeds 5·rse bound $bound")
  }

  test("overlap identities: theta-window intersection tracks exact Jaccard") {
    // A = 1..3000, B = 2001..5000 → |A∩B| = 1000, |A∪B| = 5000,
    // exact Jaccard = 0.2
    val k = 256
    val rows = ("a" -> (1 to 3000)) :: ("b" -> (2001 to 5000)) :: Nil
    val df = rows.flatMap { case (g, r) => r.map(i => (g, s"w$i")) }
      .toDF("g", "v")
    val sk = SketchOps.kmvSketch(df, Seq("g"), col("v"), k)
    assert(sk.columns.contains("sk_k"), "sketch must carry its build k")
    val o = SketchOps.kmvOverlap(sk, "g").collect().head
    assert(o.getAs[String]("src_a") === "a")
    assert(o.getAs[String]("src_b") === "b")
    assert(o.getAs[Long]("n_union") === k.toLong)
    val jac = o.getAs[Long]("jaccard_ppm").toDouble / 1e6
    // Jaccard in the union k-sample is hypergeometric: sd ≈
    // sqrt(p(1−p)/k) ≈ 0.025 at p = 0.2, k = 256; assert 5 sd
    assert(math.abs(jac - 0.2) <= 5 * math.sqrt(0.2 * 0.8 / k),
      s"jaccard_ppm ${o.getAs[Long]("jaccard_ppm")} too far from 200000")
    val union = o.getAs[Long]("union_est").toDouble
    assert(math.abs(union - 5000) <= 5.0 * 5000 / math.sqrt(k - 2))
    val inter = o.getAs[Long]("inter_est").toDouble
    // inter_est compounds the union estimate and the Jaccard sample
    assert(inter > 0 && math.abs(inter - 1000) <= 1000 * 0.5,
      s"inter_est $inter too far from 1000")
  }

  test("rollup algebra: merging fine-grained sketches equals sketching the coarse grain directly") {
    val df = (1 to 900).map(i =>
      (s"lang${i % 2}", s"src${i % 5}", s"tok${i % 300}"))
      .toDF("lang", "source", "v")
    val lvl1 = SketchOps.kmvSketch(df, Seq("lang", "source"), col("v"), 32)
    val rolled = SketchOps.kmvMerge(
      lvl1.select(col("lang"), explode_outer(col("kmins")).as("h")),
      Seq("lang"), col("h"), 32)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList)
      .toMap
    val direct = SketchOps.kmvSketch(df, Seq("lang"), col("v"), 32)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList)
      .toMap
    assert(rolled === direct,
      "k-min-of-k-mins must equal k-min-of-union")
  }

  test("overlap rejects a mixed-k sketch frame loudly") {
    val df = (1 to 100).map(i => ("a", s"x$i")).toDF("g", "v")
    val mixed = SketchOps.kmvSketch(df, Seq("g"), col("v"), 16)
      .union(SketchOps.kmvSketch(
        df.withColumn("g", lit("b")), Seq("g"), col("v"), 32))
    val e = intercept[IllegalArgumentException] {
      SketchOps.kmvOverlap(mixed, "g")
    }
    assert(e.getMessage.contains("16,32"))
  }

  test("all-NULL-key group stays total: empty sketch, zero estimate, no ANSI division error") {
    val df = Seq(("a", Option("x1")), ("a", Some("x2")), ("b", None),
      ("b", None)).toDF("g", "v")
    val rows = SketchOps.kmvDistinct(df, Seq("g"), col("v"), 8)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("exact_cnt"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("est"), r.getAs[Long]("err_ppm"))).toMap
    assert(rows("a") === ((2L, 2L, 2L, 0L)))
    assert(rows("b") === ((0L, 0L, 0L, 0L)))
  }

  test("gates run at sf0.001 with the documented shapes") {
    val d = graft.queries.ExtQueries.sketchKmvDistinct(spark, sf).collect()
    assert(d.nonEmpty)
    d.foreach { r =>
      val (ex, kept, est) = (r.getAs[Long]("exact_shingles"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("est"))
      assert(kept <= 64)
      assert(kept === math.min(ex, 64L))
      if (ex < 64) assert(est === ex)
    }
    val o = graft.queries.ExtQueries.sketchKmvOverlap(spark, sf).collect()
    val srcs = d.map(_.getAs[String]("source")).sorted
    assert(o.length === srcs.length * (srcs.length - 1) / 2,
      "one row per unordered source pair")
    o.foreach { r =>
      assert(r.getAs[String]("src_a") < r.getAs[String]("src_b"))
      assert(r.getAs[Long]("n_inter") <= r.getAs[Long]("n_union"))
      assert(r.getAs[Long]("ex_inter") <=
        math.min(r.getAs[Long]("ex_a"), r.getAs[Long]("ex_b")))
    }
  }
}
