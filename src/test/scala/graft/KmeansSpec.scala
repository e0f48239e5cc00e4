package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusOps, VectorOps}

/** Distributed Lloyd k-means ([[VectorOps.kmeansCentroids]] /
  * [[VectorOps.kmeans]]) and the cluster-balanced subsample
  * ([[VectorOps.clusterSample]]).
  *
  * The kernel pin uses DYADIC vectors (components on a 1∕16 grid):
  * every partial sum inside the centroid mean is exact in a double, so
  * the distributed avg is order-free and the driver-local replica must
  * match BIT-FOR-BIT — including across an adversarial repartition.
  * (On real float corpora the 6-dp re-pin absorbs the ~1e-16 ordering
  * noise instead; the gate's DuckDB replay covers that posture.)
  */
class KmeansSpec extends SparkSpec {
  import spark.implicits._

  /** 40 dyadic 4-dim vectors — three well-separated blobs plus a few
    * stragglers, all components k∕16 so sums are exact.
    */
  private def dyadic(): org.apache.spark.sql.DataFrame =
    (0L until 40L).map { i =>
      val blob = i % 3
      val base = blob * 8.0 // 0, 8, 16 — separated
      val jit = ((i * 7) % 5).toDouble / 16.0
      (i, Array(base + jit, base - jit, jit, (i % 4).toDouble / 16.0)
        .map(_.toFloat))
    }.toDF("vec_id", "embedding")

  /** Driver-local Lloyd replica with the operator's exact contract:
    * same init, same left-to-right d² folds, same tie-break, same
    * HALF_UP 6-dp re-pin, same carry-forward.
    */
  private def referenceLloyd(vs: Seq[(Long, Array[Double])], k: Int,
                             iters: Int): Array[Array[Double]] = {
    def dotL(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    var cents = vs.sortBy(_._1).take(k).map(_._2.clone()).toArray
    for (_ <- 1 to iters) {
      val assign = vs.map { case (_, v) =>
        val d2s = cents.map(c => dotL(v, v) - 2d * dotL(v, c) + dotL(c, c))
        val cell = d2s.zipWithIndex.minBy { case (d, i) => (d, i) }._2
        (cell, v)
      }
      val next = cents.map(_.clone())
      assign.groupBy(_._1).foreach { case (cell, rows) =>
        val dim = rows.head._2.length
        next(cell) = Array.tabulate(dim) { d =>
          round6(rows.map(_._2(d)).sum / rows.size)
        }
      }
      cents = next
    }
    cents
  }

  test("kmeansCentroids matches the driver-local replica bit-for-bit " +
    "on dyadic data, repartition-independent") {
    val df = dyadic()
    val vs = df.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq
    val want = referenceLloyd(vs, k = 3, iters = 3)
    val got = VectorOps.kmeansCentroids(df, k = 3, iters = 3)
    assert(got.map(_.toSeq).toSeq === want.map(_.toSeq).toSeq)
    val got7 = VectorOps.kmeansCentroids(df.repartition(7), k = 3, iters = 3)
    assert(got7.map(_.toSeq).toSeq === want.map(_.toSeq).toSeq)
  }

  test("kmeans assignment ties break to the smallest cell and cover " +
    "every corpus row exactly once") {
    val df = dyadic()
    val out = VectorOps.kmeans(df, k = 3, iters = 2).collect()
    assert(out.length === 40)
    assert(out.map(_.getLong(0)).toSet === (0L until 40L).toSet)
    // duplicate centroids => every row ties => all land in cell 0
    val c = VectorOps.kmeansCentroids(df, k = 1, iters = 0)
    val dup = VectorOps.kmeansAssign(df, Array(c(0), c(0)))
    assert(dup.filter(col("cell") =!= 0).count() === 0)
  }

  test("an emptied cell carries its previous centroid forward") {
    // identical first two vectors: cell 0 wins every tie, cell 1
    // empties in round 1 and must keep its init centroid
    val df = Seq(
      (0L, Array(1f, 0f)), (1L, Array(1f, 0f)),
      (2L, Array(5f, 0f)), (3L, Array(5.5f, 0f))
    ).toDF("vec_id", "embedding")
    val got = VectorOps.kmeansCentroids(df, k = 2, iters = 1)
    assert(got(0).toSeq === Seq((1.0 + 1.0 + 5.0 + 5.5) / 4, 0.0))
    assert(got(1).toSeq === Seq(1.0, 0.0)) // carried forward
  }

  test("Lloyd objective is non-increasing across rounds on the fixture") {
    val e = sources.Tables.embeddings(spark, sf)
    val objs = (0 to 3).map { it =>
      VectorOps.kmeansAssign(e, VectorOps.kmeansCentroids(e, 8, it))
        .agg(sum("d2")).head().getDouble(0)
    }
    objs.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-3, s"objective rose: $objs")
    }
  }

  test("assignment is a pure projection — no exchange, no window") {
    val e = sources.Tables.embeddings(spark, sf)
    val c = VectorOps.kmeansCentroids(e, k = 4, iters = 1)
    val plan = VectorOps.kmeansAssign(e, c)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("clusterSample ranks exactly as the window form and respects " +
    "the quota, through bounded TopKAgg partials — no Window in plan") {
    import org.apache.spark.sql.expressions.Window
    val e = sources.Tables.embeddings(spark, sf)
    val cents = VectorOps.kmeansCentroids(e, k = 4, iters = 2)
    val assigned = VectorOps.kmeansAssign(e, cents)
    val got = VectorOps.clusterSampleAssigned(assigned, quota = 5)
    assert(!got.queryExecution.executedPlan.toString.contains("Window"))
    val w = Window.partitionBy("cell")
      .orderBy(CorpusOps.hash32("cs1", col("vec_id")), col("vec_id"))
    val want = assigned
      .select(col("vec_id"), col("cell"),
        row_number().over(w).cast("bigint").as("rk"))
      .filter(col("rk") <= 5)
    assert(got.except(want).count() === 0 && want.except(got).count() === 0)
    val perCell = got.groupBy("cell").count().collect()
    assert(perCell.forall(_.getLong(1) <= 5))
  }

  test("clusterSample is repartition-independent on dyadic data") {
    val df = dyadic()
    val a = VectorOps.clusterSample(df, k = 3, iters = 2, quota = 4)
      .orderBy("cell", "rk").collect().toSeq
    val b = VectorOps.clusterSample(df.repartition(5), k = 3, iters = 2,
        quota = 4)
      .orderBy("cell", "rk").collect().toSeq
    assert(a === b)
  }

  test("clusterDrift: exact hand-checked TV, identical shares -> 0, " +
    "empty side rejects loudly") {
    // 1-D, two centroids at 0 and 8: shares split on v < 4
    val ref = Seq((0L, Array(0f)), (1L, Array(8f)), (2L, Array(1f)),
      (3L, Array(7f))).toDF("vec_id", "embedding") // shares (2, 2)
    val bat = Seq((10L, Array(0.5f)), (11L, Array(0.2f)),
      (12L, Array(7.5f))).toDF("vec_id", "embedding") // shares (2, 1)
    val cents = Array(Array(0.0), Array(8.0))
    val shares = VectorOps.clusterShares(ref, cents)
    val r = VectorOps.clusterDrift(bat, cents, shares).head()
    // TV = (|2*3-2*4| + |2*3-1*4|) * 1e6 / (2*4*3) = 4e6 / 24 = 166666
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((4L, 3L, 166666L)))
    val same = VectorOps.clusterDrift(ref, cents, shares).head()
    assert(same.getLong(2) === 0L)
    val e = intercept[IllegalArgumentException](
      VectorOps.clusterDrift(bat.limit(0), cents, shares).head())
    assert(e.getMessage.contains("non-empty"))
  }

  test("clusterDriftStream lands one tagged report per trigger, " +
    "equal to the direct batch drift; empty trigger -> null-drift row") {
    import graft.streaming.StreamingPipeline
    val e = sources.Tables.embeddings(spark, sf).localCheckpoint()
    val cents = VectorOps.kmeansCentroids(e, k = 4, iters = 1)
    val refPath = tmpDir("cd-ref") + "/shares"
    VectorOps.clusterShares(e, cents).write.parquet(refPath)
    val slices = Seq(e.filter(col("vec_id") < 200),
      e.filter(col("vec_id") >= 200))
    val src = tmpDir("cd-src")
    slices.foreach(_.coalesce(1).write.mode("append").parquet(src))
    e.limit(0).coalesce(1).write.mode("append").parquet(src)
    val rep = tmpDir("cd-rep") + "/report"
    StreamingPipeline.clusterDriftStream(
      spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1).parquet(src),
      cents, refPath, rep, tmpDir("cd-ckpt"))
      .awaitTermination()
    val all = spark.read.parquet(s"$rep/b_*")
    assert(all.filter(col("tv_ppm").isNull)
      .select("n_batch").collect().map(_.getLong(0)).toSeq === Seq(0L))
    val landed = all.filter(col("tv_ppm").isNotNull)
      .select("n_batch", "tv_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val direct = slices.map { s =>
      val r = VectorOps.clusterDrift(s, cents,
        spark.read.parquet(refPath)).head()
      (r.getAs[Long]("n_batch"), r.getAs[Long]("tv_ppm"))
    }.sorted
    assert(landed === direct)
  }

  test("guards: k <= 0, quota <= 0, and k > corpus size fail loudly") {
    val df = dyadic()
    intercept[IllegalArgumentException](VectorOps.kmeansCentroids(df, 0))
    intercept[IllegalArgumentException](VectorOps.clusterSample(df, quota = 0))
    intercept[IllegalArgumentException](VectorOps.kmeansCentroids(df, 99))
  }
}
