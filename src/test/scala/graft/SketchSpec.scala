package graft

import org.apache.spark.sql.functions._

/** Exactness bounds for the rows-only sketch queries — the
  * oracle-adjacent checks the driver gate can't run (sketch internals
  * differ across engines, so no SQL replay; the CONTRACT is bounded
  * error vs the exact computation, asserted here).
  */
class SketchSpec extends SparkSpec {

  test("partitioned HLL rollup: in-query error invariant holds, exact side independently correct") {
    val rows = graft.queries.ExtQueries.hllPartitioned(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, _, ok) =>
      assert(ok, s"HLL merged estimate outside its lgK=12 bound for $lang")
    }
    val exact = sources.Tables.documents(spark, sf)
      .groupBy("lang").agg(countDistinct("doc_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r._1 -> r._2).toMap === exact,
      "query's exact side diverged from an independent distinct count")
  }

  test("percentile sketch honours its rank-error contract in-query") {
    // the GK sketch's guarantee is on RANK, not value: the query now
    // audits the returned element's quantile position against epsilon
    // itself; the spec asserts every group's invariant held and the
    // group totals are real
    val rows = graft.queries.ExtQueries.percentileSketch(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (g, n, ok50, ok90) =>
      assert(n > 0, s"$g empty group")
      assert(ok50, s"$g p50 estimate outside the GK rank bound")
      assert(ok90, s"$g p90 estimate outside the GK rank bound")
    }
  }

  test("approx distinct: in-query error invariant holds, exact side independently correct") {
    val rows = graft.queries.ExtQueries.approxDistinct(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, _, ok) =>
      assert(ok, s"HLL++ source estimate outside its rsd=0.02 bound for $lang")
    }
    val exact = sources.Tables.documents(spark, sf)
      .groupBy("lang").agg(countDistinct("source").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r._1 -> r._2).toMap === exact,
      "query's exact side diverged from an independent distinct count")
  }

  test("frequent-tokens sketch agrees with the exact top-k counts") {
    val approx = graft.queries.ExtQueries.frequentTokens(spark, sf, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val exact = sources.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // the sketch tracks far more items than the vocabulary, so counts
    // must be exact; ORDER can differ only among equal counts
    assert(approx.map(_._2).toSeq === exact.map(_._2).toSeq)
    assert(approx.toSet === exact.toSet)
  }

  test("CMS estimate is >= exact for EVERY token and within the eps*N bound") {
    import graft.operators.TextOps
    val toks = sources.Tables.documents(spark, sf)
      .select(explode(TextOps.tokens).as("w"))
    val sketch = toks.agg(expr("count_min_sketch(w, 0.001d, 0.99d, 42)"))
      .head.getAs[Array[Byte]](0)
    val n = toks.count()
    val rows = toks.groupBy("w").agg(count(lit(1)).as("exact"))
      .select(col("w"), col("exact"),
        graft.functions.Cms.estimate(sketch, col("w")).as("est"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, exact, est) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(est >= exact, s"CMS under-counted '$w': est=$est exact=$exact " +
        "(build/probe hash mismatch)")
      assert(est <= exact + (0.001 * n).ceil.toLong,
        s"CMS over-count for '$w' beyond eps*N: est=$est exact=$exact n=$n")
    }
    // the codegen probe and the sketch library agree byte-for-byte
    val direct = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(sketch))
    rows.take(50).foreach { r =>
      assert(r.getLong(2) ===
        direct.estimateCount(r.getString(0).getBytes("UTF-8")))
    }
  }

  test("CMS sketch bytes are partition-invariant (counter merge is exact)") {
    import graft.operators.TextOps
    val d = sources.Tables.documents(spark, sf)
    def bytesOf(df: org.apache.spark.sql.DataFrame): Seq[Byte] =
      df.select(explode(TextOps.tokens).as("w"))
        .agg(expr("count_min_sketch(w, 0.001d, 0.99d, 42)"))
        .head.getAs[Array[Byte]](0).toSeq
    assert(bytesOf(d) == bytesOf(d.repartition(7)),
      "merged partials must equal the single-partition sketch")
  }
}
