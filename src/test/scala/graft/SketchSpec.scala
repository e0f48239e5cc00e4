package graft

import org.apache.spark.sql.functions._

/** Exactness bounds for the rows-only sketch queries — the
  * oracle-adjacent checks the driver gate can't run (sketch internals
  * differ across engines, so no SQL replay; the CONTRACT is bounded
  * error vs the exact computation, asserted here).
  */
class SketchSpec extends SparkSpec {

  test("partitioned HLL rollup stays within 2% of exact distinct counts per lang") {
    val approx = graft.queries.ExtQueries.hllPartitioned(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = sources.Tables.documents(spark, sf)
      .groupBy("lang").agg(countDistinct("doc_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (lang, n) =>
      val relErr = math.abs(approx(lang) - n).toDouble / n
      assert(relErr <= 0.02, s"HLL union error ${"%.4f".format(relErr)} for $lang " +
        s"(approx=${approx(lang)} exact=$n)")
    }
  }

  test("percentile sketch honours its rank-error contract (±2% rank)") {
    // the GK sketch's guarantee is on RANK, not value: the returned
    // element's quantile position must sit within epsilon of the target
    // (value-distance to the interpolated exact percentile can be large
    // wherever adjacent group values are far apart)
    val approx = graft.queries.ExtQueries.percentileSketch(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val orders = sources.Tables.orders(spark, sf)
      .select("o_orderpriority", "o_totalprice")
    approx.foreach { case (g, (a50, a90)) =>
      val grp = orders.filter(col("o_orderpriority") === g)
      val total = grp.count().toDouble
      assert(total > 0)
      def rankOf(v: Double): Double =
        grp.filter(col("o_totalprice") <= v).count() / total
      assert(math.abs(rankOf(a50) - 0.5) <= 0.02, s"$g p50 rank ${rankOf(a50)}")
      assert(math.abs(rankOf(a90) - 0.9) <= 0.02, s"$g p90 rank ${rankOf(a90)}")
    }
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
}
