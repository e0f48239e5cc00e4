package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TopKAgg, TopKBuf}
import graft.queries.RelationalQueries

/** Typed-UDAF top-k: the bounded-heap aggregate must equal the window
  * formulation exactly (total order: score desc, id asc), stay
  * invariant under repartitioning (merge associativity), and plan as a
  * partial-then-final aggregate so only k rows per (group, task) reach
  * the exchange.
  */
class TopKAggSpec extends SparkSpec {

  import spark.implicits._

  test("unit semantics: bounded insert keeps the total order, ties break by id") {
    val agg = new TopKAgg(3)
    val rows = Seq((5.0, 10L), (7.0, 2L), (5.0, 3L), (9.0, 9L), (5.0, 1L))
    val out = rows.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(out).rows == List((9.0, 9L), (7.0, 2L), (5.0, 1L)),
      "score desc, then id asc; the late (5.0, 1L) must displace (5.0, 3L)")
    // merge from any split point gives the same buffer
    for (cut <- 0 to rows.length) {
      val (l, r) = rows.splitAt(cut)
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(merged == out, s"merge at $cut diverged: $merged vs $out")
    }
  }

  test("heap buffers (TopKStrAgg/TopKStrIdAgg): selection equals the " +
    "reference sorted-prefix at every split point, duplicates counted") {
    // the heap swap (VERDICT r11 #7) must not change WHAT is kept,
    // only how fast — pin multiset bottom-k against a full sort,
    // merge-associativity included, with duplicate (pri, id) rows
    val agg = new graft.functions.TopKStrIdAgg(4)
    val rows = Seq("c" -> "9", "a" -> "2", "b" -> "7", "a" -> "2",
      "e" -> "1", "b" -> "3", "a" -> "5", "d" -> "4", "b" -> "3")
    val want = rows.sortBy(identity).take(4).toList
    val full = rows.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(full).rows === want)
    for (cut <- 0 to rows.length) {
      val (l, r) = rows.splitAt(cut)
      val m = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(m).rows === want, s"split at $cut diverged")
    }
    // Long-id variant ties break NUMERICALLY (9 before 10), not by
    // the string form
    val aggL = new graft.functions.TopKStrAgg(2)
    val tied = Seq("x" -> 10L, "x" -> 9L, "x" -> 100L)
    assert(aggL.finish(tied.foldLeft(aggL.zero)(aggL.reduce)).rows ===
      List("x" -> 9L, "x" -> 10L))
  }

  test("order stays total on NaN and -0.0 scores") {
    // IEEE comparisons would freeze a NaN row at the buffer head and
    // let later rows insert ahead of it (unsorted buffer, order-
    // dependent results); Double.compare ranks NaN greatest, matching
    // SQL DESC in both Spark and DuckDB, and -0.0 ties 0.0 so the id
    // tiebreak (not the sign bit) decides
    val agg = new TopKAgg(2)
    val rows = Seq((1.0, 1L), (Double.NaN, 2L), (2.0, 3L))
    val want = List((Double.NaN, 2L), (2.0, 3L))
    for (perm <- rows.permutations) {
      val got = agg.finish(perm.foldLeft(agg.zero)(agg.reduce)).rows
      assert(got.map(_._2) == want.map(_._2) &&
        got.head._1.isNaN && got(1)._1 == 2.0,
        s"perm $perm: $got")
    }
    val zeros = Seq((0.0, 5L), (-0.0, 1L), (-1.0, 9L))
    val got = agg.finish(zeros.foldLeft(agg.zero)(agg.reduce)).rows
    assert(got.map(_._2) == List(1L, 5L),
      s"-0.0 must tie 0.0 and fall to the id tiebreak: $got")
  }

  test("equals the window form on orders; invariant under repartitioning") {
    val orders = sources.Tables.orders(spark, sf)
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val expect = orders
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= 3)
      .select(col("o_orderpriority"), col("rank"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy("o_orderpriority", "rank")
      .collect()
    assert(expect.nonEmpty)
    val got = RelationalQueries.topkGroupAgg(spark, sf).collect()
    assert(got.sameElements(expect), "UDAF ranking diverged from the window form")
    // the same aggregation over an adversarial repartition (single
    // partition, then many tiny ones) must not move a single row
    for (parts <- Seq(1, 64)) {
      val topk = udaf(new TopKAgg(3))
      val again = orders.repartition(parts)
        .groupBy("o_orderpriority")
        .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
        .select(col("o_orderpriority"), posexplode(col("top.rows")))
        .select(col("o_orderpriority"),
          (col("pos") + 1).cast("bigint").as("rank"),
          col("col._2").as("o_orderkey"),
          round(col("col._1"), 2).as("o_totalprice"))
        .orderBy("o_orderpriority", "rank")
        .collect()
      assert(again.sameElements(expect), s"repartition($parts) changed the result")
    }
  }

  test("plan: partial + final aggregate around one exchange, no sort of the input") {
    val plan = RelationalQueries.topkGroupAgg(spark, sf)
      .queryExecution.executedPlan.toString
    val aggNodes = "(?m)ObjectHashAggregate|SortAggregate".r
      .findAllIn(plan).length
    assert(aggNodes >= 2,
      s"expected partial+final typed aggregate nodes:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(o_orderpriority"),
      s"aggregate should shuffle on the group key only:\n$plan")
  }

  test("k bounds the buffer even mid-stream; k > group size returns all rows") {
    val agg = new TopKAgg(2)
    val big = (1L to 100L).map(i => (i.toDouble, i))
    val buf = big.foldLeft(agg.zero)(agg.reduce)
    assert(buf.rows == List((100.0, 100L), (99.0, 99L)))
    val topk = udaf(new TopKAgg(10))
    val tiny = Seq(("a", 1.0, 1L), ("a", 2.0, 2L)).toDF("g", "v", "id")
      .groupBy("g").agg(topk(col("v"), col("id")).as("top"))
      .select(size(col("top.rows")).as("n")).head.getInt(0)
    assert(tiny == 2, "k larger than the group returns the whole group ranked")
  }
}
