package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphOps

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: chain, pair, and triangle each collapse to min id") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), // chain, diameter 3
      (10L, 11L), // isolated pair
      (20L, 21L), (21L, 22L), (20L, 22L) // triangle (cycle safety)
    ).toDF("a", "b")
    val cc = GraphOps.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connected components of an empty edge list is empty") {
    val pairs = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(GraphOps.connectedComponents(pairs).count() === 0)
  }

  test("long path converges to one component (diameter-round propagation)") {
    val n = 16
    val pairs = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    val cc = GraphOps.connectedComponents(pairs)
    assert(cc.agg(countDistinct("cluster_id")).head.getLong(0) === 1L)
    assert(cc.agg(min("cluster_id")).head.getLong(0) === 1L)
    assert(cc.count() === n.toLong)
  }

  test("star contraction matches propagation on mixed graph shapes") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L),
      (31L, 30L), (32L, 30L), (33L, 31L) // pre-star + a dangling hop
    ).toDF("a", "b")
    val prop = GraphOps.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    val star = GraphOps.connectedComponentsStar(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(star === prop)
  }

  test("star contraction solves a long path in logarithmic rounds") {
    // diameter 299: min-label propagation would need 299 join rounds
    // (beyond its default maxIter); star contraction halves tree
    // heights per round and must finish within its default 30
    val n = 300
    val pairs = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    val cc = GraphOps.connectedComponentsStar(pairs)
    assert(cc.count() === n.toLong)
    assert(cc.agg(countDistinct("cluster_id")).head.getLong(0) === 1L)
    assert(cc.filter(col("cluster_id") =!= 1L).count() === 0L)
  }

  test("star contraction of an empty edge list is empty") {
    val pairs = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(GraphOps.connectedComponentsStar(pairs).count() === 0)
  }

  test("exceeding maxIter fails loudly instead of returning split components") {
    val pairs = (1 until 10).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    // one round cannot close a diameter-9 path: wrong labels must throw,
    // not silently leave one component looking like several
    val e = intercept[IllegalStateException] {
      GraphOps.connectedComponents(pairs, maxIter = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }
}
