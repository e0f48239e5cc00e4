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
