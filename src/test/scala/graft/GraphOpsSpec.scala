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

  /** Single-threaded reference PageRank — the identical fixed-point
    * integer recurrence over plain maps; the distributed operator must
    * agree value-for-value on any graph.
    */
  private def referencePr(edges: Seq[(String, String)], iters: Int,
      scale: Long = 1000000000000L): Map[String, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val deg = e.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    val n = nodes.size.toLong
    val base = ((scale / n) * 15L) / 100L
    var r = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val recv = e.groupBy(_._2).map { case (d, in) =>
        d -> in.map { case (s, _) => r(s) / deg(s) }.sum
      }
      r = nodes.map(v => v -> (base + 85L * recv.getOrElse(v, 0L) / 100L))
        .toMap
    }
    r
  }

  test("pageRank matches the single-threaded fixed-point reference exactly") {
    val rnd = new scala.util.Random(5)
    val edges = (0 until 400).map(_ =>
      (s"n${rnd.nextInt(40)}", s"n${rnd.nextInt(40)}"))
      .filter(p => p._1 != p._2)
    val got = GraphOps.pageRank(edges.toDF("src", "dst"), iters = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === referencePr(edges, 5),
      "distributed ranks diverged from the reference recurrence")
  }

  test("pageRank is partition-independent and handles dangling nodes") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"))
    // d is dangling (no out-edges): it receives mass but distributes
    // none — deliberately dropped, per the operator contract
    val df = edges.toDF("src", "dst")
    val one = GraphOps.pageRank(df.coalesce(1), iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val many = GraphOps.pageRank(df.repartition(7), iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(one === many)
    assert(one === referencePr(edges, 4))
    assert(one("a") > one("d"),
      "a cycle member must outrank the dangling leaf")
  }

  /** Single-threaded reference label propagation — the identical
    * synchronous integer-vote recurrence over plain maps: seeds
    * clamped, argmax by (votes desc, label asc), previous label
    * carried, unreached nodes unlabelled.
    */
  private def referenceLp(edges: Seq[(Long, Long)],
      seeds: Map[Long, Long], iters: Int): Map[Long, Long] = {
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter(p => p._1 != p._2).distinct
    val nodes = (sym.map(_._1) ++ seeds.keys).distinct
    var labels: Map[Long, Long] = seeds
    for (_ <- 1 to iters) {
      val votes = sym.filter(e => labels.contains(e._1))
        .groupBy(_._2).map { case (v, in) =>
          val cnt = in.map(e => labels(e._1)).groupBy(identity)
            .map { case (l, xs) => (l, xs.size) }
          v -> cnt.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
        }
      labels = nodes.flatMap(n =>
        seeds.get(n).orElse(votes.get(n)).orElse(labels.get(n))
          .map(n -> _)).toMap
    }
    labels
  }

  test("labelPropagate: clamped seeds, min-label tie-break, carry, " +
    "unreached nodes absent, edgeless seeds kept") {
    // path 1-2-3-4-5 seeded at both ends with different labels; node 3
    // hears both by iter 2 → tie → smaller label wins. 9 is edgeless
    // but seeded (kept); 7-8 is an unseeded island (absent).
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (7L, 8L))
    val seeds = Map(1L -> 20L, 5L -> 10L)
    val got = GraphOps.labelPropagate(edges.toDF("a", "b"),
      (seeds.toSeq :+ (9L -> 30L)).map { case (k, v) => (k, v) }
        .toDF("id", "label"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = referenceLp(edges, seeds + (9L -> 30L), 3)
    assert(got === want)
    assert(got(1L) === 20L && got(5L) === 10L, "seeds are clamped")
    assert(got(3L) === 10L, "tie at the midpoint breaks to min label")
    assert(got(9L) === 30L, "an edgeless seed keeps its label")
    assert(!got.contains(7L) && !got.contains(8L),
      "an unseeded island stays unlabelled")
  }

  test("labelPropagate rejects conflicting seed labels loudly and " +
    "leaves no persisted residue behind") {
    import spark.implicits._
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val e = intercept[IllegalArgumentException] {
      GraphOps.labelPropagate(Seq((1L, 2L)).toDF("a", "b"),
        Seq((5L, 1L), (5L, 2L), (1L, 3L)).toDF("id", "label"))
    }
    assert(e.getMessage.contains("conflicting labels"))
    assert(sc.getPersistentRDDs.keySet === before,
      "a rejected propagation must release its checkpoints")
    // identical duplicate pairs are fine (distinct dedups them)
    val ok = GraphOps.labelPropagate(Seq((1L, 2L)).toDF("a", "b"),
      Seq((1L, 3L), (1L, 3L)).toDF("id", "label"), iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok === Map(1L -> 3L, 2L -> 3L))
  }

  test("labelPropagate rejects lossy or null seed/edge casts loudly " +
    "and releases everything pinned before the rejection") {
    import spark.implicits._
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    // a double label that truncates (3.7 -> 3) must reject, not
    // propagate a label nobody assigned
    val lossy = intercept[Exception] {
      GraphOps.labelPropagate(Seq((1L, 2L)).toDF("a", "b"),
        Seq((1L, 3.7)).toDF("id", "label"), iters = 1).collect()
    }
    assert(lossy.getMessage.contains("does not cast EXACTLY"))
    // a null label would form its own vote group and, on winning,
    // silently drop the node from the result — reject instead
    val nul = intercept[Exception] {
      GraphOps.labelPropagate(Seq((1L, 2L)).toDF("a", "b"),
        Seq((1L, Option.empty[Long])).toDF("id", "label"),
        iters = 1).collect()
    }
    assert(nul.getMessage.contains("null"))
    // a null edge endpoint cannot vote either
    val nedge = intercept[Exception] {
      GraphOps.labelPropagate(
        Seq((Option.empty[Long], Option(2L))).toDF("a", "b"),
        Seq((2L, 1L)).toDF("id", "label"), iters = 1).collect()
    }
    assert(nedge.getMessage.contains("null"))
    assert(sc.getPersistentRDDs.keySet === before,
      "a rejected propagation must release everything it pinned")
    // exact-valued doubles and int-typed labels round-trip fine
    val ok = GraphOps.labelPropagate(Seq((1, 2)).toDF("a", "b"),
      Seq((1.0, 3.0)).toDF("id", "label"), iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok === Map(1L -> 3L, 2L -> 3L))
  }

  test("labelPropagate matches the single-threaded reference on a " +
    "random graph and is partition-independent") {
    val rnd = new scala.util.Random(9)
    val edges = (0 until 300).map(_ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(p => p._1 != p._2)
    val seeds = (0 until 12).map(_ =>
      rnd.nextInt(60).toLong -> (1L + rnd.nextInt(4))).toMap
    val df = edges.toDF("a", "b")
    val sdf = seeds.toSeq.toDF("id", "label")
    val one = GraphOps.labelPropagate(df.coalesce(1), sdf, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val many = GraphOps.labelPropagate(df.repartition(7), sdf, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one === many, "partitioning must not change labels")
    assert(one === referenceLp(edges, seeds, 4),
      "distributed labels diverged from the reference recurrence")
  }

  /** Single-threaded reference: brute-force triangle enumeration over
    * the canonical edge set.
    */
  private def referenceTri(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.toSet
    val nodes = es.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val counts = collection.mutable.Map[Long, Long]()
      .withDefaultValue(0L)
    for {
      Seq(a, b, c) <- nodes.combinations(3)
      if es((a, b)) && es((a, c)) && es((b, c))
      n <- Seq(a, b, c)
    } counts(n) += 1L
    nodes.map(n => n -> counts(n)).toMap
  }

  test("triangleCounts matches brute force on a mixed graph, " +
    "dedupes/canonicalises input, zero-fills triangle-free nodes") {
    import spark.implicits._
    // K4 on 1-4 (4 triangles), a pendant 5, a triangle-free path 6-7-8,
    // plus noise: duplicate edges, reversed duplicates, a self-loop
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (6L, 7L), (7L, 8L),
      (2L, 1L), (1L, 2L), (3L, 3L))
    val got = GraphOps.triangleCounts(edges.toDF("x", "y"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val want = referenceTri(edges)
    assert(got.view.mapValues(_._2).toMap === want)
    assert(got(1L)._1 === 3L, "degree counts canonical edges only")
    assert(got(5L) === ((1L, 0L)), "pendant: degree 1, zero triangles")
    assert(got(7L) === ((2L, 0L)), "path centre: triangle-free")
  }

  test("triangleCounts is partition-independent and finds each " +
    "triangle exactly once on a skew-star graph") {
    import spark.implicits._
    // hot hub 0 linked to 1..30, and a single rim edge (1,2): exactly
    // one triangle {0,1,2} — the degree orientation must not explode
    // the hub and must count the triangle once at each corner
    val edges = (1L to 30L).map(i => (0L, i)) :+ ((1L, 2L))
    val df = edges.toDF("x", "y")
    val one = GraphOps.triangleCounts(df).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val many = GraphOps.triangleCounts(df.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(one === many)
    assert(one(0L) === 1L && one(1L) === 1L && one(2L) === 1L)
    assert((3L to 30L).forall(one(_) === 0L))
  }

  test("triangleSummary: top-N order, attached total, and no " +
    "persisted-RDD residue") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L))
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val rows = GraphOps.triangleSummary(edges.toDF("x", "y"), topN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(sc.getPersistentRDDs.keySet === before,
      "summary must release its checkpoint")
    // triangles: {1,2,3} and {2,3,4} → nodes 2,3 have 2 each; total 2
    assert(rows.toSeq === Seq((2L, 2L, 2L), (3L, 2L, 2L), (1L, 1L, 2L)))
  }

  test("triangleTotal ≡ per-node path's total (summary-only variant " +
    "skips the explode, not the answer)") {
    import spark.implicits._
    // mixed shapes: K4 (4 triangles), a shared-edge pair of triangles,
    // a pendant, a triangle-free path, plus dirty input (dupes,
    // reversals, self-loop) — the canonicalisation is shared code but
    // the equivalence must hold on exactly the input a caller hands in
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L), (11L, 13L),
      (12L, 13L), (4L, 5L), (6L, 7L), (2L, 1L), (3L, 3L))
    val df = edges.toDF("x", "y")
    val full = GraphOps.triangleCounts(df)
      .agg(expr("sum(triangles) div 3")).head.getLong(0)
    val direct = GraphOps.triangleTotal(df).head.getLong(0)
    assert(direct === full)
    assert(direct === 6L) // 4 (K4) + 2 (shared-edge pair)
    // empty graph: one row, zero — count() over no wedges, not no rows
    val empty = GraphOps.triangleTotal(
      Seq.empty[(Long, Long)].toDF("x", "y"))
    assert(empty.head.getLong(0) === 0L)
  }

  test("kCore: triangle+chain hand case, synchronous wave semantics, " +
    "fixpoint ≡ peel at depth, k past the graph -> empty") {
    // triangle {1,2,3} + pendant chain 3-4-5: the 2-core is the
    // triangle, reached in exactly TWO synchronous waves (5 falls
    // first, 4 only after — sequential peeling would take them
    // together; round 1 keeping node 4 pins the synchronous contract)
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wave1 = asMap(GraphOps.kCorePeel(g, k = 2, rounds = 1))
    assert(wave1 === Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 1L))
    val wave2 = asMap(GraphOps.kCorePeel(g, k = 2, rounds = 2))
    assert(wave2 === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(asMap(GraphOps.kCore(g, k = 2)) === wave2)
    // self-loops and duplicate/reversed edges canonicalise away
    val messy = Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L)).toDF("a", "b")
    assert(asMap(GraphOps.kCore(messy, k = 1)) === Map(1L -> 1L, 2L -> 1L))
    // k above every degree: fixpoint converges to the empty core
    assert(GraphOps.kCore(g, k = 10).count() === 0L)
    intercept[IllegalArgumentException](GraphOps.kCore(g, k = 0))
  }

  test("kCore fixpoint ≡ kCorePeel at depth on a hashed random graph, " +
    "partition-independent") {
    // pseudo-random sparse graph: 300 nodes, ~900 hashed edges
    val e = spark.range(900).select(
      (col("id") * 7919 % 300).as("a"), (col("id") * 104729 % 300).as("b"))
    val fix = GraphOps.kCore(e, k = 4).orderBy("id").collect().toSeq
    val peeled = GraphOps.kCorePeel(e, k = 4, rounds = 20)
      .orderBy("id").collect().toSeq
    assert(fix === peeled)
    val repart = GraphOps.kCore(e.repartition(7), k = 4)
      .orderBy("id").collect().toSeq
    assert(fix === repart)
    // every surviving node meets the core contract
    assert(fix.forall(_.getLong(1) >= 4L))
  }

  test("celebrity node contributes zero oriented wedges: the closure " +
      "join tracks the oriented bound, never degree^2 (VERDICT r9 #6)") {
    import spark.implicits._
    val d = 1000
    // hub 0 with degree d, plus a ring over the spokes (degree ~3 each)
    val hub = (1 to d).map(i => (0L, i.toLong))
    val ring = (1 until d).map(i => (i.toLong, (i + 1).toLong))
    val edges = (hub ++ ring).toDF("a", "b")
    val (oriented, naive) = graft.operators.GraphOps.wedgeCounts(edges)
    val e = hub.size + ring.size
    // skew-blind bound carries the hub's C(d, 2)...
    assert(naive >= d.toLong * (d - 1) / 2, s"naive=$naive")
    // ...the orientation deletes it: every hub edge points INTO the
    // hub (max degree), so oriented wedges are the ring's O(E)
    assert(oriented <= 4L * e,
      s"oriented=$oriented should be O(E)=$e, not ~${naive}")
    // and the counts stay correct: hub+ring closes exactly the
    // (i, i+1, 0) fans' triangles — one per ring edge
    val total = graft.operators.GraphOps.triangleTotal(edges)
      .head.getLong(0)
    assert(total === (d - 1).toLong, s"total=$total")
  }
}
