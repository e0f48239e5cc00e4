package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives for dedup post-processing. Candidate
  * near-dup PAIRS (MinHash/SimHash banding) are only half the dedup
  * story: a training pipeline needs the transitive closure — duplicate
  * CLUSTERS — so it can keep one canonical document per group and drop
  * the rest. (The reference engine has no graph surface; this is part
  * of the [EXT] large-corpus layer, SURVEY §7.)
  */
object GraphOps {

  /** Connected components over an undirected edge list `(a, b)` by
    * iterative min-label propagation: every vertex starts labelled with
    * its own id; each round it takes the min of its label and its
    * neighbours' labels; at fixpoint the label is the component's
    * smallest vertex id.
    *
    * Scale shape: each round is one equi-join of the (symmetrised) edge
    * list against the label table plus one groupBy-min — both
    * shuffle-partitioned on the vertex id, map-side combinable, no
    * driver-side data movement (the only collect is a one-row checksum
    * used as the convergence test; labels only ever decrease, so an
    * unchanged sum IS the fixpoint). `localCheckpoint` truncates the
    * per-round lineage so plan size stays O(1) in rounds.
    *
    * Rounds needed = graph diameter, and near-dup clusters are
    * small-diameter by construction (members all collide with a shared
    * hub). For adversarial long-path graphs the classic O(log n)
    * rewrite is large-star/small-star (Kiveris et al., "Connected
    * Components in MapReduce and Beyond"), which this propagation loop
    * would host unchanged — same join/agg currency, different edge
    * rewiring per round.
    *
    * Returns one row per vertex that appears in ≥1 edge:
    * `(doc_id, cluster_id)` with `cluster_id` = min vertex id of the
    * component. Vertices with no edges are by definition singleton
    * clusters and are left out (callers join back against the corpus
    * when they need the identity rows).
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val edges = pairs.select(col("a").cast("bigint").as("src"),
      col("b").cast("bigint").as("dst"))
    val sym = edges
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint(true)
    def checksum(df: DataFrame): Long =
      Option(df.agg(sum("label")).head.get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
    var prev = checksum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val prop = sym.join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("label"))
      val next = labels.union(prop).groupBy("id")
        .agg(min("label").as("label"))
        .localCheckpoint(true)
      val cur = checksum(next)
      labels.unpersist()
      labels = next
      converged = cur == prev
      prev = cur
      iter += 1
    }
    sym.unpersist()
    // fail loudly rather than hand back mid-propagation labels: a
    // non-converged result silently splits components, and a dedup
    // built on it KEEPS duplicates with no signal (same erroring-over-
    // wrong-answers stance as ArrayDot's length check)
    if (!converged) {
      labels.unpersist()
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds " +
          "(graph diameter exceeds maxIter); raise maxIter or pre-contract " +
          "the graph (large-star/small-star)")
    }
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }
}
