package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values / bottom-k theta) sketch operators: distinct
  * estimation and sketch-space SET OPERATIONS — union, intersection,
  * Jaccard — over corpus-scale columns (Beyer et al., SIGMOD'07; the
  * theta-sketch framing in Dasgupta et al., "Theta-Sketch Framework",
  * 2016).
  *
  * The production question this answers at 100 TB: "how much of source
  * A's vocabulary / document set is already in source B?" — the
  * overlap audit behind corpus mixing and acquisition decisions. The
  * exact answer is a distinct-shuffle plus an all-pairs join of
  * corpus-sized sets per source pair; the sketch answer is one scan
  * that partial-aggregates a ≤ k-string buffer map-side
  * ([[graft.functions.KMinAgg]] — no upstream DISTINCT needed, the
  * buffer dedups), then pure k-list arithmetic per pair. Sketches are
  * mergeable, so per-shard sketches persist at ingest and every later
  * cross-source audit costs kilobytes, the same
  * partial-first/rollup-later shape as the HLL gates
  * ([[graft.queries.ExtQueries.hllPartitioned]]).
  *
  * Unlike HLL, every statistic here is a DETERMINISTIC function of the
  * input set: the hash is md5 (identical hex in Spark and DuckDB, both
  * binary-collate ASCII), order statistics are exact, and the
  * estimates are FIXED-POINT integer arithmetic (`div` over
  * DECIMAL(38,0), the round-8 emission protocol) — so the gates
  * hash-check end-to-end against a full SQL replay, no
  * error-bound-invariant oracle needed.
  */
object SketchOps {

  /** 2^60 — the normalisation scale: a hash string's first 15 hex
    * nibbles read big-endian lie uniformly in [0, 2^60).
    */
  val Pow60 = "1152921504606846976"

  /** Per-group KMV sketch: group columns + `kmins`, the ascending array
    * of the ≤ k smallest DISTINCT md5(key) hex strings, + `sk_k`, the
    * build parameter. One scan, bounded map-side partials, ≤ k·tasks
    * strings per group through the exchange. `sk_k` travels with the
    * sketch because consumers MUST use the build k: a saturated
    * 64-sketch is indistinguishable from an exact 64-element set
    * without it, and estimating against a larger k would silently
    * treat deep saturation as exactness ([[kmvOverlap]] reads it
    * instead of taking k on trust).
    */
  def kmvSketch(df: DataFrame, group: Seq[String], key: Column,
      k: Int): DataFrame =
    kmvMerge(df, group, md5(key), k)

  /** [[kmvSketch]] over ALREADY-HASHED values — the merge half of the
    * sketch algebra: re-aggregating exploded `kmins` arrays (or any mix
    * of them with fresh batch sketches) through this yields the sketch
    * of the union of the underlying sets, because k-min-of-k-mins =
    * k-min-of-union. Set semantics make it IDEMPOTENT: merging the
    * same hashes twice is a no-op, which is what lets a crash-replayed
    * ingest batch heal to nothing ([[SketchStore.extend]]).
    */
  def kmvMerge(df: DataFrame, group: Seq[String], hash: Column,
      k: Int): DataFrame = {
    val agg = udaf(new graft.functions.KMinAgg(k))
    df.groupBy(group.map(col): _*)
      .agg(agg(hash).as("sk"))
      .select(group.map(col) ++ Seq(col("sk.rows").as("kmins"),
        lit(k).as("sk_k")): _*)
  }

  /** SQL expression: the first 15 nibbles of hash-string expression
    * `hExpr` as an exact DECIMAL(38,0), floored at `k`. The floor keeps
    * the estimate expression total AND bounded — a (cosmically
    * unlikely) kth hash below k/2^60 would otherwise overflow the
    * BIGINT quotient; flooring caps the estimate at (k−1)·2^60/k
    * < 2^60, which still reads as "at least 10^18 distinct".
    */
  private def v60Expr(hExpr: String, k: Int): String =
    s"greatest(CAST(conv(substring($hExpr, 1, 15), 16, 10)" +
      s" AS DECIMAL(38,0)), CAST($k AS DECIMAL(38,0)))"

  /** SQL expression: deterministic KMV distinct estimate over the
    * ascending sketch array column `kminsCol`. Below saturation the
    * sketch IS the distinct set (the count is exact); at saturation the
    * estimator is (k−1) / U_(k) with U_(k) the kth order statistic
    * normalised to [0,1) — here exact integer `(k−1)·2^60 div v60(kth)`
    * (relative error ≈ 1/√(k−2)). The CASE guards `element_at(_, k)`
    * so the saturated branch never evaluates on a short array (ANSI
    * mode errors on out-of-bounds element_at).
    */
  def estExpr(kminsCol: String, k: Int): String =
    s"CASE WHEN size($kminsCol) < $k THEN CAST(size($kminsCol) AS BIGINT)" +
      s" ELSE (CAST(${k - 1} AS DECIMAL(38,0)) * $Pow60)" +
      s" div ${v60Expr(s"element_at($kminsCol, $k)", k)} END"

  /** Per-group distinct estimate next to its exact audit side: `source
    * group cols, exact` (the count-distinct a 100 TB deployment would
    * DROP — it is the expensive side), `n_kept`, `est`, `err_ppm`.
    * Everything fixed-point and deterministic.
    */
  def kmvDistinct(df: DataFrame, group: Seq[String], key: Column,
      k: Int): DataFrame = {
    val sk = kmvSketch(df, group, key, k)
    val ex = df.groupBy(group.map(col): _*)
      .agg(countDistinct(key).as("exact_cnt"))
    sk.join(ex, group)
      .withColumn("n_kept", size(col("kmins")).cast("long"))
      .withColumn("est", expr(estExpr("kmins", k)))
      // greatest(_, 1): an all-NULL-key group has exact_cnt = 0 (and an
      // empty sketch, so est = 0 and the quotient is 0 anyway) — the
      // floor keeps the expression total under ANSI mode, matching
      // kmvOverlap's guarded divisions
      .withColumn("err_ppm", expr(
        "(CAST(abs(est - exact_cnt) AS DECIMAL(38,0)) * 1000000)" +
          " div greatest(exact_cnt, 1)"))
      .drop("kmins", "sk_k")
  }

  /** All-pairs sketch-space overlap between the groups of a sketch
    * frame (one row per group, as produced by [[kmvSketch]] over a
    * single group column named `group`): for each pair (a < b), the
    * union sketch (k smallest of the merged k-lists), the theta-window
    * intersection count (hashes below the union's kth value present in
    * BOTH sketches), and the derived fixed-point estimates —
    * `jaccard_ppm` = n_inter·10^6 div n_union and `inter_est` =
    * n_inter·union_est div n_union (the standard KMV identities; both
    * exact integer arithmetic).
    *
    * The pair join is a broadcast nested loop over #groups rows — the
    * sketch frame is one row per group regardless of corpus size,
    * which is the point: the corpus is touched once (by the sketch
    * build), every pairwise audit after it is k-list arithmetic.
    *
    * k is read from the sketch's own `sk_k` column (one bounded probe
    * of the tiny sketch frame), NOT taken as a parameter: estimating
    * with a k larger than the build k would treat a saturated sketch
    * as an exact set and under-estimate unboundedly; a mixed-k frame
    * has no sound overlap semantics at all. Both reject loudly.
    */
  def kmvOverlap(sk: DataFrame, group: String): DataFrame = {
    val ks = sk.select("sk_k").distinct().collect().map(_.getInt(0))
    // zero groups is its own (common) failure shape — an empty store /
    // filtered-to-nothing frame must say so, not emit the mixed-k
    // message with an empty list. There are no pairs to estimate;
    // returning an empty frame would need a k to type the estimate
    // columns, which an empty sketch frame cannot supply.
    require(ks.nonEmpty,
      "kmvOverlap: empty sketch frame (zero groups) — build sketches " +
        "with kmvSketch (or serve a non-empty store) before pairing")
    require(ks.length == 1,
      s"kmvOverlap needs one sketch k, found ${ks.sorted.mkString(",")}")
    val k = ks.head
    val a = sk.select(col(group).as("src_a"), col("kmins").as("ka"))
    val b = sk.select(col(group).as("src_b"), col("kmins").as("kb"))
    a.join(b, col("src_a") < col("src_b"))
      .withColumn("uk", expr(s"slice(array_sort(array_union(ka, kb)), 1, $k)"))
      .withColumn("n_union", size(col("uk")).cast("long"))
      .withColumn("n_inter",
        size(expr("array_intersect(uk, array_intersect(ka, kb))"))
          .cast("long"))
      .withColumn("jaccard_ppm", expr(
        "(CAST(n_inter AS DECIMAL(38,0)) * 1000000) div greatest(n_union, 1)"))
      .withColumn("union_est", expr(estExpr("uk", k)))
      .withColumn("inter_est", expr(
        "(CAST(n_inter AS DECIMAL(38,0)) * union_est) div greatest(n_union, 1)"))
      .drop("ka", "kb", "uk")
  }
}
