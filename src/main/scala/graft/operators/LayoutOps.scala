package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout for multi-column data skipping.
  *
  * The 100 TB problem this solves: a corpus written sorted by ONE
  * column prunes scans on that column only — a predicate on any other
  * column reads every file. Interleaving the bits of several columns'
  * grid coordinates into one sort key gives every interleaved column
  * locality in the SAME layout, so per-file min/max ranges (or a
  * partition grid, as here) prune multi-dimensional box queries to
  * ~the files that actually intersect the box. This is the layout
  * trick behind Delta/Iceberg `ZORDER BY` clustering, re-expressed as
  * plain deterministic Spark arithmetic.
  *
  * Design choices, all in service of determinism at scale:
  *
  *  - **Exact integer grid.** Each dimension is bucketed with
  *    fixed-width integer division (`(x - min) div w`, with
  *    `w = (range div 2^bits) + 1`), never floating-point scaling —
  *    the same row lands in the same cell on any engine, which is what
  *    makes the layout auditable (the DuckDB oracle replays the whole
  *    key). Dimension min/max come from a one-row aggregate broadcast
  *    back onto the plan (no driver collect, no global window).
  *  - **Static cell grid, not sampled ranges.** File assignment is the
  *    zkey's high bits (`zcell`), a fixed 2^cellBits z-region grid —
  *    unlike `repartitionByRange`'s sampled bounds it is deterministic
  *    across runs and engines, and a reader can enumerate exactly
  *    which cells intersect a query box without any metadata read
  *    ([[cellsForBox]]). Cell occupancy tracks the data distribution
  *    (dense regions put many rows in a cell); the companion
  *    per-cell-stats audit ([[cellStats]]) is the rebalance dial.
  *  - **No shuffle in the key itself.** Key computation is pure
  *    per-row arithmetic under whole-stage codegen; the only exchange
  *    a layout write needs is the final repartition by cell.
  *
  * Scale: key arithmetic is O(rows) map-side; the min/max aggregate is
  * the standard partial-agg reduction; [[write]] shuffles once on the
  * cell id. `cellsForBox` enumerates at most 2^cellBits cells on the
  * driver — cellBits is a file-count dial (e.g. 10 → ≤1024 cells), not
  * a per-row cost.
  */
object LayoutOps {

  /** Per-dimension grid coordinates + interleaved z-key.
    *
    * @param df    input; every `cols` column must be integral (cast
    *              timestamps with `unix_micros` first)
    * @param cols  dimensions to interleave, in bit-significance order
    * @param bits  grid resolution per dimension (2^bits cells per dim)
    * @return df plus `zb_<col>` (grid coordinate per dim) and `zkey`
    */
  def zorderKey(df: DataFrame, cols: Seq[String], bits: Int = 8): DataFrame = {
    require(cols.nonEmpty, "zorderKey needs at least one column")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits=$bits over ${cols.size} dims overflows a signed 64-bit zkey")
    val aggs = cols.flatMap { c =>
      Seq(min(col(c).cast("long")).as(s"__min_$c"),
        max(col(c).cast("long")).as(s"__max_$c"))
    }
    val bounds = df.agg(aggs.head, aggs.tail: _*)
    val withBuckets = cols.foldLeft(df.crossJoin(broadcast(bounds))) {
      (acc, c) =>
        // w = (range div 2^bits) + 1 keeps every bucket in
        // [0, 2^bits - 1] with small-number integer arithmetic for any
        // range that FITS in int64. A range wider than Long.MaxValue
        // (full-range hash keys) wraps `max - min` negative — that
        // must fail loudly, not hand out wrong cells: the guard costs
        // one folded comparison against the broadcast bounds.
        acc.withColumn(s"zb_$c",
          expr(s"if((__max_$c - __min_$c) < 0, " +
            s"cast(raise_error('zorderKey: range of $c exceeds " +
            s"Long.MaxValue — rescale the dimension first') as long), " +
            s"if($c is null, " +
            s"cast(raise_error('zorderKey: null in dimension $c — a " +
            s"layout dimension must be non-null') as long), " +
            s"(cast($c as long) - __min_$c) div " +
            s"(((__max_$c - __min_$c) div ${1L << bits}) + 1)))"))
    }
    withBuckets
      .withColumn("zkey", interleave(cols, bits))
      .drop(cols.flatMap(c => Seq(s"__min_$c", s"__max_$c")): _*)
  }

  /** Per-dimension grid coordinates + Hilbert key — the same
    * bucketing as [[zorderKey]] with the Morton interleave swapped
    * for the Hilbert transform: strict locality (consecutive keys are
    * always grid-adjacent, so a query box decomposes into fewer,
    * longer key runs → fewer file seeks at equal resolution), losing
    * Morton's prefix-is-quadrant property ([[cellsForBox]]'s
    * enumerator stays z-order's; Hilbert cells are audited through
    * [[cellStats]] occupancy like any layout — pass
    * `cellCol = "hcell"`).
    *
    * Two dims ride the classic rotate-and-accumulate
    * ([[graft.functions.HilbertIndex]]); three or more ride the
    * Butz/Skilling transform ([[graft.functions.HilbertIndexN]]) —
    * e.g. a (time × lang × quality) layout key. The curves are
    * distinct per arity by construction (Skilling's n = 2
    * orientation differs from the classic xy2d; routing n = 2 to the
    * classic kernel keeps every existing 2-D layout stable).
    *
    * @return df plus `zb_<col>` grid coordinates and `hkey`
    */
  def hilbertKey(df: DataFrame, cols: Seq[String],
      bits: Int = 8): DataFrame = {
    require(cols.size >= 2,
      s"hilbertKey needs at least 2 dims (got ${cols.size})")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits=$bits over ${cols.size} dims overflows a signed " +
        "64-bit hkey")
    zorderKey(df, cols, bits).drop("zkey")
      .withColumn("hkey", hilbertKeyExpr(cols, bits))
  }

  /** The ONE hilbert key expression over already-computed `zb_<col>`
    * grid coordinates — n = 2 rides the classic xy2d kernel, n ≥ 3
    * the Butz/Skilling one. Shared by [[hilbertKey]] and the
    * persisted store's [[encodeWithBounds]] so the one-shot layout
    * and the frozen-bounds store can never key differently.
    */
  private def hilbertKeyExpr(cols: Seq[String], bits: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge._
    if (cols.size == 2)
      column(graft.functions.HilbertIndex(
        expression(col(s"zb_${cols(0)}")),
        expression(col(s"zb_${cols(1)}")), bits))
    else
      column(graft.functions.HilbertIndexN(
        expression(array(cols.map(c => col(s"zb_$c")): _*)),
        cols.size, bits))
  }

  /** [[hilbertKey]] plus the file-grid cell id: the hkey's top
    * `cellBits` bits. Along the Hilbert curve a cell is one CONTIGUOUS
    * connected run of the grid walk — the locality property that makes
    * equal-population cells geometrically compact.
    *
    * Naming: this EXPLORATORY api emits curve-specific `hkey`/`hcell`
    * (deliberately — both curves are often computed side by side on
    * one frame to compare layouts, which generic names would
    * collide); the PERSISTED store path ([[encodeWithBounds]] with
    * `curve`) emits generic `zkey`/`zcell` so the store machinery
    * stays curve-blind. [[cellStats]] serves both via `cellCol`.
    */
  def hilbertLayout(df: DataFrame, cols: Seq[String], bits: Int = 8,
      cellBits: Int = 8): DataFrame = {
    val keyBits = bits * cols.size
    require(cellBits >= 1 && cellBits <= keyBits,
      s"cellBits=$cellBits must be in [1, $keyBits]")
    hilbertKey(df, cols, bits)
      .withColumn("hcell", shiftright(col("hkey"), keyBits - cellBits))
  }

  /** Loud guard for the one range the exact-integer grid cannot
    * express: `max - min` wider than Long.MaxValue (full-range hash
    * keys) wraps negative and every downstream width/bucket is
    * garbage. Driver-side twin of [[zorderKey]]'s in-plan raise_error.
    */
  private def requireRangesFit(cols: Seq[String], mins: Seq[Long],
                               maxs: Seq[Long]): Unit =
    cols.indices.foreach { i =>
      require(maxs(i) - mins(i) >= 0,
        s"range of ${cols(i)} (${mins(i)}..${maxs(i)}) exceeds " +
          "Long.MaxValue — rescale the dimension first")
    }

  /** The Morton interleave over already-computed `zb_<col>` grid
    * coordinates — bit b of dimension i lands at key position
    * b·n + i. Pure shift/and arithmetic, whole-stage codegen.
    */
  private def interleave(cols: Seq[String], bits: Int): Column = {
    val n = cols.size
    (0 until bits).flatMap { b =>
      cols.zipWithIndex.map { case (c, i) =>
        shiftleft(shiftright(col(s"zb_$c"), b).bitwiseAND(lit(1L)),
          b * n + i)
      }
    }.reduce(_ + _)
  }

  /** Grid + key + cell under EXPLICIT (frozen) bounds — the encode an
    * incremental layout store runs so that every batch lands on the
    * grid the layout was built with ([[LayoutStore.append]]'s analogue
    * of [[VectorOps.encodeIntoModel]]'s frozen trained state).
    * Out-of-range values clamp into the boundary buckets — the rows
    * stay reachable because [[cellsForBox]]'s `clamp` mode maps
    * out-of-range query edges onto the same boundary cells; persistent
    * drift shows up in [[cellStats]] edge-cell occupancy and means
    * "rebuild with fresh bounds", exactly the IVF imbalance-factor
    * posture.
    */
  private[operators] def encodeWithBounds(df: DataFrame, cols: Seq[String],
      mins: Seq[Long], maxs: Seq[Long], bits: Int,
      cellBits: Int, curve: String = "z"): DataFrame = {
    require(cols.nonEmpty && mins.size == cols.size && maxs.size == cols.size)
    require(curve == "z" || curve == "hilbert",
      s"unknown layout curve '$curve' — \"z\" or \"hilbert\"")
    // both curves key n·bits wide, so ONE width expression serves all
    val keyBits = bits * cols.size
    require(cellBits >= 1 && cellBits <= keyBits)
    requireRangesFit(cols, mins, maxs)
    val withB = cols.zipWithIndex.foldLeft(df) { case (acc, (c, i)) =>
      val w = ((maxs(i) - mins(i)) >> bits) + 1
      // null dims must fail loudly: a null coordinate would put the
      // row in the null partition, unreachable by any cell enumeration
      acc.withColumn(s"zb_$c",
        expr(s"if($c is null, cast(raise_error('LayoutStore: null in " +
          s"dimension $c — a layout dimension must be non-null') as long), " +
          s"(least(greatest(cast($c as long), ${mins(i)}L), " +
          s"${maxs(i)}L) - ${mins(i)}L) div ${w}L)"))
    }
    // curve-generic column names (zkey/zcell): the store machinery —
    // sidecar, compaction, partition pruning — is curve-blind; only
    // the key expression and the box enumerator differ
    val key =
      if (curve == "z") interleave(cols, bits)
      else hilbertKeyExpr(cols, bits)
    withB
      .withColumn("zkey", key)
      .withColumn("zcell", shiftright(col("zkey"), keyBits - cellBits))
  }

  /** [[zorderKey]] plus the file-grid cell id: the zkey's top
    * `cellBits` bits (a fixed 2^cellBits z-region grid). Deterministic
    * file assignment — the property `repartitionByRange`'s sampled
    * bounds can't give — at the price of distribution-dependent cell
    * occupancy (audit with [[cellStats]]).
    */
  def zorderLayout(df: DataFrame, cols: Seq[String], bits: Int = 8,
                   cellBits: Int = 8): DataFrame = {
    val keyBits = bits * cols.size
    require(cellBits >= 1 && cellBits <= keyBits,
      s"cellBits=$cellBits must be in [1, $keyBits]")
    zorderKey(df, cols, bits)
      .withColumn("zcell", shiftright(col("zkey"), keyBits - cellBits))
  }

  /** Per-cell occupancy + per-dimension min/max — the audit a reader's
    * pruning decisions come from and the dial for choosing `cellBits`
    * (target: cells ≈ files of `maxPartitionBytes`). One partial-agg
    * shuffle on the cell id.
    */
  def cellStats(layout: DataFrame, cols: Seq[String],
      cellCol: String = "zcell"): DataFrame = {
    val aggs = count(lit(1)).as("cnt") +:
      cols.flatMap { c =>
        Seq(min(col(c).cast("long")).as(s"min_$c"),
          max(col(c).cast("long")).as(s"max_$c"))
      }
    // cellCol dials the audit onto either curve's grid: "zcell"
    // ([[zorderLayout]]) or "hcell" ([[hilbertLayout]])
    layout.groupBy(cellCol).agg(aggs.head, aggs.tail: _*)
  }

  /** Driver-side enumeration of the z-cells that intersect an
    * inclusive box, given the SAME dimension bounds and bit widths the
    * layout was built with.
    *
    * Implementation: z-interval decomposition — a pruned descent of
    * the binary trie over the cell id's prefix bits (the BIGMIN/LITMAX
    * family's recursive form: Tropf & Herzog, "Multidimensional Range
    * Search in Dynamically Balanced Trees", 1981). A trie node at
    * depth d covers the 2^(cellBits−d) cells sharing a d-bit prefix;
    * its per-dimension coordinate span is the de-interleave of that
    * prefix (fixed high bits, free low bits), and a node whose span
    * misses the box prunes its whole subtree. Work is
    * O(result · cellBits) node visits instead of the full 2^cellBits
    * grid scan — the difference between a 256-iteration loop and a
    * million-iteration one per query once `cellBits` grows to the
    * 16–20 a 100 TB layout wants for useful pruning.
    *
    * @param mins/maxs  the global per-dimension bounds of the layout
    * @param box        inclusive (lo, hi) per dimension
    * @param clamp      when the layout was built with FROZEN bounds and
    *                   later appends clamp out-of-range rows into the
    *                   edge buckets ([[LayoutStore.append]]), a box
    *                   beyond the bounds must map to those edge buckets
    *                   rather than to "no cells" — otherwise clamped
    *                   rows would be unreachable. `false` keeps the
    *                   exact-bounds semantics (disjoint box → empty).
    * @return cell ids whose z-region intersects the box, ascending
    */
  def cellsForBox(mins: Seq[Long], maxs: Seq[Long], box: Seq[(Long, Long)],
                  bits: Int = 8, cellBits: Int = 8,
                  clamp: Boolean = false): Seq[Long] =
    boxGrid(mins, maxs, box, bits, clamp) match {
      case None => Seq.empty
      case Some((lo, hi)) =>
        val n = mins.size
        val keyBits = bits * n
        val out = Seq.newBuilder[Long]
        // node (depth d, prefix p): zkey bit positions ≥ keyBits − d
        // are fixed to p's bits; positions below run free
        def covers(prefix: Long, depth: Int): Boolean =
          mins.indices.forall { i =>
            var cLo = 0L; var cHi = 0L
            var b = 0
            while (b < bits) {
              val pos = b * n + i
              if (pos >= keyBits - depth) {
                val bit = (prefix >> (pos - (keyBits - depth))) & 1L
                cLo |= bit << b; cHi |= bit << b
              } else cHi |= 1L << b
              b += 1
            }
            cHi >= lo(i) && cLo <= hi(i)
          }
        def descend(prefix: Long, depth: Int): Unit =
          if (covers(prefix, depth)) {
            if (depth == cellBits) out += prefix
            else {
              descend(prefix << 1, depth + 1)
              descend((prefix << 1) | 1L, depth + 1)
            }
          }
        descend(0L, 0)
        out.result()
    }

  /** The box's grid-coordinate range per dimension (clamped into the
    * grid; with clamp=true an out-of-range edge collapses onto the
    * boundary bucket, where append's clamped rows live). None = the
    * box is disjoint from exact bounds.
    */
  private def boxGrid(mins: Seq[Long], maxs: Seq[Long],
      box: Seq[(Long, Long)], bits: Int,
      clamp: Boolean): Option[(Seq[Long], Seq[Long])] = {
    val n = mins.size
    require(maxs.size == n && box.size == n)
    requireRangesFit(mins.indices.map(i => s"dim$i"), mins, maxs)
    val widths = mins.indices.map(i => ((maxs(i) - mins(i)) >> bits) + 1)
    if (!clamp &&
        box.indices.exists(i => box(i)._2 < mins(i) || box(i)._1 > maxs(i)))
      None
    else Some((
      box.indices.map(i =>
        ((box(i)._1.max(mins(i)).min(maxs(i)) - mins(i)) / widths(i)).max(0L)),
      box.indices.map(i =>
        ((box(i)._2.min(maxs(i)).max(mins(i)) - mins(i)) / widths(i))
          .min((1L << bits) - 1))))
  }

  /** The pre-decomposition enumerator — a full 2^cellBits scan testing
    * every cell against the box. Retained as the independent reference
    * the property spec checks [[cellsForBox]]'s trie descent against;
    * not for production use at large cellBits.
    */
  private[graft] def cellsForBoxBrute(mins: Seq[Long], maxs: Seq[Long],
      box: Seq[(Long, Long)], bits: Int = 8, cellBits: Int = 8,
      clamp: Boolean = false): Seq[Long] =
    boxGrid(mins, maxs, box, bits, clamp) match {
      case None => Seq.empty
      case Some((lo, hi)) =>
        val n = mins.size
        val keyBits = bits * n
        val dropped = keyBits - cellBits
        (0L until (1L << cellBits)).filter { cell =>
          val base = cell << dropped
          mins.indices.forall { i =>
            var cLo = 0L; var cHi = 0L
            (0 until bits).foreach { b =>
              val pos = b * n + i
              val bit = if (pos >= dropped) (base >> pos) & 1L else -1L
              if (bit >= 0) { cLo |= bit << b; cHi |= bit << b }
              else cHi |= 1L << b
            }
            cHi >= lo(i) && cLo <= hi(i)
          }
        }
    }

  /** Hilbert cells intersecting an inclusive box — the 2-D twin of
    * [[cellsForBox]]. `cellBits` must be EVEN: a Hilbert prefix of 2d
    * bits identifies one depth-d QUADRANT (each curve level consumes
    * exactly two bits), so an even-prefix cell is an axis-aligned
    * square whose extent is computable without rotation bookkeeping —
    * the first curve point of the prefix range
    * (`d2xy(prefix << 2(bits−d))`) lies inside the quadrant, and
    * aligning it down to the quadrant grid gives the square. An odd
    * prefix is HALF a quadrant — a shape that depends on the
    * orientation state — so it rejects loudly rather than descending
    * into rotation-tracking complexity ([[hilbertLayout]] still
    * accepts odd cellBits for stats; only the box enumerator needs the
    * square property).
    *
    * Pruned descent like the z-order trie: a quadrant disjoint from
    * the box prunes its whole subtree — O(result · depth) d2xy calls,
    * never the 2^cellBits grid scan (spec-checked against the
    * exhaustive ground truth).
    */
  def hilbertCellsForBox(mins: Seq[Long], maxs: Seq[Long],
      box: Seq[(Long, Long)], bits: Int = 8, cellBits: Int = 8,
      clamp: Boolean = false): Seq[Long] = {
    require(mins.size == 2 && maxs.size == 2 && box.size == 2,
      "hilbertCellsForBox is the 2-D curve's enumerator")
    require(cellBits >= 2 && cellBits <= 2 * bits && cellBits % 2 == 0,
      s"cellBits=$cellBits must be EVEN in [2, ${2 * bits}] — an odd " +
        "hilbert prefix is half a quadrant, not a square; use the " +
        "next even width")
    boxGrid(mins, maxs, box, bits, clamp) match {
      case None => Seq.empty
      case Some((lo, hi)) =>
        val depthMax = cellBits / 2
        val out = Seq.newBuilder[Long]
        def intersects(prefix: Long, depth: Int): Boolean = {
          val shift = bits - depth
          val (px, py) = graft.functions.HilbertIndex
            .d2xy(prefix << (2 * shift), bits)
          val x0 = (px >> shift) << shift
          val y0 = (py >> shift) << shift
          val side = 1L << shift
          x0 + side - 1 >= lo(0) && x0 <= hi(0) &&
            y0 + side - 1 >= lo(1) && y0 <= hi(1)
        }
        def descend(prefix: Long, depth: Int): Unit =
          if (intersects(prefix, depth)) {
            if (depth == depthMax) out += prefix
            else (0L until 4L).foreach(q =>
              descend((prefix << 2) | q, depth + 1))
          }
        descend(0L, 0)
        out.result()
    }
  }

  /** n-D Hilbert cells intersecting an inclusive box — the
    * Butz/Skilling twin of [[hilbertCellsForBox]]. `cellBits` must be
    * a MULTIPLE of n: each curve level consumes exactly n bits, so an
    * n·d-bit prefix identifies one depth-d ORTHANT — an axis-aligned
    * hypercube whose extent needs no rotation bookkeeping (the first
    * curve point of the prefix range lies inside it; aligning each
    * coordinate down to the orthant grid gives the cube). Same pruned
    * descent: an orthant disjoint from the box prunes its whole
    * subtree — O(result · depth) [[graft.functions.HilbertIndex
    * .indexToAxes]] calls, never the 2^cellBits grid scan
    * (spec-checked against the exhaustive ground truth at n = 3).
    */
  def hilbertCellsForBoxN(mins: Seq[Long], maxs: Seq[Long],
      box: Seq[(Long, Long)], bits: Int = 8, cellBits: Int = 8,
      clamp: Boolean = false): Seq[Long] = {
    val n = mins.size
    require(n >= 3 && maxs.size == n && box.size == n,
      s"hilbertCellsForBoxN is the n >= 3 enumerator (got $n dims) " +
        "— use hilbertCellsForBox for the 2-D curve")
    require(cellBits >= n && cellBits <= n * bits && cellBits % n == 0,
      s"cellBits=$cellBits must be a multiple of $n in " +
        s"[$n, ${n * bits}] — a non-multiple hilbert prefix is a " +
        "partial orthant, not a cube; use the next multiple")
    boxGrid(mins, maxs, box, bits, clamp) match {
      case None => Seq.empty
      case Some((lo, hi)) =>
        val depthMax = cellBits / n
        val out = Seq.newBuilder[Long]
        def intersects(prefix: Long, depth: Int): Boolean = {
          val shift = bits - depth
          val corner = graft.functions.HilbertIndex
            .indexToAxes(prefix << (n * shift), n, bits)
          val side = 1L << shift
          (0 until n).forall { i =>
            val c0 = (corner(i) >> shift) << shift
            c0 + side - 1 >= lo(i) && c0 <= hi(i)
          }
        }
        def descend(prefix: Long, depth: Int): Unit =
          if (intersects(prefix, depth)) {
            if (depth == depthMax) out += prefix
            else (0L until (1L << n)).foreach(q =>
              descend((prefix << n) | q, depth + 1))
          }
        descend(0L, 0)
        out.result()
    }
  }

  /** Physical Hilbert layout write — [[write]]'s shape on the hilbert
    * grid: one shuffle on `hcell`, rows sorted by full hkey inside
    * each cell, one directory per cell. Along the Hilbert curve every
    * cell is one CONNECTED square region, so a box reader opens fewer
    * directories than the same-resolution z-order layout on
    * boundary-crossing boxes.
    */
  def writeHilbert(df: DataFrame, path: String, cols: Seq[String],
      bits: Int = 8, cellBits: Int = 8): Unit = {
    require(cellBits % cols.size == 0,
      s"cellBits=$cellBits must be a multiple of ${cols.size} — the " +
        "box enumerators need square/cubic cells to enumerate reads")
    hilbertLayout(df, cols, bits, cellBits)
      .repartition(col("hcell"))
      .sortWithinPartitions("hcell", "hkey")
      .write.partitionBy("hcell").mode("overwrite").parquet(path)
  }

  /** Box query against a [[writeHilbert]] layout: prune to
    * intersecting cells (partition-directory pruning on `hcell`), then
    * the exact predicate — provably equal to the full-scan filter,
    * reading only the pruned directories.
    */
  def readBoxHilbert(spark: org.apache.spark.sql.SparkSession,
      path: String, cols: Seq[String], mins: Seq[Long], maxs: Seq[Long],
      box: Seq[(Long, Long)], bits: Int = 8,
      cellBits: Int = 8): DataFrame = {
    val cells =
      if (cols.size == 2)
        hilbertCellsForBox(mins, maxs, box, bits, cellBits)
      else hilbertCellsForBoxN(mins, maxs, box, bits, cellBits)
    val exact = cols.zip(box).map { case (c, (l, h)) =>
      col(c).cast("long") >= l && col(c).cast("long") <= h
    }.reduce(_ && _)
    spark.read.parquet(path)
      .filter(col("hcell").isin(cells: _*))
      .filter(exact)
  }

  /** Physical layout write: one shuffle on the cell id, rows sorted by
    * full zkey inside each cell, one directory per cell
    * (`zcell=<id>/`). A reader filtering on `zcell isin cellsForBox(…)`
    * gets directory-level partition pruning — the scan never opens
    * non-intersecting cells.
    */
  def write(df: DataFrame, path: String, cols: Seq[String], bits: Int = 8,
            cellBits: Int = 8): Unit =
    zorderLayout(df, cols, bits, cellBits)
      .repartition(col("zcell"))
      .sortWithinPartitions("zcell", "zkey")
      .write.partitionBy("zcell").mode("overwrite").parquet(path)

  /** Box query against a [[write]] layout: prune to intersecting cells
    * (partition-directory pruning on `zcell`), then apply the exact
    * predicate. Result provably equals the full-scan filter
    * (cells outside `cellsForBox` cannot contain box rows by
    * construction); the plan reads only the pruned directories.
    */
  def readBox(spark: org.apache.spark.sql.SparkSession, path: String,
              cols: Seq[String], mins: Seq[Long], maxs: Seq[Long],
              box: Seq[(Long, Long)], bits: Int = 8,
              cellBits: Int = 8): DataFrame = {
    val cells = cellsForBox(mins, maxs, box, bits, cellBits)
    val exact = cols.zip(box).map { case (c, (l, h)) =>
      col(c).cast("long") >= l && col(c).cast("long") <= h
    }.reduce(_ && _)
    spark.read.parquet(path)
      .filter(col("zcell").isin(cells: _*))
      .filter(exact)
  }
}
