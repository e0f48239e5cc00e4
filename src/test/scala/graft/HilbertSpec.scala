package graft

import org.apache.spark.sql.functions._

import graft.functions.HilbertIndex
import graft.operators.LayoutOps

/** Hilbert curve: exhaustive bijection + strict-adjacency pin (the
  * locality property Morton lacks, shown by contrast), d2xy inverse
  * round-trip, Expression-vs-kernel parity through codegen and the
  * SQL surface, loud out-of-grid errors, null contract, and the
  * layout integration's cell math.
  */
class HilbertSpec extends SparkSpec {
  import spark.implicits._

  private val bits = 4
  private val side = 1 << bits

  private lazy val grid: Seq[(Long, Long)] =
    for (x <- 0L until side; y <- 0L until side) yield (x, y)

  test("xy2d is a bijection onto [0, side²) and consecutive indexes " +
    "are ALWAYS grid-adjacent — where Morton jumps") {
    val idx = grid.map { case (x, y) => HilbertIndex.xy2d(x, y, bits) }
    assert(idx.sorted == (0L until side.toLong * side).toSeq)
    val walk = grid.zip(idx).sortBy(_._2).map(_._1)
    walk.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L,
        s"hilbert jump between ($x1,$y1) and ($x2,$y2)")
    }
    // contrast: the Morton interleave (x at even bits — LayoutOps'
    // bit-significance order) breaks adjacency at every power-of-two
    // boundary
    def morton(x: Long, y: Long): Long =
      (0 until bits).map(b =>
        (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
      ).sum
    val mWalk = grid.map { case (x, y) => (morton(x, y), x, y) }.sorted
    val worst = mWalk.sliding(2).map { case Seq((_, x1, y1), (_, x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }.max
    assert(worst > 1L, "Morton unexpectedly adjacency-preserving")
  }

  test("d2xy inverts xy2d over the full grid, and at bits=8 on a " +
    "diagonal sample") {
    grid.foreach { case (x, y) =>
      assert(HilbertIndex.d2xy(HilbertIndex.xy2d(x, y, bits), bits)
        === ((x, y)))
    }
    (0L until 256L).foreach { x =>
      val d = HilbertIndex.xy2d(x, 255L - x, 8)
      assert(HilbertIndex.d2xy(d, 8) === ((x, 255L - x)))
    }
  }

  test("the Expression matches the kernel over the full grid through " +
    "the codegen path, and through the SQL surface") {
    val df = grid.toDF("x", "y")
    val got = df.selectExpr("x", "y", s"hilbert_index(x, y, $bits) AS d")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    grid.foreach { case (x, y) =>
      assert(got((x, y)) === HilbertIndex.xy2d(x, y, bits))
    }
    assert(spark.sql("SELECT hilbert_index(3L, 5L, 4)")
      .head.getLong(0) === HilbertIndex.xy2d(3L, 5L, 4))
  }

  test("out-of-grid coordinates error loudly; null in → null out; " +
    "non-bigint inputs fail analysis; bits bounds enforced") {
    val e = intercept[Exception] {
      Seq((16L, 0L)).toDF("x", "y")
        .selectExpr(s"hilbert_index(x, y, $bits)").collect()
    }
    assert(e.getMessage.contains("outside") ||
      Option(e.getCause).exists(_.getMessage.contains("outside")))
    val n = Seq((Some(1L), Option.empty[Long])).toDF("x", "y")
      .selectExpr(s"hilbert_index(x, y, $bits) AS d").head
    assert(n.isNullAt(0))
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1, 2)).toDF("x", "y")
        .selectExpr("hilbert_index(x, y, 4)").collect()
    }
    intercept[IllegalArgumentException] {
      HilbertIndex.xy2d(0L, 0L, 32)
    }
  }

  test("hilbertKey/hilbertLayout: same grid buckets as zorderKey, " +
    "hkey is the kernel of them, cells are the key's top bits; " +
    "2-D-only guard") {
    val d = (0 until 500).map(i =>
      (i.toLong, (i * 13 % 97).toLong, (i * 7 % 89).toLong))
      .toDF("id", "a", "b")
    val hk = LayoutOps.hilbertLayout(d, Seq("a", "b"), bits = 5,
      cellBits = 4).collect()
    val zk = LayoutOps.zorderKey(d, Seq("a", "b"), bits = 5)
      .select("id", "zb_a", "zb_b").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    hk.foreach { r =>
      val id = r.getAs[Long]("id")
      val (za, zb) = zk(id)
      assert((r.getAs[Long]("zb_a"), r.getAs[Long]("zb_b")) === ((za, zb)))
      assert(r.getAs[Long]("hkey") === HilbertIndex.xy2d(za, zb, 5))
      assert(r.getAs[Long]("hcell") === (r.getAs[Long]("hkey") >> 6))
    }
    intercept[IllegalArgumentException] {
      LayoutOps.hilbertKey(d, Seq("a"), bits = 5)
    }
    intercept[IllegalArgumentException] {
      LayoutOps.hilbertLayout(d, Seq("a", "b"), bits = 5, cellBits = 11)
    }
    // the cellStats audit path works on the hilbert grid via cellCol
    val stats = LayoutOps.cellStats(
      LayoutOps.hilbertLayout(d, Seq("a", "b"), bits = 5, cellBits = 4),
      Seq("a", "b"), cellCol = "hcell")
    assert(stats.columns.contains("hcell"))
    assert(stats.agg(sum("cnt")).head.getLong(0) === 500L)
  }

  test("hilbertCellsForBox equals the exhaustive grid ground truth " +
    "on every sampled box; disjoint box is empty; odd cellBits " +
    "rejects loudly") {
    // mins=(0,0), maxs=(31,31) at bits=5 → width 1: grid coords ARE
    // the values, so the ground truth enumerates every point directly
    val b5 = 5; val cb = 6
    def truth(box: Seq[(Long, Long)]): Seq[Long] =
      (for (x <- box(0)._1 to box(0)._2; y <- box(1)._1 to box(1)._2)
        yield HilbertIndex.xy2d(x, y, b5) >> (2 * b5 - cb))
        .distinct.sorted
    val boxes = Seq(
      Seq((0L, 31L), (0L, 31L)),   // whole grid
      Seq((8L, 15L), (8L, 15L)),   // quadrant-aligned
      Seq((13L, 19L), (2L, 29L)),  // center-crossing sliver
      Seq((31L, 31L), (0L, 0L)),   // single corner point
      Seq((5L, 6L), (25L, 26L)))
    boxes.foreach { box =>
      val got = LayoutOps.hilbertCellsForBox(Seq(0L, 0L),
        Seq(31L, 31L), box, bits = b5, cellBits = cb)
      assert(got === truth(box), s"box $box")
    }
    assert(LayoutOps.hilbertCellsForBox(Seq(0L, 0L), Seq(31L, 31L),
      Seq((40L, 50L), (0L, 5L)), bits = b5, cellBits = cb).isEmpty)
    intercept[IllegalArgumentException] {
      LayoutOps.hilbertCellsForBox(Seq(0L, 0L), Seq(31L, 31L),
        Seq((0L, 1L), (0L, 1L)), bits = b5, cellBits = 5)
    }
  }

  test("writeHilbert + readBoxHilbert equals the full-scan filter " +
    "and prunes directories; hilbert opens no more cells than " +
    "z-order averaged over a box sweep") {
    val pts = (0 until 2000).map(i =>
      (i.toLong, (i * 131 % 512).toLong, (i * 113 % 512).toLong))
    val df = pts.toDF("id", "x", "y")
    val dir = tmpDir("hilbert") + "/layout"
    LayoutOps.writeHilbert(df, dir, Seq("x", "y"), bits = 8,
      cellBits = 6)
    val mins = Seq(pts.map(_._2).min, pts.map(_._3).min)
    val maxs = Seq(pts.map(_._2).max, pts.map(_._3).max)
    val box = Seq((100L, 300L), (50L, 400L))
    val got = LayoutOps.readBoxHilbert(spark, dir, Seq("x", "y"),
      mins, maxs, box, bits = 8, cellBits = 6)
    val want = df.filter(col("x").between(box(0)._1, box(0)._2) &&
      col("y").between(box(1)._1, box(1)._2))
    assert(got.select("x", "y").collect().map(r =>
      (r.getLong(0), r.getLong(1))).sorted.toSeq ===
      want.collect().map(r => (r.getLong(1), r.getLong(2))).sorted.toSeq)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[.*hcell.*"),
      s"hcell filter not pushed to partition pruning:\n$plan")
    // locality: averaged over a sweep of 8×8 boxes on a 32×32 grid,
    // the hilbert decomposition opens no more cells than z-order at
    // the same (bits, cellBits) — squares beat z's split regions on
    // boundary-crossing boxes (a measured instance, not a theorem)
    val sweep = for (x0 <- 0L until 24L by 4L; y0 <- 0L until 24L by 4L)
      yield Seq((x0, x0 + 7L), (y0, y0 + 7L))
    val (hTot, zTot) = sweep.foldLeft((0, 0)) { case ((h, z), b) =>
      (h + LayoutOps.hilbertCellsForBox(Seq(0L, 0L), Seq(31L, 31L),
        b, bits = 5, cellBits = 6).size,
       z + LayoutOps.cellsForBox(Seq(0L, 0L), Seq(31L, 31L),
        b, bits = 5, cellBits = 6).size)
    }
    assert(hTot <= zTot, s"hilbert opened $hTot cells vs z-order $zTot")
  }

  test("n-D (Butz/Skilling): bijection + strict adjacency at n=3 " +
    "exhaustively, indexToAxes round-trips, shape guards") {
    val b3 = 3 // 8x8x8 = 512 cells, exhaustive
    val g3 = for (x <- 0L until 8L; y <- 0L until 8L; z <- 0L until 8L)
      yield Array(x, y, z)
    val idx = g3.map(HilbertIndex.axesToIndex(_, b3))
    assert(idx.sorted == (0L until 512L).toSeq, "not a bijection")
    // strict locality in EVERY dimension count — consecutive indexes
    // are grid-adjacent (|Δ| summed over dims = 1), the property the
    // curve exists for
    val walk = g3.zip(idx).sortBy(_._2).map(_._1)
    walk.sliding(2).foreach { case Seq(a, b) =>
      assert(a.indices.map(i => math.abs(a(i) - b(i))).sum === 1L,
        s"jump between ${a.toSeq} and ${b.toSeq}")
    }
    // exact inverse over the whole index range
    (0L until 512L).foreach { d =>
      assert(HilbertIndex.axesToIndex(
        HilbertIndex.indexToAxes(d, 3, b3), b3) === d)
    }
    // and at a bigger shape on a diagonal sample (n=4, bits=5)
    (0L until 32L).foreach { v =>
      val xs = Array(v, 31L - v, v ^ 21L, (v * 7) % 32)
      val d = HilbertIndex.axesToIndex(xs, 5)
      assert(HilbertIndex.indexToAxes(d, 4, 5).toSeq === xs.toSeq)
    }
    intercept[IllegalArgumentException] {
      HilbertIndex.axesToIndex(Array(0L, 0L), 4) // n=2 -> xy2d
    }
    intercept[IllegalArgumentException] {
      HilbertIndex.axesToIndex(Array(0L, 0L, 8L), 3) // out of grid
    }
    intercept[IllegalArgumentException] {
      HilbertIndex.axesToIndex(Array.fill(8)(0L), 8) // 64 bits
    }
  }

  test("HilbertIndexN expression ≡ the kernel through codegen and " +
    "SQL; hilbertKey routes n>=3; null/arity contracts") {
    val d3 = (0 until 400).map(i =>
      (i.toLong, (i * 13 % 61).toLong, (i * 7 % 53).toLong,
        (i * 29 % 47).toLong))
      .toDF("id", "a", "b", "c")
    val hk = LayoutOps.hilbertKey(d3, Seq("a", "b", "c"), bits = 4)
      .select("id", "zb_a", "zb_b", "zb_c", "hkey").collect()
    hk.foreach { r =>
      assert(r.getAs[Long]("hkey") === HilbertIndex.axesToIndex(
        Array(r.getAs[Long]("zb_a"), r.getAs[Long]("zb_b"),
          r.getAs[Long]("zb_c")), 4))
    }
    // SQL surface
    assert(spark.sql(
      "SELECT hilbert_index_n(array(3L, 5L, 2L), 3, 4)")
      .head.getLong(0) ===
      HilbertIndex.axesToIndex(Array(3L, 5L, 2L), 4))
    // null array -> null; null ELEMENT errors loudly; wrong arity
    // errors loudly
    assert(spark.sql(
      "SELECT hilbert_index_n(CAST(NULL AS ARRAY<BIGINT>), 3, 4)")
      .head.isNullAt(0))
    val eNull = intercept[Exception] {
      spark.sql("SELECT hilbert_index_n(array(1L, CAST(NULL AS BIGINT), 2L), 3, 4)")
        .collect()
    }
    assert(eNull.getMessage.contains("null coordinate") ||
      Option(eNull.getCause).exists(_.getMessage.contains("null coordinate")))
    val eAr = intercept[Exception] {
      spark.sql("SELECT hilbert_index_n(array(1L, 2L), 3, 4)").collect()
    }
    assert(eAr.getMessage.contains("elements") ||
      Option(eAr.getCause).exists(_.getMessage.contains("elements")))
    // hilbertLayout cell math generalises: top cellBits of the n-D key
    val hl = LayoutOps.hilbertLayout(d3, Seq("a", "b", "c"), bits = 4,
      cellBits = 6).select("hkey", "hcell").collect()
    hl.foreach(r =>
      assert(r.getLong(1) === (r.getLong(0) >> 6)))
  }

  test("hilbertCellsForBoxN equals the exhaustive grid ground truth; " +
    "disjoint box empty; non-multiple cellBits rejects") {
    val b3 = 3; val cb = 6 // 8^3 grid, 64 cells of 2x2x2
    def truth(box: Seq[(Long, Long)]): Seq[Long] =
      (for (x <- box(0)._1 to box(0)._2; y <- box(1)._1 to box(1)._2;
            z <- box(2)._1 to box(2)._2)
        yield HilbertIndex.axesToIndex(Array(x, y, z), b3)
          >> (3 * b3 - cb))
        .distinct.sorted
    val boxes = Seq(
      Seq((0L, 7L), (0L, 7L), (0L, 7L)),   // whole grid
      Seq((2L, 5L), (1L, 6L), (3L, 3L)),   // slab
      Seq((7L, 7L), (0L, 0L), (7L, 7L)),   // corner point
      Seq((3L, 4L), (3L, 4L), (3L, 4L)))   // center cube
    boxes.foreach { box =>
      val got = LayoutOps.hilbertCellsForBoxN(Seq(0L, 0L, 0L),
        Seq(7L, 7L, 7L), box, bits = b3, cellBits = cb)
      assert(got === truth(box), s"box $box")
    }
    assert(LayoutOps.hilbertCellsForBoxN(Seq(0L, 0L, 0L),
      Seq(7L, 7L, 7L), Seq((9L, 10L), (0L, 1L), (0L, 1L)),
      bits = b3, cellBits = cb).isEmpty)
    intercept[IllegalArgumentException] {
      LayoutOps.hilbertCellsForBoxN(Seq(0L, 0L, 0L), Seq(7L, 7L, 7L),
        Seq((0L, 1L), (0L, 1L), (0L, 1L)), bits = b3, cellBits = 5)
    }
    // readBoxHilbert routes the n-D enumerator end-to-end
    val pts = (0 until 1500).map(i =>
      (i.toLong, (i * 131 % 64).toLong, (i * 113 % 64).toLong,
        (i * 97 % 64).toLong))
    val df = pts.toDF("id", "x", "y", "z")
    val dir = tmpDir("hilbert3d") + "/layout"
    LayoutOps.writeHilbert(df, dir, Seq("x", "y", "z"), bits = 6,
      cellBits = 6)
    val mins = Seq(pts.map(_._2).min, pts.map(_._3).min, pts.map(_._4).min)
    val maxs = Seq(pts.map(_._2).max, pts.map(_._3).max, pts.map(_._4).max)
    val box = Seq((10L, 40L), (5L, 50L), (20L, 60L))
    val got = LayoutOps.readBoxHilbert(spark, dir, Seq("x", "y", "z"),
      mins, maxs, box, bits = 6, cellBits = 6)
    val want = df.filter(col("x").between(box(0)._1, box(0)._2) &&
      col("y").between(box(1)._1, box(1)._2) &&
      col("z").between(box(2)._1, box(2)._2))
    assert(got.select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      want.select("id").collect().map(_.getLong(0)).sorted.toSeq)
  }
}
