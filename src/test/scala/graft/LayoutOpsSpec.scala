package graft

import org.apache.spark.sql.functions._
import graft.operators.LayoutOps

/** Z-order layout: key arithmetic vs a direct Morton reference,
  * cell-enumeration soundness, and the physical write's
  * directory-level pruning.
  */
class LayoutOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Straight-line reference: bucket with the same fixed-width rule,
    * interleave with a bit loop — independent of the Column-expression
    * composition under test.
    */
  private def refZkey(x: Long, y: Long, mins: (Long, Long),
                      maxs: (Long, Long), bits: Int): Long = {
    def bucket(v: Long, mn: Long, mx: Long): Long =
      (v - mn) / (((mx - mn) >> bits) + 1)
    val (bx, by) = (bucket(x, mins._1, maxs._1), bucket(y, mins._2, maxs._2))
    (0 until bits).foldLeft(0L) { (acc, b) =>
      acc | (((bx >> b) & 1L) << (b * 2)) | (((by >> b) & 1L) << (b * 2 + 1))
    }
  }

  private val pts = (for (x <- 0L to 40L; y <- 0L to 40L if (x + y) % 7 == 0)
    yield (x * 13, y * 997 + 5)).toSeq

  test("zorderKey matches the direct Morton reference on every row") {
    val df = pts.toDF("x", "y")
    val got = LayoutOps.zorderKey(df, Seq("x", "y"), bits = 8)
      .select("x", "y", "zb_x", "zb_y", "zkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    val mins = (pts.map(_._1).min, pts.map(_._2).min)
    val maxs = (pts.map(_._1).max, pts.map(_._2).max)
    assert(got.nonEmpty)
    got.foreach { case (x, y, zbx, zby, zkey) =>
      assert(zbx >= 0 && zbx < 256 && zby >= 0 && zby < 256)
      assert(zkey === refZkey(x, y, mins, maxs, 8), s"at ($x,$y)")
    }
  }

  test("grid coordinates stay in range for adversarial bounds") {
    // max-min+1 not divisible by 2^bits, huge range (micros-scale), and
    // a degenerate constant dimension
    val df = Seq((0L, 5L), (999999999999L, 5L), (123456789L, 5L),
      (1L, 5L)).toDF("big", "flat")
    val out = LayoutOps.zorderKey(df, Seq("big", "flat"), bits = 8)
      .select("zb_big", "zb_flat").collect()
    out.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 255)
      assert(r.getLong(1) === 0L) // constant dim → single bucket
    }
  }

  test("cellsForBox is sound: every box row lives in a returned cell") {
    val df = pts.toDF("x", "y")
    val layout = LayoutOps.zorderLayout(df, Seq("x", "y"), bits = 8,
      cellBits = 6)
    val mins = Seq(pts.map(_._1).min, pts.map(_._2).min)
    val maxs = Seq(pts.map(_._1).max, pts.map(_._2).max)
    val box = Seq((100L, 300L), (2000L, 30000L))
    val cells = LayoutOps.cellsForBox(mins, maxs, box, bits = 8,
      cellBits = 6).toSet
    val boxRows = layout.filter(col("x").between(box(0)._1, box(0)._2) &&
      col("y").between(box(1)._1, box(1)._2))
      .select("zcell").collect().map(_.getLong(0)).toSet
    assert(boxRows.nonEmpty, "test box must not be empty")
    assert(boxRows.subsetOf(cells),
      s"rows in cells ${boxRows.diff(cells)} missed by cellsForBox")
    // and it prunes: the candidate list is a strict subset of the grid
    assert(cells.size < (1 << 6))
  }

  test("a dimension range wider than Long.MaxValue fails loudly everywhere") {
    // full-range hash-key dims: max - min wraps negative; handing out
    // wrong cells here would silently break readBox soundness
    val wide = Seq((Long.MinValue + 10, 0L), (Long.MaxValue - 10, 1L))
      .toDF("h", "y")
    val e = intercept[Exception] {
      LayoutOps.zorderKey(wide, Seq("h", "y"), bits = 8)
        .select("zkey").collect()
    }
    // under ANSI (Spark 4 default) the subtraction itself throws
    // ARITHMETIC_OVERFLOW; under ansi=false the in-plan raise_error
    // guard fires — either way the failure is loud, never wrong cells
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(msgs(e).exists(m =>
      m.contains("Long.MaxValue") || m.contains("ARITHMETIC_OVERFLOW")))
    intercept[IllegalArgumentException] {
      LayoutOps.cellsForBox(Seq(Long.MinValue + 10, 0L),
        Seq(Long.MaxValue - 10, 1L), Seq((0L, 1L), (0L, 1L)))
    }
  }

  test("cellsForBox: disjoint box returns no cells") {
    assert(LayoutOps.cellsForBox(Seq(0L, 0L), Seq(100L, 100L),
      Seq((200L, 300L), (0L, 50L)), bits = 4, cellBits = 4).isEmpty)
  }

  test("write + readBox equals the full-scan filter and prunes directories") {
    val df = pts.toDF("x", "y")
    val dir = tmpDir("zorder") + "/layout"
    LayoutOps.write(df, dir, Seq("x", "y"), bits = 8, cellBits = 6)
    val mins = Seq(pts.map(_._1).min, pts.map(_._2).min)
    val maxs = Seq(pts.map(_._1).max, pts.map(_._2).max)
    val box = Seq((100L, 300L), (2000L, 30000L))
    val got = LayoutOps.readBox(spark, dir, Seq("x", "y"), mins, maxs, box,
      bits = 8, cellBits = 6)
    val want = df.filter(col("x").between(box(0)._1, box(0)._2) &&
      col("y").between(box(1)._1, box(1)._2))
    assert(got.select("x", "y").collect().map(r => (r.getLong(0),
      r.getLong(1))).sorted.toSeq ===
      want.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    // partition pruning: the cell filter must reach the scan as a
    // PartitionFilter (directory-level pruning, not a post-scan filter)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[.*zcell.*"),
      s"zcell filter not pushed to partition pruning:\n$plan")
  }

  test("z-order beats a single-column sort layout on a 2-D box") {
    // uniform 64×64 grid; the box touches 1/8 of each dimension. A
    // layout sorted by x alone can only prune on x (≥ ~1/8 of cells
    // survive, every y inside); the z-grid prunes BOTH dims to ~1/64.
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L)
      yield (x, y)).toDF("x", "y")
    val layout = LayoutOps.zorderLayout(grid, Seq("x", "y"), bits = 6,
      cellBits = 6)
    val box = Seq((8L, 15L), (8L, 15L))
    val zCells = LayoutOps.cellsForBox(Seq(0L, 0L), Seq(63L, 63L), box,
      bits = 6, cellBits = 6)
    // x-sorted layout with 64 equal files: file f holds x == f exactly,
    // so 8 of 64 files survive the x predicate
    assert(zCells.size < 8,
      s"z-grid candidates ${zCells.size} should beat the 8 x-sorted files")
    // soundness on this instance too
    val boxCells = layout.filter(col("x").between(8, 15) &&
      col("y").between(8, 15)).select("zcell").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(boxCells.subsetOf(zCells.toSet))
  }

  test("three dimensions: interleave round-trips and box pruning stays sound") {
    // 3 dims × 4 bits = 12-bit key; reference de-interleave per dim
    val tri = (for (x <- 0L until 16L; y <- 0L until 16L;
                    z <- 0L until 16L if (x + y + z) % 5 == 0)
      yield (x, y, z)).toDF("x", "y", "z")
    val keyed = LayoutOps.zorderKey(tri, Seq("x", "y", "z"), bits = 4)
      .collect()
    keyed.foreach { r =>
      val (x, y, z, zk) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(r.fieldIndex("zkey")))
      def deinter(i: Int): Long = (0 until 4).foldLeft(0L) { (acc, b) =>
        acc | (((zk >> (b * 3 + i)) & 1L) << b)
      }
      // ranges are 0..15 with bits=4 → bucket == coordinate
      assert((deinter(0), deinter(1), deinter(2)) === ((x, y, z)),
        s"de-interleave mismatch at ($x,$y,$z)")
    }
    val layout = LayoutOps.zorderLayout(tri, Seq("x", "y", "z"), bits = 4,
      cellBits = 6)
    val box = Seq((2L, 5L), (8L, 11L), (0L, 3L))
    val cells = LayoutOps.cellsForBox(Seq(0L, 0L, 0L), Seq(15L, 15L, 15L),
      box, bits = 4, cellBits = 6).toSet
    val inBox = layout.filter(col("x").between(2, 5) &&
      col("y").between(8, 11) && col("z").between(0, 3))
      .select("zcell").distinct().collect().map(_.getLong(0)).toSet
    assert(inBox.nonEmpty && inBox.subsetOf(cells))
    assert(cells.size < 64, "3-D box should prune the 64-cell grid")
  }

  test("cellStats agrees with a direct aggregation") {
    val df = pts.toDF("x", "y")
    val layout = LayoutOps.zorderLayout(df, Seq("x", "y"), bits = 8,
      cellBits = 4)
    val stats = LayoutOps.cellStats(layout, Seq("x", "y"))
    val direct = layout.groupBy("zcell")
      .agg(count(lit(1)).as("cnt"), min("x").as("min_x"),
        max("x").as("max_x"), min("y").as("min_y"), max("y").as("max_y"))
    assert(stats.orderBy("zcell").collect().toSeq ===
      direct.orderBy("zcell").collect().toSeq)
    assert(stats.agg(sum("cnt")).head.getLong(0) === pts.size.toLong)
  }
}
