package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.LayoutOps

/** Randomized properties for the z-order cell enumeration — the pure
  * driver-side math whose SOUNDNESS (no in-box row outside the
  * returned cells) every pruned read rests on. Deterministic seeds,
  * the repo's Gen-with-Seed pattern.
  */
class LayoutPropertySpec extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  /** Reference encode: the same fixed-width bucket + interleave rule,
    * written as straight loops.
    */
  private def refCell(coords: Seq[Long], mins: Seq[Long], maxs: Seq[Long],
                      bits: Int, cellBits: Int): Long = {
    val n = coords.size
    var zkey = 0L
    coords.indices.foreach { i =>
      val w = ((maxs(i) - mins(i)) >> bits) + 1
      val clamped = coords(i).max(mins(i)).min(maxs(i))
      val bucket = (clamped - mins(i)) / w
      (0 until bits).foreach { b =>
        zkey |= ((bucket >> b) & 1L) << (b * n + i)
      }
    }
    zkey >> (bits * n - cellBits)
  }

  test("cellsForBox soundness holds on 300 random instances (1-3 dims)") {
    val caseGen = for {
      n <- Gen.choose(1, 3)
      bits <- Gen.choose(2, 8)
      cellBits <- Gen.choose(1, math.min(10, bits * n))
      mins <- Gen.listOfN(n, Gen.choose(-1000000L, 1000000L))
      spans <- Gen.listOfN(n, Gen.choose(1L, 5000000L))
      boxRel <- Gen.listOfN(n, for {
        a <- Gen.choose(-0.3, 1.3); b <- Gen.choose(-0.3, 1.3)
      } yield (math.min(a, b), math.max(a, b)))
      pts <- Gen.listOfN(40, Gen.listOfN(n, Gen.choose(0.0, 1.0)))
    } yield (n, bits, cellBits, mins, spans, boxRel, pts)

    (0 until 300).foreach { k =>
      val (n, bits, cellBits, mins, spans, boxRel, pts) =
        sample(caseGen, 1000L + k)
      val maxs = mins.zip(spans).map { case (m, s) => m + s }
      val box = boxRel.zipWithIndex.map { case ((lo, hi), i) =>
        (mins(i) + (lo * spans(i)).toLong, mins(i) + (hi * spans(i)).toLong)
      }
      val cells = LayoutOps.cellsForBox(mins, maxs, box, bits, cellBits,
        clamp = false).toSet
      // every IN-RANGE point inside the box must live in a returned cell
      pts.foreach { rel =>
        val p = rel.zipWithIndex.map { case (r, i) =>
          mins(i) + (r * spans(i)).toLong }
        val inBox = p.indices.forall(i =>
          p(i) >= box(i)._1 && p(i) <= box(i)._2)
        if (inBox) {
          val cell = refCell(p, mins, maxs, bits, cellBits)
          assert(cells.contains(cell),
            s"case $k: point $p in box $box but cell $cell not in " +
              s"${cells.toSeq.sorted.take(20)} (n=$n bits=$bits cb=$cellBits)")
        }
      }
      // clamp mode is a superset-for-the-clamped-world: every point
      // CLAMPED into range that lands in the (clamped) box must be
      // covered by the clamp-mode enumeration
      val clampCells = LayoutOps.cellsForBox(mins, maxs, box, bits,
        cellBits, clamp = true).toSet
      assert(cells.subsetOf(clampCells) || cells == clampCells)
      pts.foreach { rel =>
        val raw = rel.zipWithIndex.map { case (r, i) =>
          mins(i) + ((r * 2 - 0.5) * spans(i)).toLong } // may be out of range
        val inBoxRaw = raw.indices.forall(i =>
          raw(i) >= box(i)._1 && raw(i) <= box(i)._2)
        if (inBoxRaw) {
          val cell = refCell(raw, mins, maxs, bits, cellBits) // clamps
          assert(clampCells.contains(cell),
            s"case $k: clamped point $raw missed by clamp-mode cells")
        }
      }
    }
  }

  test("trie decomposition equals the brute-force enumerator on 300 instances") {
    // cellsForBox is now a pruned trie descent (BIGMIN/LITMAX family);
    // the full-grid scan it replaced stays as the independent reference
    val caseGen = for {
      n <- Gen.choose(1, 3)
      bits <- Gen.choose(2, 8)
      cellBits <- Gen.choose(1, math.min(10, bits * n))
      mins <- Gen.listOfN(n, Gen.choose(-1000000L, 1000000L))
      spans <- Gen.listOfN(n, Gen.choose(1L, 5000000L))
      boxRel <- Gen.listOfN(n, for {
        a <- Gen.choose(-0.3, 1.3); b <- Gen.choose(-0.3, 1.3)
      } yield (math.min(a, b), math.max(a, b)))
      clamp <- Gen.oneOf(true, false)
    } yield (n, bits, cellBits, mins, spans, boxRel, clamp)
    (0 until 300).foreach { k =>
      val (n, bits, cellBits, mins, spans, boxRel, clamp) =
        sample(caseGen, 5000L + k)
      val maxs = mins.zip(spans).map { case (m, s) => m + s }
      val box = boxRel.zipWithIndex.map { case ((lo, hi), i) =>
        (mins(i) + (lo * spans(i)).toLong, mins(i) + (hi * spans(i)).toLong)
      }
      val fast = LayoutOps.cellsForBox(mins, maxs, box, bits, cellBits, clamp)
      val brute =
        LayoutOps.cellsForBoxBrute(mins, maxs, box, bits, cellBits, clamp)
      assert(fast === brute,
        s"case $k: trie ${fast.take(20)} != brute ${brute.take(20)} " +
          s"(n=$n bits=$bits cb=$cellBits clamp=$clamp)")
    }
  }

  test("trie decomposition handles cellBits=16 without a full-grid scan") {
    // the grid a 100 TB layout wants: 2^16 cells over 2 dims × 8 bits —
    // the brute scan would test 65 536 cells per query; the descent
    // must agree with it while visiting only the box's neighbourhood
    val mins = Seq(0L, 0L); val maxs = Seq(1L << 20, 1L << 20)
    val box = Seq((1000L, 5000L), (200000L, 201000L))
    val fast = LayoutOps.cellsForBox(mins, maxs, box, bits = 8,
      cellBits = 16)
    val brute = LayoutOps.cellsForBoxBrute(mins, maxs, box, bits = 8,
      cellBits = 16)
    assert(fast === brute)
    // a tight box must prune to a tiny fraction of the 65 536-cell grid
    assert(fast.nonEmpty && fast.size < 256,
      s"expected a pruned cell set, got ${fast.size} cells")
  }

  test("zorderKey agrees with the reference on a randomized 2-D batch") {
    import spark.implicits._
    val rows = (0 until 500).map { i =>
      (sample(Gen.choose(-500000L, 500000L), 7000L + i),
        sample(Gen.choose(0L, 3000000000000L), 8000L + i))
    }
    val df = rows.toDF("x", "y")
    val got = LayoutOps.zorderKey(df, Seq("x", "y"), bits = 8)
      .select("x", "y", "zkey").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val mins = Seq(rows.map(_._1).min, rows.map(_._2).min)
    val maxs = Seq(rows.map(_._1).max, rows.map(_._2).max)
    rows.foreach { case (x, y) =>
      val want = {
        var z = 0L
        Seq(x, y).zipWithIndex.foreach { case (v, i) =>
          val w = ((maxs(i) - mins(i)) >> 8) + 1
          val bucket = (v - mins(i)) / w
          (0 until 8).foreach { b => z |= ((bucket >> b) & 1L) << (b * 2 + i) }
        }
        z
      }
      assert(got((x, y)) === want, s"at ($x,$y)")
    }
  }
}
