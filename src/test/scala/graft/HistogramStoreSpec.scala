package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.HistogramStore

/** Persisted histogram lifecycle: delta maintenance ≡ one-shot build
  * bin-for-bin, quantile ranks against the exact sorted answer, exact
  * integer TV drift (0 for identical shapes, 10⁶ for disjoint),
  * escape-bin routing, lossy-cast rejection, replay fencing via the
  * delegated RollupStore ledger, and the streaming leg's stream ≡
  * batch pin.
  */
class HistogramStoreSpec extends SparkSpec {
  import spark.implicits._

  private def vals(n: Int, shift: Int): DataFrame =
    (1 to n).map(i => (i.toLong + shift, ((i * 37 + shift) % 500).toLong))
      .toDF("id", "v")

  private def bins(path: String): Map[Long, Long] =
    HistogramStore.serve(spark, path)
      .select("bin", "cnt").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("write + extend ≡ one-shot build bin-for-bin, replay is a " +
    "no-op, compact preserves the serve") {
    val a = vals(400, 0)
    val b = vals(300, 7000)
    val inc = tmpDir("hg-inc") + "/h"
    val once = tmpDir("hg-once") + "/h"
    HistogramStore.write(a, inc, "v", lo = 0L, hi = 500L, nBins = 50)
    HistogramStore.extend(b, inc, batchId = 1L)
    HistogramStore.write(a.unionByName(b), once, "v", 0L, 500L, 50)
    assert(bins(inc) === bins(once))
    // crash-replay of batch 1: delegated ledger makes it a no-op
    HistogramStore.extend(b, inc, batchId = 1L)
    assert(bins(inc) === bins(once))
    HistogramStore.compact(spark, inc)
    assert(bins(inc) === bins(once))
    // sum/min/max ride along per bin
    val r = HistogramStore.serve(spark, inc).filter(col("bin") === 0L)
      .select("min_v", "max_v").head
    assert(r.getLong(0) >= 0L && r.getLong(1) < 10L)
  }

  test("escape bins: nulls -> -2, underflow -> -1, overflow -> nBins; " +
    "quantiles exclude nulls but keep under/overflow in rank") {
    val d = Seq[(Long, Option[Long])]((1L, Some(-5L)), (2L, Some(0L)),
      (3L, Some(250L)), (4L, Some(499L)), (5L, Some(500L)),
      (6L, Some(900L)), (7L, None)).toDF("id", "v")
    val path = tmpDir("hg-esc") + "/h"
    HistogramStore.write(d, path, "v", 0L, 500L, 5)
    val m = bins(path)
    assert(m(-2L) === 1L && m(-1L) === 1L && m(5L) === 2L)
    assert(m(0L) === 1L && m(2L) === 1L && m(4L) === 1L)
    // 6 finite values; q=1/2 -> target ceil(3)=3 -> cum over bins
    // (-1:1, 0:2, 2:3 ...) -> bin 2; q=1 -> target 6 -> overflow bin
    val qs = HistogramStore.quantiles(spark, path, Seq((1, 2), (1, 1)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(qs(500000L) === 2L)
    assert(qs(1000000L) === 5L)
    // edges: finite bins carry exact long edges, escapes carry nulls
    val edges = HistogramStore.serve(spark, path)
      .select("bin", "bin_lo", "bin_hi").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2)))))
      .toMap
    assert(edges(2L) === Some((200L, 300L)))
    assert(edges(-1L) === None && edges(5L) === None)
  }

  test("review pins: wide-geometry edges, honest null-bin stats, " +
    "empty-store rejects, reserved-name guard, caller 'bin' survives") {
    // F1: bin·width beyond 2^63 — edges must ride DECIMAL
    val wide = tmpDir("hg-wide") + "/h"
    HistogramStore.write(
      Seq((1L, 99999999999999999L)).toDF("id", "v"),
      wide, "v", 0L, 100000000000000000L, 1000)
    val e999 = HistogramStore.serve(spark, wide)
      .filter(col("bin") === 999L).select("bin_lo", "bin_hi").head
    assert(e999.getLong(0) === 99900000000000000L &&
      e999.getLong(1) === 100000000000000000L)
    // F6: the null bin's measure stats serve as NULLs, never a
    // fabricated 0 that could masquerade as a real minimum
    val nb = tmpDir("hg-null") + "/h"
    HistogramStore.write(
      Seq((1L, Some(100L)), (2L, Option.empty[Long])).toDF("id", "v"),
      nb, "v", 0L, 500L, 5)
    val nrow = HistogramStore.serve(spark, nb)
      .filter(col("bin") === -2L).head
    assert(nrow.getAs[Long]("cnt") === 1L && nrow.isNullAt(4) &&
      nrow.isNullAt(5) && nrow.isNullAt(6))
    // F4/F7: empty stores reject loudly (the bootstrapped-stream state)
    val empty = tmpDir("hg-empty") + "/h"
    HistogramStore.write(Seq.empty[(Long, Long)].toDF("id", "v"),
      empty, "v", 0L, 500L, 5)
    val eq = intercept[IllegalArgumentException] {
      HistogramStore.quantiles(spark, empty, Seq((1, 2)))
    }
    assert(eq.getMessage.contains("no finite-bin rows"))
    val ed = intercept[IllegalArgumentException] {
      HistogramStore.drift(spark, nb, empty)
    }
    assert(ed.getMessage.contains("non-empty"))
    // F5: a caller column named `bin` passes through untouched, and
    // the reserved internal names reject
    val withBin = Seq((1L, 100L, "keep-me")).toDF("id", "v", "bin")
    val out = HistogramStore.resampleToMatch(withBin, "id", nb, nb, "s")
    assert(out.columns.toSeq === Seq("id", "v", "bin") &&
      out.head.getString(2) === "keep-me")
    val er = intercept[IllegalArgumentException] {
      HistogramStore.resampleToMatch(
        Seq((1L, 100L, 0L)).toDF("id", "v", "__hg_bin"), "id", nb, nb, "s")
    }
    assert(er.getMessage.contains("reserves"))
  }

  test("quantile bins bracket the exact sorted quantile") {
    val d = vals(1000, 0)
    val path = tmpDir("hg-q") + "/h"
    HistogramStore.write(d, path, "v", 0L, 500L, 50)
    val sorted = d.select("v").collect().map(_.getLong(0)).sorted
    for ((num, den) <- Seq((1, 4), (1, 2), (9, 10))) {
      val exact = sorted((num * sorted.length + den - 1) / den - 1)
      val row = HistogramStore.quantiles(spark, path, Seq((num, den)))
        .head
      assert(exact >= row.getAs[Long]("bin_lo") &&
        exact < row.getAs[Long]("bin_hi"),
        s"q=$num/$den: exact $exact outside " +
          s"[${row.getAs[Long]("bin_lo")}, ${row.getAs[Long]("bin_hi")})")
    }
  }

  test("ppm-colliding rationals keep their own ceil(q*n) targets " +
      "(ADVICE r9: group by the exact rational, not its ppm)") {
    // (1, 3) and (333333, 1000000) both project to q_ppm = 333333 but
    // are distinct rationals with their own ceil(q·n) targets. The
    // pinned contract: one output row PER REQUESTED q — the old
    // ppm-keyed group merged them into a single row, silently
    // dropping one caller-requested quantile.
    val d = vals(1000, 0)
    val path = tmpDir("hg-qq") + "/h"
    HistogramStore.write(d, path, "v", 0L, 500L, 50)
    val out = HistogramStore.quantiles(spark, path,
      Seq((1, 3), (333333, 1000000))).collect()
    assert(out.length == 2,
      s"two requested quantiles must emit two rows, got ${out.length}")
    assert(out.forall(_.getAs[Long]("q_ppm") == 333333L))
  }

  test("rebin ≡ build-from-scratch at the coarser geometry, from the " +
      "bin table alone (VERDICT r9 #5)") {
    // corpus with all three escape classes in play
    val d = vals(1000, 0)
      .unionByName(Seq((2001L, null.asInstanceOf[java.lang.Long]),
        (2002L, java.lang.Long.valueOf(-7L)),
        (2003L, java.lang.Long.valueOf(650L)))
        .toDF("id", "v"))
    val root = tmpDir("hg-rebin")
    HistogramStore.write(d, s"$root/fine", "v", 0L, 500L, 50)
    HistogramStore.rebin(spark, s"$root/fine", s"$root/coarse", 10)
    HistogramStore.write(d, s"$root/scratch", "v", 0L, 500L, 10)

    def served(p: String) = HistogramStore.serve(spark, p)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(served(s"$root/coarse") === served(s"$root/scratch"),
      "rebinned bins must equal a from-scratch build bin-for-bin")
    // ...and the two stores are indistinguishable to every serving op
    assert(HistogramStore.drift(spark, s"$root/coarse",
      s"$root/scratch").head.getAs[Long]("tv_ppm") === 0L)
    val qs = Seq((1, 4), (1, 2), (9, 10))
    assert(HistogramStore.quantiles(spark, s"$root/coarse", qs)
      .collect().map(_.toSeq).toSeq ===
      HistogramStore.quantiles(spark, s"$root/scratch", qs)
        .collect().map(_.toSeq).toSeq)

    // the rebinned store is a REAL store: extend() accepts deltas
    // under the coarse geometry exactly like the scratch twin
    HistogramStore.extend(vals(200, 5000), s"$root/coarse", batchId = 1L)
    HistogramStore.extend(vals(200, 5000), s"$root/scratch", batchId = 1L)
    assert(served(s"$root/coarse") === served(s"$root/scratch"))

    // the no-rescan claim, proven the hard way: with the SOURCE
    // CORPUS gone, rebin still works — it reads the bin table alone
    val fine2 = s"$root/fine2"
    val doomed = tmpDir("hg-rebin-src")
    d.write.parquet(s"$doomed/corpus")
    HistogramStore.write(spark.read.parquet(s"$doomed/corpus"),
      fine2, "v", 0L, 500L, 50)
    // expected value captured while the corpus still exists ($root/
    // scratch was extended above and is no longer d's histogram)
    HistogramStore.write(d, s"$root/scratch2", "v", 0L, 500L, 10)
    val expected = served(s"$root/scratch2")
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).toSeq.flatten.foreach(rmTree); f.delete(); ()
    }
    rmTree(new java.io.File(doomed))
    HistogramStore.rebin(spark, fine2, s"$root/coarse2", 10)
    assert(served(s"$root/coarse2") === expected,
      "rebin must not touch the corpus")

    // refinement / non-divisor coarsening has no exact answer in the
    // bin table — loud reject, not an approximation
    val e = intercept[IllegalArgumentException] {
      HistogramStore.rebin(spark, s"$root/fine", s"$root/bad", 7)
    }
    assert(e.getMessage.contains("COARSENING"))
    val e2 = intercept[IllegalArgumentException] {
      HistogramStore.rebin(spark, s"$root/fine", s"$root/bad", 100)
    }
    assert(e2.getMessage.contains("COARSENING"))
  }

  test("drift: 0 for identical shapes, 1e6 for disjoint, geometry " +
    "mismatch rejects") {
    val a = vals(500, 0)
    val pa = tmpDir("hg-da") + "/h"
    val pb = tmpDir("hg-db") + "/h"
    val pc = tmpDir("hg-dc") + "/h"
    val pd = tmpDir("hg-dd") + "/h"
    HistogramStore.write(a, pa, "v", 0L, 500L, 50)
    // same SHAPE at double the mass: TV compares normalised shapes
    HistogramStore.write(a.unionByName(a), pb, "v", 0L, 500L, 50)
    assert(HistogramStore.drift(spark, pa, pb).head
      .getAs[Long]("tv_ppm") === 0L)
    // disjoint supports
    HistogramStore.write(a.filter(col("v") < 100), pc, "v", 0L, 500L, 50)
    HistogramStore.write(a.filter(col("v") >= 100), pd, "v", 0L, 500L, 50)
    assert(HistogramStore.drift(spark, pc, pd).head
      .getAs[Long]("tv_ppm") === 1000000L)
    val other = tmpDir("hg-geom") + "/h"
    HistogramStore.write(a, other, "v", 0L, 500L, 25)
    val e = intercept[IllegalArgumentException] {
      HistogramStore.drift(spark, pa, other)
    }
    assert(e.getMessage.contains("identical geometry"))
  }

  test("a lossy value rejects loudly instead of binning a value " +
    "nobody measured") {
    val d = Seq((1L, 3.7), (2L, 10.0)).toDF("id", "v")
    val path = tmpDir("hg-lossy") + "/h"
    val e = intercept[Exception] {
      HistogramStore.write(d, path, "v", 0L, 500L, 50)
    }
    assert(e.getMessage.contains("does not cast EXACTLY"))
    // exact-valued doubles bin fine
    val ok = tmpDir("hg-exact") + "/h"
    HistogramStore.write(Seq((1L, 10.0), (2L, 490.0)).toDF("id", "v"),
      ok, "v", 0L, 500L, 50)
    assert(bins(ok) === Map(1L -> 1L, 49L -> 1L))
  }

  test("matchWeights: overrepresented bins shrink, underrepresented " +
    "cap at 1e6, reference-empty bins drop to 0") {
    // ref: uniform over [0,100); cur: heavy low half + mass in a bin
    // the ref never saw ([400,500))
    val ref = (1 to 200).map(i => (i.toLong, (i % 100).toLong))
      .toDF("id", "v")
    val cur = ((1 to 300).map(i => (i.toLong, (i % 50).toLong)) ++
      (1 to 100).map(i => (1000L + i, 50L + (i % 50))) ++
      (1 to 50).map(i => (2000L + i, 450L)))
      .toDF("id", "v")
    val pr = tmpDir("hm-ref") + "/h"
    val pc = tmpDir("hm-cur") + "/h"
    HistogramStore.write(ref, pr, "v", 0L, 500L, 10)
    HistogramStore.write(cur, pc, "v", 0L, 500L, 10)
    val w = HistogramStore.matchWeights(spark, pr, pc)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // bin 0 [0,50): cur 300/450 vs ref 100/200 ->
    // w = (100*450)/(300*200) = 0.75
    assert(w(0L) === 750000L)
    // bin 1 [50,100): cur 100/450 vs ref 100/200 -> ratio 2.25 -> capped
    assert(w(1L) === 1000000L)
    // bin 9 [450,500): ref never saw it -> keep nothing
    assert(w(9L) === 0L)
  }

  test("resampleToMatch reduces drift toward the reference, is " +
    "deterministic in (seed, id), and keeps rows from bins the " +
    "store never saw") {
    val ref = (1 to 400).map(i => (i.toLong, (i % 100).toLong))
      .toDF("id", "v")
    val cur = ((1 to 600).map(i => (i.toLong, (i % 50).toLong)) ++
      (1 to 200).map(i => (5000L + i, 50L + (i % 50))))
      .toDF("id", "v").localCheckpoint()
    val pr = tmpDir("hm2-ref") + "/h"
    val pc = tmpDir("hm2-cur") + "/h"
    HistogramStore.write(ref, pr, "v", 0L, 100L, 10)
    HistogramStore.write(cur, pc, "v", 0L, 100L, 10)
    val before = HistogramStore.drift(spark, pr, pc)
      .head.getAs[Long]("tv_ppm")
    val kept = HistogramStore.resampleToMatch(cur, "id", pr, pc, "s1")
      .localCheckpoint()
    val pk = tmpDir("hm2-kept") + "/h"
    HistogramStore.write(kept, pk, "v", 0L, 100L, 10)
    val after = HistogramStore.drift(spark, pr, pk)
      .head.getAs[Long]("tv_ppm")
    assert(after < before,
      s"resampling must reduce drift: before=$before after=$after")
    // deterministic: same seed -> same kept set, any partitioning
    val again = HistogramStore
      .resampleToMatch(cur.repartition(7), "id", pr, pc, "s1")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(again ===
      kept.select("id").collect().map(_.getLong(0)).sorted.toSeq)
    // a row in a bin the CURRENT store never saw survives (stale
    // store must not silently erase data)
    val stale = Seq((9999L, 99999L)).toDF("id", "v") // overflow bin
    val keptStale = HistogramStore
      .resampleToMatch(cur.unionByName(stale), "id", pr, pc, "s1")
      .filter(col("id") === 9999L).count()
    assert(keptStale === 1L)
  }

  test("driftAgainst ≡ two-store drift, and driftMonitorStream lands " +
    "one tagged report per trigger (empty trigger -> null-drift row)") {
    import graft.streaming.StreamingPipeline
    val ref = vals(400, 0)
    val cur = vals(300, 9000).localCheckpoint()
    val pr = tmpDir("dm-ref") + "/h"
    val pc = tmpDir("dm-cur") + "/h"
    HistogramStore.write(ref, pr, "v", 0L, 500L, 50)
    HistogramStore.write(cur, pc, "v", 0L, 500L, 50)
    val viaStores = HistogramStore.drift(spark, pr, pc)
      .head.getAs[Long]("tv_ppm")
    val viaBatch = HistogramStore.driftAgainst(cur, pr)
      .head.getAs[Long]("tv_ppm")
    assert(viaBatch === viaStores,
      "binning the raw batch must equal materialising it as a store")
    // stream: two slices -> two reports, each equal to the direct
    // per-slice driftAgainst
    val slices = Seq(cur.filter(col("id") <= 9150),
      cur.filter(col("id") > 9150))
    val src = tmpDir("dm-src")
    slices.foreach(_.coalesce(1).write.mode("append").parquet(src))
    // a zero-row file drives the EMPTY-trigger branch: the stream
    // must land a null-drift row beside the real reports, readable
    // through the same b_* glob
    cur.limit(0).coalesce(1).write.mode("append").parquet(src)
    val rep = tmpDir("dm-rep") + "/report"
    StreamingPipeline.driftMonitorStream(
      spark.readStream.schema(cur.schema)
        .option("maxFilesPerTrigger", 1).parquet(src),
      pr, rep, tmpDir("dm-ckpt"))
      .awaitTermination()
    val all = spark.read.parquet(s"$rep/b_*")
    val nullRows = all.filter(col("tv_ppm").isNull)
      .select("n_batch").collect().map(_.getLong(0)).toSeq
    assert(nullRows === Seq(0L),
      "the empty trigger must land exactly one null-drift row")
    val landed = all.filter(col("tv_ppm").isNotNull)
      .select("n_batch", "tv_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val direct = slices.map { s =>
      val r = HistogramStore.driftAgainst(s, pr).head
      (r.getAs[Long]("n_batch"), r.getAs[Long]("tv_ppm"))
    }.sorted
    assert(landed.toSeq === direct)
  }

  test("histogramIngestStream ≡ batch extend (ledger-fenced per " +
    "trigger)") {
    import graft.streaming.StreamingPipeline
    val d = vals(600, 0).localCheckpoint()
    val slices = Seq(d.filter(col("id") <= 300), d.filter(col("id") > 300))
    val src = tmpDir("hg-src")
    slices.foreach(_.coalesce(1).write.mode("append").parquet(src))
    val streamed = tmpDir("hg-stream") + "/h"
    // geometry is a build-time contract: bootstrap on an empty frame
    HistogramStore.write(d.limit(0), streamed, "v", 0L, 500L, 50)
    StreamingPipeline.histogramIngestStream(
      spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1).parquet(src),
      streamed, tmpDir("hg-ckpt"))
      .awaitTermination()
    val direct = tmpDir("hg-direct") + "/h"
    HistogramStore.write(d, direct, "v", 0L, 500L, 50)
    assert(bins(streamed) === bins(direct))
    assert(HistogramStore.drift(spark, streamed, direct).head
      .getAs[Long]("tv_ppm") === 0L)
  }
}
