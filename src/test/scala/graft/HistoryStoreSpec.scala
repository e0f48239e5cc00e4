package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{HistoryOps, HistoryStore}

/** Persisted SCD2 dimension lifecycle: the append-only
  * closure/frontier reconstruction (write+extend ≡ from-scratch
  * rebuild row-for-row), exactly-once ledger under replayed batches,
  * the append-only guard through the store, bucket-pruned extend
  * reads, compaction that preserves results AND replay no-ops,
  * swap-window heal, and the streaming leg's stream ≡ batch pin.
  */
class HistoryStoreSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new Timestamp(s * 1000L)

  // 40 keys × 6 changes each, states cycling with collapses mixed in
  private def log(idBase: Long, from: Long, until: Long): DataFrame =
    (1L to 40L).flatMap { k =>
      (from until until).map { i =>
        (k, t(i * 10), idBase + k * 100 + i,
          s"s${(i + k) % 3 match { case 0 => 0; case x => x % 2 }}")
      }
    }.toDF("k", "ts", "id", "state")

  private val early = log(0L, 1, 4)    // ts 10..30
  private val late = log(100000L, 4, 7) // ts 40..60

  private def rebuild: DataFrame =
    HistoryOps.scd2(early.unionByName(late), "k", "ts",
      Seq("state"), Seq("id"))

  private def asSet(df: DataFrame) = df.collect().toSet

  test("write + extend served frame equals the from-scratch rebuild " +
    "row-for-row") {
    val path = tmpDir("hs-split") + "/dim"
    HistoryStore.write(early, path, "k", "ts", Seq("state"), Seq("id"),
      nBuckets = 8)
    // the physical-layout parameter is part of the declared grain: a
    // mismatch rejects loudly instead of being silently ignored
    intercept[IllegalArgumentException] {
      HistoryStore.extend(late, path, batchId = 1L, "k", "ts",
        Seq("state"), Seq("id"), nBuckets = 64)
    }
    HistoryStore.extend(late, path, batchId = 1L, "k", "ts",
      Seq("state"), Seq("id"), nBuckets = 8)
    assert(asSet(HistoryStore.serve(spark, path)) === asSet(rebuild))
    val st = HistoryStore.stats(spark, path).head
    assert(st.getAs[Long]("applied_batches") === 2L)
    assert(st.getAs[Long]("keys") === 40L)
    assert(st.getAs[Long]("open_versions") === 40L)
  }

  test("a replayed (producer, batchId) is a ledger no-op; a new id " +
    "folds; grain drift rejects loudly") {
    val path = tmpDir("hs-replay") + "/dim"
    HistoryStore.write(early, path, "k", "ts", Seq("state"), Seq("id"))
    HistoryStore.extend(late.filter(col("ts") <= t(40)), path, 1L,
      "k", "ts", Seq("state"), Seq("id"))
    val once = asSet(HistoryStore.serve(spark, path))
    HistoryStore.extend(late.filter(col("ts") <= t(40)), path, 1L,
      "k", "ts", Seq("state"), Seq("id"))
    assert(asSet(HistoryStore.serve(spark, path)) === once,
      "replayed batch must not refold")
    HistoryStore.extend(late.filter(col("ts") > t(40)), path, 2L,
      "k", "ts", Seq("state"), Seq("id"))
    assert(asSet(HistoryStore.serve(spark, path)) === asSet(rebuild))
    val e = intercept[IllegalArgumentException] {
      HistoryStore.extend(late, path, 3L, "k", "ts", Seq("other"),
        Seq("id"))
    }
    assert(e.getMessage.contains("grain"))
  }

  test("the append-only guard holds THROUGH the store: an extend " +
    "batch reaching into decided history rejects") {
    val path = tmpDir("hs-guard") + "/dim"
    HistoryStore.write(early, path, "k", "ts", Seq("state"), Seq("id"))
    val stale = Seq((1L, t(20), 999999L, "zz"))
      .toDF("k", "ts", "id", "state")
    val e = intercept[Exception] {
      HistoryStore.extend(stale, path, 1L, "k", "ts", Seq("state"),
        Seq("id"))
    }
    assert(e.getMessage.contains("append-only") ||
      Option(e.getCause).exists(_.getMessage.contains("append-only")))
    // and the failed fold left no ledger entry — the retry works once
    // the feed is fixed
    assert(HistoryStore.stats(spark, path).head
      .getAs[Long]("applied_batches") === 1L)
  }

  test("extend bootstraps an absent store under its own batch id") {
    val path = tmpDir("hs-boot") + "/dim"
    HistoryStore.extend(early, path, batchId = 5L, "k", "ts",
      Seq("state"), Seq("id"), producer = "p1")
    assert(asSet(HistoryStore.serve(spark, path)) ===
      asSet(HistoryOps.scd2(early, "k", "ts", Seq("state"), Seq("id"))))
    // the bootstrap batch is ledgered: its replay is a no-op
    HistoryStore.extend(early, path, batchId = 5L, "k", "ts",
      Seq("state"), Seq("id"), producer = "p1")
    assert(HistoryStore.stats(spark, path).head
      .getAs[Long]("applied_batches") === 1L)
  }

  test("compact folds tags to one, preserves the served frame AND " +
    "replay no-ops, and GCs superseded tag dirs after one grace cycle") {
    val path = tmpDir("hs-compact") + "/dim"
    HistoryStore.write(early, path, "k", "ts", Seq("state"), Seq("id"))
    HistoryStore.extend(late.filter(col("ts") <= t(40)), path, 1L,
      "k", "ts", Seq("state"), Seq("id"))
    HistoryStore.extend(late.filter(col("ts") > t(40)), path, 2L,
      "k", "ts", Seq("state"), Seq("id"))
    val pre = asSet(HistoryStore.serve(spark, path))
    assert(HistoryStore.stats(spark, path).head
      .getAs[Long]("tags") === 3L)
    HistoryStore.compact(spark, path)
    assert(asSet(HistoryStore.serve(spark, path)) === pre,
      "compaction changed the dimension")
    val st = HistoryStore.stats(spark, path).head
    assert(st.getAs[Long]("tags") === 1L)
    assert(st.getAs[Long]("applied_batches") === 3L,
      "compaction must preserve the ledger pairs")
    HistoryStore.extend(late.filter(col("ts") > t(40)), path, 2L,
      "k", "ts", Seq("state"), Seq("id"))
    assert(asSet(HistoryStore.serve(spark, path)) === pre,
      "replay after compaction must stay a no-op")
    // grace window: the compact that superseded the old tags leaves
    // them on disk (a concurrent reader's lazy plan still resolves);
    // the NEXT compact's opening GC removes them
    def dataDirs() = new java.io.File(s"$path/data").listFiles()
      .filter(_.isDirectory)
    assert(dataDirs().length === 4,
      "superseded tag dirs must survive the compact that superseded " +
        "them (reader grace window)")
    HistoryStore.compact(spark, path)
    val names = dataDirs().map(_.getName).toSet
    assert(names.size === 2 && !names.exists(_.startsWith("b_")) &&
      names.exists(_.startsWith("c_")),
      s"after the next compact only the live tag plus the one-cycle " +
        s"grace copy remain, got ${names.mkString(",")}")
    assert(asSet(HistoryStore.serve(spark, path)) === pre,
      "second compaction changed the dimension")
  }

  test("extend's stored read prunes to the touched buckets") {
    val path = tmpDir("hs-prune") + "/dim"
    HistoryStore.write(early, path, "k", "ts", Seq("state"), Seq("id"),
      nBuckets = 8)
    // one-key batch: the replay input must come from pruned reads —
    // assert via the data actually readable under the key's bucket
    val one = Seq((1L, t(99), 555L, "zz")).toDF("k", "ts", "id", "state")
    HistoryStore.extend(one, path, 1L, "k", "ts", Seq("state"),
      Seq("id"), nBuckets = 8)
    assert(asSet(HistoryStore.serve(spark, path)) ===
      asSet(HistoryOps.scd2(early.unionByName(one), "k", "ts",
        Seq("state"), Seq("id"))))
    // the delta tag (batch 1) holds ONLY the touched key's rows
    val deltaTag = new java.io.File(s"$path/data").listFiles()
      .filter(_.isDirectory).map(_.getName)
      .find(_.endsWith("_1_g0")).get
    val delta = spark.read.parquet(s"$path/data/$deltaTag")
    val deltaKeys = delta.select("k").distinct().collect().map(_.getLong(0))
    assert(deltaKeys.toSeq === Seq(1L),
      s"delta should carry only key 1, got ${deltaKeys.mkString(",")}")
  }

  test("a swap-window crash on the ledger heals and the interrupted " +
    "batch replays") {
    val path = tmpDir("hs-heal") + "/dim"
    HistoryStore.write(early, path, "k", "ts", Seq("state"), Seq("id"))
    // crash between the ledger swap's two renames: batches exists
    // only under .__old_
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$path/batches"),
      java.nio.file.Paths.get(s"$path/batches.__old_999999999999"))
    HistoryStore.extend(late, path, 1L, "k", "ts", Seq("state"),
      Seq("id"))
    assert(asSet(HistoryStore.serve(spark, path)) === asSet(rebuild),
      "extend after a ledger swap-window crash must fold into the " +
        "healed store, not rebootstrap")
  }

  test("purge: logically immediate, frozen until compact, physically " +
    "erased by the compaction cycle, then the key may restart") {
    val path = tmpDir("hs-purge") + "/dim"
    HistoryStore.write(early, path, "k", "ts", Seq("state"), Seq("id"))
    HistoryStore.extend(late, path, 1L, "k", "ts", Seq("state"),
      Seq("id"))
    // logical erasure is immediate on every read path
    HistoryStore.purge(spark, path, Seq(5L, 10L).toDF("uid"))
    assert(asSet(HistoryStore.serve(spark, path)) ===
      asSet(rebuild.filter(!col("k").isin(5L, 10L))))
    val st = HistoryStore.stats(spark, path).head
    assert(st.getAs[Long]("purged_keys") === 2L)
    assert(st.getAs[Long]("keys") === 38L)
    // purged keys are frozen: folding new versions in would interleave
    // them with to-be-erased history
    val forKey5 = Seq((5L, t(99), 901L, "zz")).toDF("k", "ts", "id",
      "state")
    val e = intercept[IllegalArgumentException] {
      HistoryStore.extend(forKey5, path, 2L, "k", "ts", Seq("state"),
        Seq("id"))
    }
    assert(e.getMessage.contains("purged key"))
    // other keys keep folding normally under an active purge list
    val forKey7 = Seq((7L, t(99), 902L, "zz")).toDF("k", "ts", "id",
      "state")
    HistoryStore.extend(forKey7, path, 3L, "k", "ts", Seq("state"),
      Seq("id"))
    val expect = HistoryOps.scd2(
      early.unionByName(late).unionByName(forKey7), "k", "ts",
      Seq("state"), Seq("id")).filter(!col("k").isin(5L, 10L))
    assert(asSet(HistoryStore.serve(spark, path)) === asSet(expect))
    // compact #1 rewrites without the purged rows, but the entries
    // stay (stamped): bytes still sit in the superseded grace dirs,
    // so the freeze holds
    HistoryStore.compact(spark, path)
    assert(asSet(HistoryStore.serve(spark, path)) === asSet(expect))
    assert(HistoryStore.stats(spark, path).head
      .getAs[Long]("purged_keys") === 2L,
      "entries must survive the first compact — their bytes are " +
        "still in the grace dirs")
    intercept[IllegalArgumentException] {
      HistoryStore.extend(forKey5, path, 4L, "k", "ts", Seq("state"),
        Seq("id"))
    }
    // compact #2's opening GC drops the last bytes; entries drop,
    // freeze lifts
    HistoryStore.compact(spark, path)
    assert(HistoryStore.stats(spark, path).head
      .getAs[Long]("purged_keys") === 0L)
    // physical erasure across EVERY store (data, closures, frontier),
    // live and grace dirs alike: no parquet anywhere carries the key
    def hasParquet(d: java.io.File): Boolean =
      d.listFiles().exists(f =>
        (f.isFile && f.getName.endsWith(".parquet")) ||
          (f.isDirectory && hasParquet(f)))
    def rawKeyRows(): Long = Seq("data", "closures", "frontier")
      .flatMap(s => new java.io.File(s"$path/$s").listFiles()
        .filter(d => d.isDirectory && hasParquet(d)).map(d =>
          spark.read.parquet(d.getAbsolutePath).select("k")))
      .reduce(_ unionByName _)
      .filter(col("k").isin(5L, 10L)).count()
    assert(rawKeyRows() === 0L,
      "no byte of the purged keys' history may remain on disk after " +
        "the erasure cycle completes")
    // the key may now restart a fresh history
    HistoryStore.extend(forKey5, path, 5L, "k", "ts", Seq("state"),
      Seq("id"))
    val served5 = HistoryStore.serve(spark, path).filter(col("k") === 5L)
    assert(served5.count() === 1L, "a purged key restarts fresh")
    assert(served5.head.getAs[Int]("version") === 1)
  }

  test("purge-EVERYTHING then compact leaves a servable (empty) " +
    "store; an empty bootstrap batch leaves a servable store") {
    // full right-to-be-forgotten: after the rewrite the only ledgered
    // data tag is empty — it must still carry a schema-bearing file,
    // or every later serve/extend/stats bricks on schema inference
    val path = tmpDir("hs-wipe") + "/dim"
    HistoryStore.write(early, path, "k", "ts", Seq("state"), Seq("id"))
    HistoryStore.purge(spark, path,
      early.select("k").distinct().withColumnRenamed("k", "uid"))
    HistoryStore.compact(spark, path)
    assert(HistoryStore.serve(spark, path).count() === 0L)
    assert(HistoryStore.stats(spark, path).head
      .getAs[Long]("version_rows") === 0L)
    HistoryStore.compact(spark, path) // second cycle still healthy
    assert(HistoryStore.stats(spark, path).head
      .getAs[Long]("purged_keys") === 0L)
    // the wiped store accepts a fresh history
    HistoryStore.extend(late, path, 9L, "k", "ts", Seq("state"),
      Seq("id"))
    assert(asSet(HistoryStore.serve(spark, path)) ===
      asSet(HistoryOps.scd2(late, "k", "ts", Seq("state"), Seq("id"))))
    // and an EMPTY bootstrap batch (a stream's first trigger before
    // any files land) must not brick either
    val p2 = tmpDir("hs-emptyboot") + "/dim"
    HistoryStore.extend(early.filter(lit(false)), p2, 0L, "k", "ts",
      Seq("state"), Seq("id"))
    assert(HistoryStore.serve(spark, p2).count() === 0L)
    HistoryStore.extend(early, p2, 1L, "k", "ts", Seq("state"),
      Seq("id"))
    assert(asSet(HistoryStore.serve(spark, p2)) ===
      asSet(HistoryOps.scd2(early, "k", "ts", Seq("state"), Seq("id"))))
  }

  test("an above-cap purge list switches to the join-based regime and " +
    "runs the SAME full erasure cycle (no driver-side collect)") {
    // cap forced below the purge size: every consumer — serve's
    // anti-join, extend's freeze probe, compact's rewrite AND its
    // erasure accounting — must run join-based and land on the exact
    // state the local regime produces
    val path = tmpDir("hs-purge-big") + "/dim"
    spark.conf.set("spark.graft.history.purgeLocalCap", "10")
    try {
      HistoryStore.write(early, path, "k", "ts", Seq("state"), Seq("id"))
      HistoryStore.extend(late, path, 1L, "k", "ts", Seq("state"),
        Seq("id"))
      // purge 25 of the 40 keys — 2.5× the cap
      val purged = (1L to 25L)
      HistoryStore.purge(spark, path, purged.toDF("uid"))
      // a LAZY serve plan taken now must survive a LATER purge's
      // store swap (writePurged deletes the superseded copy in the
      // same call — no retention window): the list is pinned eagerly
      // at serve time, so the held plan keeps answering from its
      // snapshot instead of breaking on vanished files (or, under
      // ignoreMissingFiles, silently serving erased rows)
      val heldPlan = HistoryStore.serve(spark, path)
      assert(asSet(HistoryStore.serve(spark, path)) ===
        asSet(rebuild.filter(col("k") > 25L)))
      assert(HistoryStore.stats(spark, path).head
        .getAs[Long]("purged_keys") === 25L)
      // freeze holds through the join-based probe
      val e = intercept[IllegalArgumentException] {
        HistoryStore.extend(Seq((17L, t(99), 901L, "zz"))
          .toDF("k", "ts", "id", "state"), path, 2L, "k", "ts",
          Seq("state"), Seq("id"))
      }
      assert(e.getMessage.contains("purged key"))
      // unpurged keys keep folding
      HistoryStore.extend(Seq((30L, t(99), 902L, "zz"))
        .toDF("k", "ts", "id", "state"), path, 3L, "k", "ts",
        Seq("state"), Seq("id"))
      // swap the purge store UNDER the held plan (a re-purge of an
      // already-purged key rewrites the same effective list): the
      // held snapshot must keep answering — this breaks with
      // FileNotFound (or silently serves erased rows) if the
      // join-based list is ever held lazily
      HistoryStore.purge(spark, path, Seq(25L).toDF("uid"))
      assert(asSet(heldPlan) === asSet(rebuild.filter(col("k") > 25L)),
        "a serve plan taken before a purge-store swap must survive it")
      // stats/purge consume the list down to local values: neither
      // may leave the above-cap pin behind (a per-trigger monitoring
      // loop would otherwise accumulate a dead executor-side copy of
      // the list per call). heldPlan's own pin is excluded by taking
      // the snapshot AFTER it.
      val pinned0 = spark.sparkContext.getPersistentRDDs.keySet
      HistoryStore.stats(spark, path).collect()
      HistoryStore.purge(spark, path, Seq(24L).toDF("uid"))
      assert(spark.sparkContext.getPersistentRDDs.keySet === pinned0,
        "stats/purge must release the above-cap purge-list pin")
      // full erasure cycle: compact #1 stamps, compact #2 drops
      HistoryStore.compact(spark, path)
      assert(HistoryStore.stats(spark, path).head
        .getAs[Long]("purged_keys") === 25L)
      HistoryStore.compact(spark, path)
      assert(HistoryStore.stats(spark, path).head
        .getAs[Long]("purged_keys") === 0L)
      val expect = HistoryOps.scd2(
        early.unionByName(late).unionByName(
          Seq((30L, t(99), 902L, "zz")).toDF("k", "ts", "id", "state")),
        "k", "ts", Seq("state"), Seq("id")).filter(col("k") > 25L)
      assert(asSet(HistoryStore.serve(spark, path)) === asSet(expect))
      // erased keys may restart
      HistoryStore.extend(Seq((17L, t(120), 903L, "aa"))
        .toDF("k", "ts", "id", "state"), path, 4L, "k", "ts",
        Seq("state"), Seq("id"))
      assert(HistoryStore.serve(spark, path)
        .filter(col("k") === 17L).count() === 1L)
    } finally spark.conf.unset("spark.graft.history.purgeLocalCap")
  }

  test("a LOSSY purge key (fractional against a bigint dim) rejects " +
    "instead of erasing a key nobody asked to purge") {
    val path = tmpDir("hs-lossy") + "/dim"
    HistoryStore.write(early, path, "k", "ts", Seq("state"), Seq("id"))
    val e = intercept[Exception] {
      HistoryStore.purge(spark, path, Seq(3.7).toDF("uid"))
    }
    val messages = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(8)
      .flatMap(x => Option(x.getMessage)).mkString(" | ")
    assert(messages.contains("does not cast EXACTLY"), messages.take(400))
    // exact-valued doubles still purge (the round-trip is identity)
    HistoryStore.purge(spark, path, Seq(3.0).toDF("uid"))
    assert(HistoryStore.serve(spark, path)
      .filter(col("k") === 3L).count() === 0L)
  }

  test("write over a LIVE store is an atomic wholesale rebuild") {
    val path = tmpDir("hs-rebuild") + "/dim"
    HistoryStore.write(early, path, "k", "ts", Seq("state"), Seq("id"))
    HistoryStore.extend(late, path, 1L, "k", "ts", Seq("state"),
      Seq("id"))
    // rebuild from the early log only: committed dirs are never
    // overwritten in place — the new generation stages and swaps
    HistoryStore.write(early, path, "k", "ts", Seq("state"), Seq("id"))
    assert(asSet(HistoryStore.serve(spark, path)) ===
      asSet(HistoryOps.scd2(early, "k", "ts", Seq("state"), Seq("id"))))
    assert(HistoryStore.stats(spark, path).head
      .getAs[Long]("applied_batches") === 1L,
      "a rebuild replaces the ledger wholesale")
  }

  test("a null purge key rejects loudly") {
    val path = tmpDir("hs-purge-null") + "/dim"
    HistoryStore.write(early, path, "k", "ts", Seq("state"), Seq("id"))
    val e = intercept[Exception] {
      HistoryStore.purge(spark, path,
        Seq(Option(3L), Option.empty[Long]).toDF("uid"))
    }
    val messages = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(8)
      .flatMap(x => Option(x.getMessage)).mkString(" | ")
    assert(messages.contains("null purge key"), messages.take(400))
    // a key that does not cast cleanly to the dimension key type is a
    // silent non-erasure (lossy join coercion) — reject loudly too
    val e2 = intercept[Exception] {
      HistoryStore.purge(spark, path, Seq("not-a-number").toDF("uid"))
    }
    val m2 = Iterator.iterate(e2: Throwable)(_.getCause)
      .takeWhile(_ != null).take(8)
      .flatMap(x => Option(x.getMessage)).mkString(" | ")
    assert(m2.contains("does not cast"), m2.take(400))
  }

  test("a null dimension key rejects loudly at first contact") {
    // every reconstruction/delta join is a null-rejecting equi-join —
    // a null key would silently vanish from serves and duplicate on
    // every extend, so the bucket column tripwires instead
    val path = tmpDir("hs-null") + "/dim"
    val withNull = early.unionByName(
      Seq((Option.empty[Long], t(99), 9L, "sx"))
        .toDF("k", "ts", "id", "state"))
    val e = intercept[Exception] {
      HistoryStore.write(withNull, path, "k", "ts", Seq("state"),
        Seq("id"))
    }
    val messages = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(8)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(messages.contains("null dimension key"), messages.take(400))
  }

  test("streaming ingest equals the one-shot build") {
    import graft.streaming.StreamingPipeline
    val path = tmpDir("hs-stream") + "/dim"
    val corpus = early.unionByName(late).localCheckpoint()
    val src = tmpDir("hs-stream-src")
    // time-sliced files so each trigger is an append-only batch
    Seq(corpus.filter(col("ts") <= t(20)),
        corpus.filter(col("ts") > t(20) && col("ts") <= t(40)),
        corpus.filter(col("ts") > t(40)))
      .foreach(_.coalesce(1).write.mode("append").parquet(src))
    val stream = spark.readStream.schema(corpus.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    StreamingPipeline.historyIngestStream(stream, path,
      tmpDir("hs-stream-ckpt"), "k", "ts", Seq("state"), Seq("id"))
      .awaitTermination()
    assert(asSet(HistoryStore.serve(spark, path)) === asSet(rebuild),
      "trigger-by-trigger maintenance diverged from the one-shot build")
    assert(HistoryStore.stats(spark, path).head
      .getAs[Long]("applied_batches") === 3L)
  }

  test("bucket geometry follows the measured dimension size; served " +
    "frames are identical across geometries; Auto extend adopts the " +
    "store's frozen geometry") {
    def bucketDirs(path: String): Int = {
      val d = new java.io.File(s"$path/data")
      d.listFiles().filter(_.isDirectory).flatMap(
        _.listFiles().filter(f => f.isDirectory &&
          f.getName.startsWith("bkp="))).map(_.getName).distinct.length
    }
    // small dim under Auto: one bucket directory, not 64
    val small = tmpDir("hs-geo-small") + "/dim"
    HistoryStore.write(early, small, "k", "ts", Seq("state"), Seq("id"))
    assert(bucketDirs(small) === 1,
      "a 120-row dimension must not be written 64-way")
    // Auto extend adopts the frozen geometry (no declared-count reject)
    HistoryStore.extend(late, small, batchId = 1L, "k", "ts",
      Seq("state"), Seq("id"))
    // the historical geometry is reproducible via the conf, and the
    // served frame is identical across geometries
    val wide = tmpDir("hs-geo-wide") + "/dim"
    HistoryStore.write(early, wide, "k", "ts", Seq("state"), Seq("id"),
      nBuckets = 64)
    assert(bucketDirs(wide) > 1)
    HistoryStore.extend(late, wide, batchId = 1L, "k", "ts",
      Seq("state"), Seq("id"), nBuckets = 64)
    assert(asSet(HistoryStore.serve(spark, small)) ===
      asSet(HistoryStore.serve(spark, wide)))
    assert(asSet(HistoryStore.serve(spark, small)) === asSet(rebuild))
    // an explicit count against a mismatched store still rejects
    intercept[IllegalArgumentException] {
      HistoryStore.extend(late, small, batchId = 2L, "k", "ts",
        Seq("state"), Seq("id"), nBuckets = 64)
    }
  }

  test("compact re-chooses an Auto store's geometry from the grown " +
    "dimension; explicit stores and ledger replay are untouched") {
    def bucketDirs(path: String): Int = {
      val d = new java.io.File(s"$path/data")
      d.listFiles().filter(_.isDirectory).flatMap(
        _.listFiles().filter(f => f.isDirectory &&
          f.getName.startsWith("bkp="))).map(_.getName).distinct.length
    }
    // force a tiny rowsPerBucket so the 240-row rebuild wants >1
    // buckets — the mechanism under test, not the production dial
    spark.conf.set("spark.graft.history.rowsPerBucket", "60")
    try {
      val path = tmpDir("hs-geo-compact") + "/dim"
      // bootstrap from the SMALL first batch: freezes a narrow geometry
      HistoryStore.extend(early.limit(20), path, batchId = 0L, "k", "ts",
        Seq("state"), Seq("id"))
      val narrow = bucketDirs(path)
      HistoryStore.extend(early.join(early.limit(20),
        Seq("k", "ts", "id", "state"), "left_anti"), path, 1L, "k", "ts",
        Seq("state"), Seq("id"))
      HistoryStore.extend(late, path, 2L, "k", "ts",
        Seq("state"), Seq("id"))
      // compact: the Auto store's geometry follows the measured size
      HistoryStore.compact(spark, path)
      assert(bucketDirs(path) > narrow,
        "compact must widen an Auto store's degenerate bootstrap geometry")
      assert(asSet(HistoryStore.serve(spark, path)) === asSet(rebuild))
      // ledger pairs preserved across the migration: replay is a no-op
      HistoryStore.extend(late, path, 2L, "k", "ts",
        Seq("state"), Seq("id"))
      assert(asSet(HistoryStore.serve(spark, path)) === asSet(rebuild))
      // an EXPLICITLY-bucketed store keeps its caller contract
      val ex = tmpDir("hs-geo-explicit") + "/dim"
      HistoryStore.write(early, ex, "k", "ts", Seq("state"), Seq("id"),
        nBuckets = 2)
      HistoryStore.compact(spark, ex)
      assert(bucketDirs(ex) <= 2,
        "compact must not migrate an explicitly-bucketed store")
    } finally spark.conf.unset("spark.graft.history.rowsPerBucket")
  }
}
