package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

import graft.core.ParquetTable

/** Store plumbing shared by the two persisted indexes
  * ([[BandIndex]], [[VectorIndex]]) — ONE implementation of the
  * tombstone lifecycle, the committed-data presence check, and the
  * staged root swap, so a fix to either index's machinery cannot
  * silently miss its twin (the `BenchUtil.parquetDataFiles` stance).
  */
private[graft] object IndexStores {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** A store "exists" iff it holds at least one COMMITTED parquet data
    * file. Directory existence alone lies after a killed first write:
    * the output committer creates the directory at job setup, so a
    * crash before any task commit leaves an empty (or
    * `_temporary`-only) dir — judging presence by it would send every
    * later read into an unreadable store and brick the index. Checked
    * after healing a swap-window crash ([[ParquetTable.exists]]
    * restores a store left only under its `.__old_` name).
    */
  def hasStore(spark: SparkSession, dir: String): Boolean = {
    ParquetTable.exists(spark, dir) // heals .__old_-only; false if absent
    val f = fs(spark, dir)
    val p = new Path(dir)
    f.exists(p) && {
      val it = f.listFiles(p, true)
      var found = false
      while (!found && it.hasNext) {
        val s = it.next()
        found = s.getPath.getName.endsWith(".parquet") &&
          !s.getPath.toString.contains("_temporary")
      }
      found
    }
  }

  /** Read a store, first healing the staged-swap crash window (a kill
    * between `rename(store, old)` and `rename(staging, store)` leaves
    * the store only under `.__old_`; [[ParquetTable.exists]] restores
    * the newest such copy — without it the documented
    * "replaying compaction is a no-op" recovery could never run).
    */
  def readStore(spark: SparkSession, dir: String): DataFrame = {
    ParquetTable.exists(spark, dir)
    spark.read.parquet(dir)
  }

  /** Per-JVM memo of tiny, driver-collected store artifacts (one-row
    * meta tables, tag ledgers): un-memoized, each read is a full
    * Spark job for a constant-sized result, and a store-serving query
    * path pays 3–6 of them per call before touching any data
    * (optimization r13, guide §5.2 — driver-blocking launches
    * serialize the whole read). Fenced by the directory's FILE
    * LISTING (name/size/mtime of every entry): every committed
    * rewrite of these artifacts lands via staged write + atomic
    * rename with fresh randomized part-file names, so ANY rewrite —
    * this JVM or a concurrent process — changes the fingerprint and
    * forces a re-read; no invalidation hook to forget. An absent dir
    * is never cached (a store can be created later).
    */
  private val tinyReadCache = new java.util.concurrent.ConcurrentHashMap[
    String, (String, Seq[org.apache.spark.sql.Row], Long)]()
  // approximate retained bytes (per-entry on-disk dir size — an upper
  // proxy for the collected rows that matters exactly for the entries
  // that matter: serialized sketch blobs): the cache must stay a
  // bounded accelerator, not a monotonic leak across every store path
  // a long-lived session ever touches (review finding). Crossing the
  // cap clears the whole map — correct (it is a pure cache; the next
  // read repopulates) and rare at the default 256 MB.
  private val tinyReadBytes = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Test probe: (entries, accounted bytes) of the tiny-read memo — the
    * byte-accounting spec pins that rewrites of one store never charge
    * the budget cumulatively (which would clear unrelated entries).
    */
  private[graft] def tinyReadStats: (Int, Long) =
    (tinyReadCache.size, tinyReadBytes.get)
  private def tinyCacheCap(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.store.tinyCacheBytes")
      .map(_.toLong).getOrElse(256L * 1024 * 1024)

  private def dirListing(spark: SparkSession,
      dir: String): Option[Array[org.apache.hadoop.fs.FileStatus]] = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) None else Some(f.listStatus(p))
  }

  private def fingerprintOf(
      ls: Array[org.apache.hadoop.fs.FileStatus]): String =
    ls.map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      .sorted.mkString("|")

  /** Total on-disk bytes of a store directory (None when absent) — the
    * byte gate callers use to decide whether [[readTinyStore]] may
    * collect the table at all (optimization r14: the purge-list memo).
    */
  private[graft] def tinyStoreBytes(spark: SparkSession,
      dir: String): Option[Long] =
    dirListing(spark, dir).map(_.map(_.getLen).sum)

  /** EXACT row count of a parquet store from the file footers — a
    * driver-side metadata read (no Spark job), one footer per data
    * file. This is the guard that lets a caller refuse to collect a
    * byte-tiny store whose ROW count is huge (review r14: delta/RLE
    * encoding can pack millions of long-pair rows under any byte
    * gate, and a collect of those rows is exactly the driver-heap
    * cliff the row caps exist to prevent). None when the dir is
    * absent.
    */
  private[graft] def parquetFooterRows(spark: SparkSession,
      dir: String): Option[Long] =
    dirListing(spark, dir).map { ls =>
      val conf = spark.sessionState.newHadoopConf()
      ls.filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .map { f =>
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile
              .fromStatus(f, conf))
          try r.getRecordCount finally r.close()
        }.sum
    }

  /** Collect a bounded-tiny store table through the fingerprint memo.
    * Heals the `.__old_`-only crash window first (the [[readStore]]
    * contract). Rows keep their schema ([[GenericRowWithSchema]]), so
    * callers can still probe optional columns.
    */
  def readTinyStore(spark: SparkSession,
      dir: String): Seq[org.apache.spark.sql.Row] = {
    ParquetTable.exists(spark, dir)
    dirListing(spark, dir) match {
      case None => // let the parquet reader raise the canonical error
        spark.read.parquet(dir).collect().toSeq
      case Some(ls) =>
        val fp = fingerprintOf(ls)
        val cached = tinyReadCache.get(dir)
        if (cached != null && cached._1 == fp) cached._2
        else {
          val rows = spark.read.parquet(dir).collect().toSeq
          val bytes = ls.map(_.getLen).sum
          // replacing a stale entry must return its bytes to the budget
          // (optimization r14, VERDICT r13 #3): without the subtraction a
          // store rewritten N times charges N× its size and forces
          // premature whole-cache clears in exactly the long-lived-session
          // case the bound exists for
          val prev = tinyReadCache.put(dir, (fp, rows, bytes))
          val delta = bytes - (if (prev == null) 0L else prev._3)
          if (tinyReadBytes.addAndGet(delta) > tinyCacheCap(spark)) {
            tinyReadCache.clear()
            tinyReadBytes.set(bytes)
            tinyReadCache.put(dir, (fp, rows, bytes))
          }
          rows
        }
    }
  }

  /** Append ids to the store's tombstone table (logical delete). */
  def tombstone(spark: SparkSession, path: String, ids: Seq[Long],
                idCol: String): Unit = {
    import spark.implicits._
    ids.toDF(idCol).coalesce(1)
      .write.mode("append").parquet(s"$path/tombstones")
  }

  def hasTombstones(spark: SparkSession, path: String): Boolean =
    hasStore(spark, s"$path/tombstones")

  private def tombstoneIds(spark: SparkSession, path: String,
                           idCol: String): DataFrame =
    readStore(spark, s"$path/tombstones").select(idCol).distinct()

  /** Anti-join the tombstoned ids out of `df` (broadcast — the list is
    * bounded by deletes since the last compaction); `df` unchanged
    * when no tombstones exist.
    */
  def survivors(spark: SparkSession, path: String, df: DataFrame,
                idCol: String): DataFrame =
    if (hasTombstones(spark, path))
      df.join(broadcast(tombstoneIds(spark, path, idCol)),
        Seq(idCol), "left_anti")
    else df

  /** Reject an append whose batch contains a currently-tombstoned id:
    * the same anti-join that hides its old rows would hide the new
    * ones, and the next compaction would drop BOTH — silent loss.
    * Bounded probe: broadcast tombstone list, first hit only.
    */
  def rejectTombstoned(spark: SparkSession, path: String,
                       batchIds: DataFrame, idCol: String,
                       op: String): Unit =
    if (hasTombstones(spark, path)) {
      val hit = batchIds.select(idCol)
        .join(broadcast(tombstoneIds(spark, path, idCol)),
          Seq(idCol), "left_semi")
        .limit(1).collect()
      if (hit.nonEmpty)
        throw new IllegalArgumentException(
          s"$op: $idCol=${hit(0).getLong(0)} is tombstoned — " +
            "run compaction before re-adding a deleted id")
    }

  /** Drop the tombstone table (the last step of a compaction). */
  def clearTombstones(spark: SparkSession, path: String): Unit = {
    val p = new Path(s"$path/tombstones")
    val f = fs(spark, path)
    if (f.exists(p)) f.delete(p, true)
  }

  /** A staging root for a full index rebuild: the caller writes every
    * store under the returned path, then [[swapInto]] makes the new
    * generation visible atomically — the OLD index stays readable
    * until the replacement is complete, so a failed rebuild (OOM, bad
    * input, preemption) leaves consumers on the previous generation
    * instead of on rubble. Same rename dance + `.__old_` recovery
    * convention as [[ParquetTable.overwriteAtomic]].
    */
  def stagingFor(spark: SparkSession, path: String): String = {
    // GC dead staged dirs first: a rebuild that died mid-staging-write
    // (the longest phase) leaves a near-full-index-size leak that no
    // later rebuild would reuse (fresh stamp every time) — and a
    // stale `.__old_` beside a LIVE index is a swap whose final delete
    // failed, which crash recovery could later resurrect as the index
    ParquetTable.cleanStaleStaged(fs(spark, path), new Path(path))
    path + s".__staging_${ParquetTable.stamp()}"
  }

  /** Heal the INDEX ROOT's swap window: [[swapInto]] can die between
    * its two renames, leaving the whole index only under `.__old_` —
    * [[ParquetTable.exists]] restores the newest such copy. Called at
    * every public entry point; per-store `.__old_` windows (compact's
    * per-store swaps) are healed by [[readStore]]/[[hasStore]].
    */
  def healRoot(spark: SparkSession, path: String): Unit = {
    ParquetTable.exists(spark, path)
    ()
  }

  /** Heal ONE store's swap window explicitly (the `.__old_`-only crash
    * shape [[hasStore]] repairs as a side effect of its probe) and
    * REQUIRE the store present — the writer-side precondition an
    * append asserts before writing into the directory. Exists so call
    * sites that need the heal don't invoke `hasStore` and discard the
    * boolean: the intent is invisible there, and an absent store would
    * silently fall through to a bare append.
    */
  def healStoreRequired(spark: SparkSession, dir: String): Unit =
    require(hasStore(spark, dir),
      s"store at $dir is absent or holds no committed parquet data " +
        "— build it (write) before appending to it")

  /** Swap a staged rebuild in — the ONE swap protocol
    * ([[ParquetTable.swap]]) shared with the table overwrites, so a
    * hardening of the rename dance cannot miss one of its call sites.
    */
  def swapInto(spark: SparkSession, path: String, staging: String): Unit =
    ParquetTable.swap(fs(spark, path), new Path(path), new Path(staging))

  /** Operational stats for an index's stores — the compaction policy
    * dial (USAGE.md: "compact when fragment files reach a few × the
    * directory count") as a QUERYABLE op a pipeline can monitor or
    * alert on. Pure driver-side listing for files/dirs (no data read;
    * committed files only, the [[hasStore]] notion) plus the bounded
    * tombstone count. One row per existing store:
    * `(store, data_files, partition_dirs, fragmentation,
    * tombstoned_ids)` — fragmentation = files/dirs, 1.0 when fully
    * compacted.
    */
  def stats(spark: SparkSession, path: String, stores: Seq[String],
            idCol: String): DataFrame = {
    import spark.implicits._
    val tombstoned =
      if (hasTombstones(spark, path))
        tombstoneIds(spark, path, idCol).count()
      else 0L
    stores.flatMap { s =>
      val dir = s"$path/$s"
      if (!hasStore(spark, dir)) None
      else {
        val f = fs(spark, dir)
        val p = new Path(dir)
        val dirs = math.max(1,
          f.listStatus(p).count(st =>
            st.isDirectory && st.getPath.getName.contains("=")))
        var files = 0
        val it = f.listFiles(p, true)
        while (it.hasNext) {
          val st = it.next()
          if (st.getPath.getName.endsWith(".parquet") &&
              !st.getPath.toString.contains("_temporary")) files += 1
        }
        Some((s, files.toLong, dirs.toLong,
          files.toDouble / dirs, tombstoned))
      }
    }.toDF("store", "data_files", "partition_dirs", "fragmentation",
      "tombstoned_ids")
  }

  // ---- tag-ledger machinery (shared by the delta-tag stores:
  // HistoryStore, RollupStore) --------------------------------------

  /** THE ledger-fenced curation-trigger skeleton every sketch-backed
    * streaming curation shares (novelty curation, domain quota, URL
    * dedup — third-review finding: three hand copies meant every
    * hardening of the replay posture had to land three times). One
    * implementation of the invariant chain:
    *
    *  1. heal the store root, read the (producer, batchId) ledger —
    *     a LEDGERED trigger returns before touching anything (its
    *     output landed before the extend committed; re-scoring
    *     against the extended store would flip verdicts);
    *  2. pin the batch (localCheckpoint) and `compute` the kept rows
    *     against the CURRENT store state (`bootstrapped` tells the
    *     first trigger apart — an absent store has seen nothing);
    *  3. land the kept rows under the producer-scoped tag dir
    *     (idempotent overwrite + schema-bearing guarantee), THEN
    *  4. `extendKept` folds them into the store, ledger-fenced by the
    *     store's own extend — so a crash between 3 and 4 replays
    *     deterministically (store unchanged ⇒ identical verdicts ⇒
    *     byte-identical overwrite).
    *
    * Checkpoint bookkeeping (the releaseNewRdds discipline) wraps the
    * whole step. `compute`'s result is pinned before the write so the
    * extend re-reads the landed decision, not a recomputation.
    */
  def fencedCurationStep(batch: DataFrame, storePath: String,
      outDir: String, batchId: Long, producer: String,
      presenceDir: String = "sketch")
      (compute: (DataFrame, Boolean) => DataFrame)
      (extendKept: DataFrame => Unit): Unit = {
    val spark = batch.sparkSession
    healRoot(spark, storePath)
    // presenceDir: the store subdir whose committed data means "the
    // store exists" — `sketch` for the single-blob sketch stores,
    // `meta` for the sharded membership store's ctl root (its blobs
    // live beside the ctl, one dir per shard)
    val bootstrapped = hasStore(spark, s"$storePath/$presenceDir")
    if (bootstrapped && rangesApplied(sketchRanges(spark, storePath),
        producer, batchId))
      return // fully applied: output landed before the extend committed
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    try {
      val b = batch.localCheckpoint(true)
      val kept = compute(b, bootstrapped).localCheckpoint(true)
      val dir = s"$outDir/${tagFor(producer, batchId)}"
      kept.write.mode("overwrite").parquet(dir)
      forceSchemaBearing(kept, dir)
      extendKept(kept)
    } finally graft.BenchUtil.releaseNewRdds(sc, before)
  }

  /** The per-batch tag a delta-tag store writes its delta under:
    * producer-scoped (md5 prefix — a bare foreachBatch id is monotonic
    * only per checkpoint, so two streams' batch 0 would collide), with
    * a `_g0` generation suffix [[compactGen]] parses past (md5 hex
    * contains no 'g').
    */
  def tagFor(producer: String, batchId: Long): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(producer.getBytes("UTF-8")).map("%02x".format(_))
      .mkString.take(8)
    s"b_${h}_${batchId}_g0"
  }

  // ---- ledger range codec (VERDICT r12 #7): both applied-batch
  // ledgers grow one row per trigger for the store's LIFETIME, and
  // every extend collects them. The on-disk form now folds each
  // producer's CONTIGUOUS id runs into one (lo, hi) range row — a
  // streaming producer's ids are consecutive, so a year of triggers
  // is ONE row per producer (per tag, for the tag ledger after its
  // data compaction unifies tags) and the per-trigger ledger scan
  // stays flat. The fold is EXACT, not a monotonicity assumption:
  // only ids that actually applied land inside a range (gaps split
  // ranges), so replay fencing round-trips identically — the codec
  // is invisible to every store. Residual: the EXPANDED in-memory
  // list is still linear in applied batches (unchanged from before);
  // at millions of triggers the driver list is the next dial.

  /** Fold per-id pairs into maximal contiguous ranges per group. */
  private def foldRanges[G](pairs: Seq[(G, Long)]): Seq[(G, Long, Long)] =
    pairs.groupBy(_._1).toSeq.flatMap { case (g, ps) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[(G, Long, Long)]
      for (id <- ps.map(_._2).distinct.sorted) {
        if (out.nonEmpty && out.last._3 == id - 1L) {
          val last = out.remove(out.length - 1)
          out += ((g, last._2, id))
        } else out += ((g, id, id))
      }
      out.toSeq
    }

  /** The applied-batch ledger `(producer, batch_id, tag)` — the
    * delta-tag stores' single commit point. Empty if never committed.
    * Range rows (post-codec stores) expand back to per-id tuples;
    * pre-codec stores (no `lo_id` column) read as-is.
    */
  def tagLedger(spark: SparkSession,
      path: String): Seq[(String, Long, String)] =
    if (!hasStore(spark, s"$path/batches")) Seq.empty
    else {
      // fingerprint-memoized (optimization r13): the ledger is read on
      // EVERY serve/extend/compact and is a handful of rows — see
      // [[readTinyStore]]
      val rows = readTinyStore(spark, s"$path/batches")
      val hasLo = rows.headOption.exists(
        _.schema.fieldNames.contains("lo_id"))
      rows.flatMap { r =>
        val (p, hi, t) = (r.getString(0), r.getLong(1), r.getString(2))
        val lo = if (hasLo) r.getAs[Long]("lo_id") else hi
        (lo to hi).map(i => (p, i, t))
      }.sortBy(r => (r._1, r._2))
    }

  /** Commit the full applied list atomically (staged write + swap) —
    * THE commit point: deltas staged under their tags are invisible
    * until their pair lands here. Folded on disk: contiguous ids of
    * one (producer, tag) become a single range row.
    */
  def commitTagLedger(spark: SparkSession, path: String,
      applied: Seq[(String, Long, String)]): Unit = {
    import spark.implicits._
    val folded = foldRanges(applied.map(r => ((r._1, r._3), r._2)))
      .map { case ((p, t), lo, hi) => (p, hi, t, lo) }
      .sortBy(r => (r._1, r._4))
    val staging = stagingFor(spark, s"$path/batches")
    folded.toDF("producer", "batch_id", "tag", "lo_id").coalesce(1)
      .write.mode("overwrite").parquet(staging)
    swapInto(spark, s"$path/batches", staging)
  }

  /** The next compaction generation: max over every ledgered tag's
    * `g<N>` suffix, plus one.
    */
  def compactGen(applied: Seq[(String, Long, String)]): Long =
    applied.map(_._3).map(t =>
      t.substring(t.lastIndexOf('g') + 1).toLong).max + 1L

  /** Delete every tag directory under `stores` that no CURRENT ledger
    * tag references — the delta-tag stores' grace-window GC: the
    * compact that supersedes a tag leaves it on disk (a reader's lazy
    * plan still resolves its files), and the NEXT compact's opening
    * sweep collects it, along with any crashed compact's uncommitted
    * tag.
    */
  def gcUnreferencedTags(spark: SparkSession, path: String,
      stores: Seq[String], live: Set[String]): Unit = {
    // session conf, not the shared context conf: per-session fs.*
    // overrides (object-store credentials) must govern the DELETE
    // path exactly as they govern the stores' read paths
    val f = new Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    for (store <- stores;
         d <- Option(f.globStatus(new Path(s"$path/$store/*")))
           .getOrElse(Array.empty)
         if !live.contains(d.getPath.getName))
      f.delete(d.getPath, true)
  }

  /** Whether `dir` holds at least one parquet file, flat or one
    * partition level down — the empty-write probe every tag store
    * shares (ONE implementation; the empty-dir edge keeps biting and
    * a hardening must not miss a twin).
    */
  def hasParquetFiles(spark: SparkSession, dir: String): Boolean = {
    val f = new Path(dir).getFileSystem(
      spark.sessionState.newHadoopConf())
    Seq("*/*.parquet", "*.parquet").exists(g =>
      Option(f.globStatus(new Path(dir, g))).exists(_.nonEmpty))
  }

  /** Guarantee `dir` (just written from `df`) carries a SCHEMA-BEARING
    * parquet file: an empty write — plain or `partitionBy` — leaves a
    * fileless directory schema inference cannot read, which a later
    * read turns into a store-wide brick (a ledgered tag no reader can
    * open). The rewrite is plain (unpartitioned): a partitioned empty
    * write emits nothing however it is repartitioned, and readers of
    * these stores resolve the partition column by NAME either way.
    */
  def forceSchemaBearing(df: DataFrame, dir: String): Unit =
    if (!hasParquetFiles(df.sparkSession, dir))
      df.repartition(1).write.mode("overwrite").parquet(dir)

  /** The (producer, batchId) applied-batch ledger the single-object
    * SKETCH stores ([[FrequencyStore]], [[MembershipStore]],
    * [[ShardedMembershipStore]]) share — distinct from [[tagLedger]]'s
    * delta-tag form. Range rows expand; pre-codec stores read as-is.
    * For the per-trigger FENCE path prefer [[sketchRanges]] +
    * [[rangesApplied]] — no expansion, O(ranges) memory however many
    * triggers applied.
    */
  def sketchBatches(spark: SparkSession,
      path: String): Seq[(String, Long)] =
    sketchRanges(spark, path).flatMap { case (p, lo, hi) =>
      (lo to hi).map(p -> _)
    }.sorted

  /** The sketch ledger in its RANGE form, unexpanded — what the
    * per-trigger fence should hold: a streaming producer's lifetime
    * is ONE range however many triggers it applied (the expansion in
    * [[sketchBatches]] was the last linear-in-triggers driver cost).
    */
  def sketchRanges(spark: SparkSession,
      path: String): Seq[(String, Long, Long)] =
    if (!hasStore(spark, s"$path/batches")) Seq.empty
    else {
      // fingerprint-memoized (optimization r13) — [[readTinyStore]]
      val rows = readTinyStore(spark, s"$path/batches")
      val hasLo = rows.headOption.exists(
        _.schema.fieldNames.contains("lo_id"))
      rows.map { r =>
        val (p, hi) = (r.getString(0), r.getLong(1))
        val lo = if (hasLo) r.getAs[Long]("lo_id") else hi
        (p, lo, hi)
      }.sortBy(r => (r._1, r._2))
    }

  /** Whether (producer, id) lies inside the applied ranges. */
  def rangesApplied(ranges: Seq[(String, Long, Long)],
      producer: String, id: Long): Boolean =
    ranges.exists(r => r._1 == producer && r._2 <= id && id <= r._3)

  /** Add one applied id to the range set (merging contiguously). */
  def rangesAdd(ranges: Seq[(String, Long, Long)], producer: String,
      id: Long): Seq[(String, Long, Long)] =
    foldRangeRows(ranges :+ ((producer, id, id)))

  /** Total applied batches across the ranges (the stats count). */
  def rangesCount(ranges: Seq[(String, Long, Long)]): Long =
    ranges.map(r => r._3 - r._2 + 1L).sum

  /** Merge overlapping/adjacent ranges per producer — the write-side
    * normal form (also heals any duplicate coverage defensively).
    */
  private def foldRangeRows(
      ranges: Seq[(String, Long, Long)]): Seq[(String, Long, Long)] =
    ranges.groupBy(_._1).toSeq.flatMap { case (p, rs) =>
      val sorted = rs.sortBy(_._2)
      val out = scala.collection.mutable
        .ArrayBuffer.empty[(String, Long, Long)]
      for ((_, lo, hi) <- sorted) {
        if (out.nonEmpty && lo <= out.last._3 + 1L) {
          val last = out.remove(out.length - 1)
          out += ((p, last._2, math.max(last._3, hi)))
        } else out += ((p, lo, hi))
      }
      out.toSeq
    }.sortBy(r => (r._1, r._2))

  /** Stage one complete single-artifact store generation (payload +
    * meta + ledger) under one root and swap it in atomically — ONE
    * publish implementation for every store of this shape (the sketch
    * blobs, [[ReservoirStore]]'s sample table), so the ledger and the
    * artifact stay inseparable and a hardening of the staging/swap
    * dance cannot miss a twin. `writePayload` receives the staging
    * root and writes the store's own artifact under it.
    */
  def publishGeneration(spark: SparkSession, path: String,
      writePayload: String => Unit, meta: DataFrame,
      batches: Seq[(String, Long, Long)]): Unit = {
    import spark.implicits._
    val staging = stagingFor(spark, path)
    writePayload(staging)
    meta.coalesce(1).write.mode("overwrite").parquet(s"$staging/meta")
    if (batches.nonEmpty) {
      // range-folded on disk (see the ledger codec note above): a
      // streaming producer's contiguous ids stay ONE row however many
      // triggers the store absorbs; the stores pass ranges end-to-end
      // (sketchRanges/rangesAdd), so nothing linear-in-triggers is
      // ever materialized
      val folded = foldRangeRows(batches)
        .map { case (p, lo, hi) => (p, hi, lo) }
        .sortBy(r => (r._1, r._3))
      folded.toDF("producer", "batch_id", "lo_id").coalesce(1)
        .write.mode("overwrite").parquet(s"$staging/batches")
    }
    swapInto(spark, path, staging)
  }

  /** [[publishGeneration]] with the single-object sketch payload
    * (both sketch stores' shape).
    */
  def publishSketchGeneration(spark: SparkSession, path: String,
      sketch: Array[Byte], meta: DataFrame,
      batches: Seq[(String, Long, Long)]): Unit = {
    import spark.implicits._
    publishGeneration(spark, path, staging =>
      Seq(Tuple1(sketch)).toDF("sketch").coalesce(1)
        .write.mode("overwrite").parquet(s"$staging/sketch"),
      meta, batches)
  }

  /** The pruned presence probe both indexes' incremental appends share:
    * the store rows (all columns) whose `idCol` appears in the
    * (bounded, broadcast) batch, read only from the partitions named in
    * `pruneVals`. An empty prune list short-circuits to empty — `isin()`
    * of zero values must never widen to a full-store scan.
    */
  def presentRows(spark: SparkSession, storePath: String,
                  pruneCol: String, pruneVals: Seq[Any],
                  idCol: String, batchIds: DataFrame): DataFrame = {
    val store = readStore(spark, storePath)
    (if (pruneVals.isEmpty) store.filter(lit(false))
     else store.filter(col(pruneCol).isin(pruneVals: _*)))
      .join(broadcast(batchIds.select(idCol).distinct()),
        Seq(idCol), "left_semi")
  }
}
