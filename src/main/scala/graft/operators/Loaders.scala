package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._

/** Method-routed load (reference `loader_default.go:9-72`): bucket the
  * batch by its `_method` column — INSERT / REPLACE / REMOVE, unknown →
  * REPLACE (`loader_default.go:20-26`) — and apply each bucket to the
  * destination parquet table.
  *
  *  - INSERT  → plain append (`batched_queries.go:14-16`): no rewrite,
  *    no shuffle, scales with the batch only.
  *  - REPLACE → MERGE-shaped upsert emulation: `target LEFT ANTI JOIN
  *    touchedKeys` ∪ new rows (`batched_queries.go:21-23` semantics).
  *  - REMOVE  → the same anti-join with no replacement rows
  *    (`batched_queries.go:28-74`).
  *
  * REPLACE and REMOVE are folded into ONE rewrite pass per batch (one
  * anti-join, one atomic swap) — SURVEY §7.4 H4's "one MERGE-shaped
  * plan", so a REMOVE-then-reINSERT of the same PK in one batch resolves
  * by method, not by file-write ordering. The touched-key set is ≤ batch
  * size, so the anti-join broadcasts the keys and the target table
  * streams through without a shuffle.
  *
  * Destination layout (SURVEY §7.4 H1): upsert-bearing tables migrate
  * to a PK-hash-bucketed directory layout ONCE bucketing can actually
  * prune. The balls-in-bins math decides: a batch of k random PKs over
  * n buckets touches n·(1−e^(−k/n)) of them, so the rewritten fraction
  * only drops below 1 when n ≫ k — a 32-bucket table under 1000-row
  * batches rewrites EVERYTHING every batch and pays the partitioned
  * write overhead on top (measured 3× slower than flat in DrainBench).
  * Auto policy therefore: tables START FLAT; when a rewrite-bearing
  * load finds the flat table has grown to where
  * `bytes / TargetBytesPerBucket ≥ PruneWorthyFactor × batch-keys`, it
  * migrates to n = 2^⌈log2(bytes/TargetBytesPerBucket)⌉ buckets (capped
  * at [[MaxAutoBuckets]]) in one rewrite and writes the marker. From
  * then on a rewrite touches ≈ k buckets out of n; at 100 TB that is
  * the 65k-bucket cap (~1.5 GB each) and a 1k batch rewrites ~1.5% of
  * the table instead of all of it. The growth probe is a filesystem
  * content summary, not a Spark job — flat small tables pay nothing. The layout is self-describing
  * (a [[graft.core.ParquetTable.BucketMarker]] file records the count),
  * which also lets the queue extractor prune its lookup joins. Layout
  * resolution: an existing marker is LAW (a config value disagreeing
  * with the physical hash partitioning would corrupt pruning); an
  * explicit `PartitionBuckets` pins the layout at creation; insert-only
  * tables stay flat (appends never rewrite; bucketing them would only
  * fragment files).
  *
  * Schema evolution: upsert batches may add or omit columns relative to
  * the destination (`allowMissingColumns` union) — absent sides fill
  * with NULL, the dynamic-schema posture the reference gets from MySQL
  * defaults (`types.go:58-61` schema-free rows).
  */
object MethodRoutedLoader {

  /** Partition column for bucketed destinations — a system column,
    * dropped by consumers that want the logical schema.
    */
  val BucketCol = "_bucket"

  /** Auto-migration granule: buckets are sized to hold about this many
    * BYTES of parquet (big enough that files stay healthy, small enough
    * that a touched bucket is cheap to rewrite). Bytes, not rows,
    * because the trigger must cost nothing per batch — a filesystem
    * content summary, never a Spark job. Overridable per pipeline via
    * `params.extra("autoBucketTargetBytes")`.
    */
  val TargetBytesPerBucket = 256L * 1024 * 1024

  /** Bucketing must out-prune its overhead: migrate only when the bucket
    * count would be at least this multiple of the pipeline's CONFIGURED
    * batch size (the steady-state bound on rewrite keys per batch — the
    * current batch's count would let one trickle batch lock in a layout
    * that is pessimal for every full batch after it), i.e. a full batch
    * still leaves ≥ (1 − 1/factor) of the table untouched.
    * Overridable via `params.extra("autoBucketPruneFactor")`.
    */
  val PruneWorthyFactor = 8L

  /** Bucket-count ceiling (directory-entry hygiene; at the cap buckets
    * simply grow past the target size).
    */
  val MaxAutoBuckets = 65536

  /** Resolve the physical layout for this load. Marker > explicit param
    * > auto (flat until growth-triggered migration, handled in [[load]]);
    * see the class doc for the rules.
    */
  private def resolveBuckets(spark: SparkSession, target: String,
                             params: Params): Int =
    ParquetTable.readBucketMarker(spark, target) match {
      case Some(n) => n // physical layout is law
      case None if ParquetTable.exists(spark, target) => 0 // flat so far
      case None =>
        if (params.partitionBuckets == Params.AutoBuckets) 0 // start flat
        else math.max(params.partitionBuckets, 0)
    }

  /** Growth-triggered migration decision for a flat table under the
    * auto policy: returns the new bucket count when pruning has become
    * worth the partitioned-write overhead (see class doc math).
    */
  private def autoMigrationBuckets(tableBytes: Long,
                                   params: Params): Option[Int] = {
    val targetBytes = params.extra.get("autoBucketTargetBytes")
      .map(_.toLong).getOrElse(TargetBytesPerBucket)
    val factor = params.extra.get("autoBucketPruneFactor")
      .map(_.toLong).getOrElse(PruneWorthyFactor)
    val wanted = tableBytes.toDouble / targetBytes
    if (wanted < math.max(2L, factor * math.max(1L, params.batchSize.toLong))) None
    else Some(math.min(MaxAutoBuckets.toDouble,
      math.pow(2, math.ceil(math.log(wanted) / math.log(2)))).toInt)
  }

  /** @return rows loaded per method, for logging/metrics parity with the
    *         reference's per-batch loglines (`loader_default.go:61`).
    */
  def load(spark: SparkSession, batch: TableBatch, destPath: String,
           pkCols: Seq[String], params: Params): Map[String, Long] = {
    require(batch.df.columns.contains(Method.Col),
      s"batch for ${batch.table} lacks the ${Method.Col} column")
    // NULL methods route to REPLACE like any other unknown verb
    // (`loader_default.go:20-26`) — without the coalesce they would fall
    // through every null-propagating bucket filter and be dropped while
    // still counted.
    val df = batch.df
      .withColumn(Method.Col, coalesce(col(Method.Col), lit(Method.Replace.name)))
      .cache()
    val target = s"$destPath/${batch.table}.parquet"

    val methodOf = col(Method.Col)
    val inserts = df.filter(methodOf === Method.Insert.name).drop(Method.Col)
    val replaces = df.filter(methodOf =!= Method.Insert.name &&
      methodOf =!= Method.Remove.name).drop(Method.Col)
    val removes = df.filter(methodOf === Method.Remove.name).drop(Method.Col)

    // one global-agg job for all three bucket counts (a count per bucket
    // would pay three scheduler round-trips per micro-batch — the
    // dominant cost of small-batch drains)
    val c = df.agg(
      sum(when(methodOf === Method.Insert.name, 1L).otherwise(0L)),
      sum(when(methodOf === Method.Remove.name, 1L).otherwise(0L)),
      count(lit(1))).head()
    val nIns = if (c.isNullAt(0)) 0L else c.getLong(0)
    val nRem = if (c.isNullAt(1)) 0L else c.getLong(1)
    val nRep = c.getLong(2) - nIns - nRem // unknown methods → REPLACE

    if (graft.sources.JdbcTable.isJdbc(destPath)) {
      // JDBC destination (reference parity: MySQL sink,
      // `migrator.go:208-229`): REPLACE/REMOVE delete their ≤batch-size
      // touched keys in one driver-side statement batch, then REPLACE
      // and INSERT rows bulk-append through Spark's JDBC writer.
      // schema alignment runs FIRST: a batch/destination mismatch must
      // fail before the destructive key delete, not after it
      val repAligned =
        if (nRep > 0) graft.sources.JdbcTable.align(replaces, destPath, batch.table)
        else replaces
      val insAligned =
        if (nIns > 0) graft.sources.JdbcTable.align(inserts, destPath, batch.table)
        else inserts
      if (nRep > 0 || nRem > 0) {
        val touched = replaces.select(pkCols.map(col): _*)
          .union(removes.select(pkCols.map(col): _*))
          .distinct().collect().map(_.toSeq)
        graft.sources.JdbcTable.deleteKeys(destPath, batch.table, pkCols, touched)
        if (nRep > 0)
          graft.sources.JdbcTable.append(repAligned, destPath, batch.table,
            params.insertBatchSize)
      }
      if (nIns > 0)
        graft.sources.JdbcTable.append(insAligned, destPath, batch.table,
          params.insertBatchSize)
      df.unpersist()
      return Map(Method.Insert.name -> nIns, Method.Replace.name -> nRep,
        Method.Remove.name -> nRem)
    }

    // value-partitioned layout (PartitionBy) is an explicit, exclusive
    // choice: an existing bucket marker still wins (physical layout is
    // law), otherwise the column layout applies to every load
    if (params.partitionByCol.isDefined &&
        ParquetTable.readBucketMarker(spark, target).isEmpty) {
      loadValuePartitioned(spark, target, pkCols, params,
        params.partitionByCol.get, inserts, replaces, removes, nIns, nRep, nRem)
      df.unpersist()
      return Map(Method.Insert.name -> nIns, Method.Replace.name -> nRep,
        Method.Remove.name -> nRem)
    }

    var buckets = resolveBuckets(spark, target, params)
    // growth-triggered auto-migration: a flat table under the auto
    // policy converts to a bucketed layout once pruning beats the
    // partitioned-write overhead (class doc math). The size probe is a
    // filesystem content summary — no Spark job per batch; the
    // migration itself is one table rewrite, amortised over every
    // pruned rewrite after it.
    if (buckets == 0 && (nRep > 0 || nRem > 0) &&
        params.partitionBuckets == Params.AutoBuckets &&
        ParquetTable.exists(spark, target)) {
      val tp = new Path(target)
      val bytes = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getContentSummary(tp).getLength
      autoMigrationBuckets(bytes, params).foreach { n =>
        val existing = ParquetTable.read(spark, target).get
        // marker rides inside the staged directory so layout + marker
        // swap in atomically — a crash can never leave bucketed data
        // that the next load would misread as flat
        ParquetTable.overwriteAtomicPartitioned(spark, target,
          existing.withColumn(BucketCol,
            pmod(xxhash64(pkCols.map(col): _*), lit(n.toLong))), BucketCol,
          bucketMarker = Some(n))
        buckets = n
      }
    }
    if (buckets > 0)
      loadBucketed(spark, target, pkCols, params, buckets, inserts, replaces,
        removes, nIns, nRep, nRem)
    else {
      if (nRep > 0 || nRem > 0) {
        val touchedKeys = replaces.select(pkCols.map(col): _*)
          .union(removes.select(pkCols.map(col): _*))
        val existing = ParquetTable.read(spark, target)
        val kept = existing match {
          case Some(t) => t.join(broadcast(touchedKeys), pkCols, "left_anti")
          case None    => replaces.limit(0) // empty, replaces schema
        }
        ParquetTable.overwriteAtomic(spark, target,
          kept.unionByName(replaces, allowMissingColumns = true))
      }
      if (nIns > 0)
        ParquetTable.append(spark, target, inserts, params.insertBatchSize)
    }

    df.unpersist()
    Map(Method.Insert.name -> nIns, Method.Replace.name -> nRep,
      Method.Remove.name -> nRem)
  }

  /** Value-partitioned destination (`PartitionBy`): the lakehouse layout
    * for PREDICATE pruning — incremental timestamp scans and any filter
    * on the partition column read only matching directories
    * (`PartitionFilters` in the scan), and REPLACE/REMOVE rewrites
    * touch only the partitions the batch's rows live in.
    *
    * Pruning contract: the partition column must be IMMUTABLE per key
    * (creation date, region, tenant — the standard lakehouse
    * constraint). An update that moved a row across partitions would
    * leave its old version untouched in an unpruned partition. Rows
    * whose partition value is unknown (NULL — e.g. a CDC-synthesized
    * REMOVE that only carries the PK) make the batch unprunable: the
    * load falls back to one full anti-join rewrite, still written in
    * the partitioned layout.
    *
    * Same read-before-overwrite discipline as [[loadBucketed]]: rewrite
    * output is fully staged before any target partition is swapped, and
    * a partition emptied by REMOVEs is deleted in the same pass (its
    * dir name derived with the exact escaping Spark's writer uses).
    */
  private def loadValuePartitioned(spark: SparkSession, target: String,
                                   pkCols: Seq[String], params: Params,
                                   pcol: String,
                                   inserts: DataFrame, replaces: DataFrame,
                                   removes: DataFrame,
                                   nIns: Long, nRep: Long, nRem: Long): Unit = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val p = new Path(target)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def dirName(v: Any): String =
      ExternalCatalogUtils.getPartitionPathString(pcol, String.valueOf(v))

    // partition-dir names must round-trip values exactly; permit the
    // types whose toString matches Spark's partition encoding. Checked
    // on EVERY load (insert-only ones included): an unsupported type
    // must fail before it lays out a table no rewrite could service
    (if (nIns > 0) inserts else if (nRep > 0) replaces else removes)
      .schema.find(_.name == pcol).foreach { f =>
        require(Seq("string", "bigint", "int", "smallint", "tinyint")
          .contains(f.dataType.simpleString),
          s"PartitionBy column `$pcol` must be string or integral, got ${f.dataType}")
      }

    // layout guard: a destination seeded BEFORE PartitionBy was
    // configured holds root-level data files. Writing partition dirs
    // next to them would duplicate replaced rows and break partition
    // discovery, so such a table is migrated to the partitioned layout
    // in one atomic rewrite first (mirror of the bucket-marker "physical
    // layout is law" rule, with the flat files as the tell).
    def isFlatLayout: Boolean = fs.exists(p) &&
      fs.listStatus(p).exists(s => s.isFile && s.getPath.getName.startsWith("part-"))
    if (isFlatLayout)
      ParquetTable.read(spark, target).foreach { existing =>
        ParquetTable.overwriteAtomicPartitioned(spark, target, existing, pcol)
      }

    if (nRep > 0 || nRem > 0) {
      val existing = ParquetTable.read(spark, target)
      val touchedVals = replaces.select(pcol).union(removes.select(pcol))
        .distinct().collect().map(r => if (r.isNullAt(0)) null else r.get(0))
      val prunable = !touchedVals.contains(null) && existing.isDefined
      val touchedKeys = replaces.select(pkCols.map(col): _*)
        .union(removes.select(pkCols.map(col): _*))
      val kept = existing match {
        case Some(t) if prunable =>
          t.filter(col(pcol).isin(touchedVals: _*)) // partition pruning
            .join(broadcast(touchedKeys), pkCols, "left_anti")
        case Some(t) => t.join(broadcast(touchedKeys), pkCols, "left_anti")
        case None => replaces.limit(0)
      }
      val out = kept.unionByName(replaces, allowMissingColumns = true)
      if (prunable) {
        val staging = new Path(target + s".__staging_${ParquetTable.stamp()}")
        out.write.mode("overwrite").partitionBy(pcol).parquet(staging.toString)
        if (!fs.exists(p)) fs.mkdirs(p)
        touchedVals.foreach { v =>
          val dst = new Path(p, dirName(v))
          val src = new Path(staging, dirName(v))
          // displace the live partition INTO the staging dir before the
          // swap: a crash mid-swap leaves the old data recoverable in
          // .__staging_* instead of deleted outright (the staging dir is
          // only removed after every touched partition has swapped)
          if (fs.exists(dst))
            fs.rename(dst, new Path(staging, s"__displaced_${dirName(v)}"))
          if (fs.exists(src)) fs.rename(src, dst)
        }
        fs.delete(staging, true)
      } else
        ParquetTable.overwriteAtomicPartitioned(spark, target, out, pcol)
    }
    if (nIns > 0) {
      val w = inserts.write.mode("append").partitionBy(pcol)
      (if (params.insertBatchSize > 0)
        w.option("maxRecordsPerFile", params.insertBatchSize.toLong) else w)
        .parquet(target)
    }
  }

  /** Partition-pruned variant (SURVEY §7.4 H1): REPLACE/REMOVE computes
    * the touched bucket set from the batch keys (≤ batch size) and
    * rewrites ONLY those partitions — the target read is partition-
    * pruned by the same bucket filter.
    *
    * The rewritten rows are fully materialised into a staging directory
    * BEFORE any target partition is touched (read-before-overwrite
    * safety: the output derives from the partitions it replaces, and on
    * a cluster a lost executor would otherwise recompute it from a
    * half-overwritten target — a `cache()` is only a hint, not a
    * barrier). Staged partitions are then swapped in per bucket; a
    * bucket emptied by REMOVEs produces no staged partition and its
    * stale directory is deleted by the same per-bucket pass.
    */
  private def loadBucketed(spark: SparkSession, target: String,
                           pkCols: Seq[String], params: Params, n: Int,
                           inserts: DataFrame, replaces: DataFrame,
                           removes: DataFrame,
                           nIns: Long, nRep: Long, nRem: Long): Unit = {
    def bucketed(d: DataFrame): DataFrame =
      d.withColumn(BucketCol, pmod(xxhash64(pkCols.map(col): _*), lit(n.toLong)))

    val p = new Path(target)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)

    if (nRep > 0 || nRem > 0) {
      val touched = bucketed(replaces).select(BucketCol)
        .union(bucketed(removes).select(BucketCol))
        .distinct().collect().map(_.getLong(0)).toSeq
      val touchedKeys = replaces.select(pkCols.map(col): _*)
        .union(removes.select(pkCols.map(col): _*))
      val kept = ParquetTable.read(spark, target) match {
        case Some(t) =>
          t.filter(col(BucketCol).isin(touched: _*)) // partition pruning
            .join(broadcast(touchedKeys), pkCols, "left_anti")
        case None => bucketed(replaces).limit(0)
      }
      val out = kept.unionByName(bucketed(replaces), allowMissingColumns = true)

      // 1. materialise to staging (completes the read of the target)
      val staging = new Path(target + s".__staging_${ParquetTable.stamp()}")
      out.write.mode("overwrite").partitionBy(BucketCol).parquet(staging.toString)
      // 2. swap per touched bucket: staged partition in, stale (possibly
      //    emptied) partition out. Output buckets ⊆ touched buckets, so
      //    one pass over `touched` covers both.
      if (!fs.exists(p)) fs.mkdirs(p)
      touched.foreach { b =>
        val dst = new Path(p, s"$BucketCol=$b")
        val src = new Path(staging, s"$BucketCol=$b")
        // displace rather than delete: a crash mid-swap leaves the old
        // bucket recoverable inside .__staging_* instead of gone
        if (fs.exists(dst))
          fs.rename(dst, new Path(staging, s"__displaced_$BucketCol=$b"))
        if (fs.exists(src)) fs.rename(src, dst)
      }
      fs.delete(staging, true)
    }
    if (nIns > 0) {
      val w = bucketed(inserts).write.mode("append").partitionBy(BucketCol)
      (if (params.insertBatchSize > 0)
        w.option("maxRecordsPerFile", params.insertBatchSize.toLong) else w)
        .parquet(target)
    }
    // self-describing layout: later loads and the extract side's bucket
    // pruning read the count from the table, never from config
    if (ParquetTable.readBucketMarker(spark, target).isEmpty)
      ParquetTable.writeBucketMarker(spark, target, n)
  }
}
