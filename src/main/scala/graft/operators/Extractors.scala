package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core._

/** Incremental extract disciplines — one per reference extractor
  * (`ExtractorMap`, `types.go:17-19` in /root/reference). Each returns a
  * bounded, `_method`-tagged batch plus the tracking status to commit
  * after a successful load, and the `moreData` drain signal
  * (count == batchSize, `extractor_sequential.go:92-109`).
  *
  * Scale notes common to all: the incremental predicate is a plain
  * `Column` filter, so Catalyst pushes it into the parquet scan
  * (row-group pruning / JDBC pushdown) exactly like the reference ships
  * its `WHERE` clause to MySQL. `orderBy(...).limit(n)` plans as
  * `TakeOrderedAndProject` — a per-partition top-k plus a driver merge,
  * no global sort, no full shuffle. Unlike the reference's unordered
  * `LIMIT` (MySQL-arbitrary subset), our batches are deterministic
  * (SURVEY §7.4 H5, an intentional semantic upgrade).
  */
trait Extractor {
  def name: String
  def extract(spark: SparkSession, spec: PipelineSpec, status: TrackingStatus): ExtractResult

  /** Schema check at pipeline init, replacing the reference's per-row
    * runtime panics (`extractor_sequential.go:81-85`).
    */
  def validate(spark: SparkSession, spec: PipelineSpec): Unit = ()

  protected def source(spark: SparkSession, spec: PipelineSpec): DataFrame =
    graft.sources.Tables.readTable(spark, spec.sourcePath, spec.sourceTable)

  protected def now(): Timestamp = new Timestamp(System.currentTimeMillis())
}

/** Keyset pagination on an integer key:
  * `SELECT * FROM t WHERE key > pos ORDER BY key LIMIT batch`
  * (reference `extractor_sequential.go:39`). Rows tag INSERT, or REPLACE
  * under `SequentialReplace` (`extractor_sequential.go:123-127`).
  */
object SequentialExtractor extends Extractor {
  val name = "sequential"

  override def validate(spark: SparkSession, spec: PipelineSpec): Unit = {
    val dt = source(spark, spec).schema(spec.keyColumns.head).dataType
    require(dt == LongType || dt == IntegerType || dt == ShortType,
      s"sequential extractor needs an integral key column, got $dt for ${spec.sourceKey}")
  }

  def extract(spark: SparkSession, spec: PipelineSpec, status: TrackingStatus): ExtractResult = {
    val key = spec.keyColumns.head
    val n = spec.params.batchSize
    val batch = source(spark, spec)
      .filter(col(key) > lit(status.sequentialPosition))
      .orderBy(spec.keyColumns.map(col): _*)
      .limit(n)
      .cache()
    val agg = batch.agg(count(lit(1)).as("c"), max(col(key).cast(LongType)).as("m")).head()
    val cnt = agg.getLong(0)
    val newPos = if (agg.isNullAt(1)) status.sequentialPosition else agg.getLong(1)
    val method = if (spec.params.sequentialReplace) Method.Replace else Method.Insert
    ExtractResult(
      batch.withColumn(Method.Col, lit(method.name)),
      status.copy(sequentialPosition = newPos, lastRun = Some(now())),
      moreData = cnt == n)
  }
}

/** Event-time watermark scan:
  * `SELECT * FROM t WHERE ts > wm [AND ts <= NOW()] LIMIT batch`
  * (reference `extractor_timestamp.go:42-46`; the upper bound is the
  * `OnlyPast` option, `README.md:16`). Strictly-greater watermark
  * comparison preserved (ST3). Rows tag REPLACE — replay-idempotent.
  *
  * `clock` is injectable so tests (and the deterministic oracle queries)
  * can pin "now".
  */
class TimestampExtractor(val name: String = "timestamp",
                         clock: () => Timestamp = () => new Timestamp(System.currentTimeMillis()))
    extends Extractor {

  /** Position expression; the fallback subclass coalesces two columns. */
  protected def posExpr(spec: PipelineSpec): Column = col(spec.keyColumns.head)

  override def validate(spark: SparkSession, spec: PipelineSpec): Unit = {
    val schema = source(spark, spec).schema
    spec.keyColumns.foreach { k =>
      val dt = schema(k).dataType
      require(dt == TimestampType || dt == TimestampNTZType,
        s"$name extractor needs timestamp position columns, got $dt for $k")
    }
  }

  def extract(spark: SparkSession, spec: PipelineSpec, status: TrackingStatus): ExtractResult = {
    val pos = posExpr(spec)
    val n = spec.params.batchSize
    val lower = status.timestampPosition
      .map(wm => pos > lit(wm))
      .getOrElse(lit(true))
    val nowTs = clock()
    val upper = if (spec.params.onlyPast) pos <= lit(nowTs) else lit(true)
    val probe = source(spark, spec)
      .filter(lower && upper)
      .orderBy(pos)
      .limit(n)
      .cache()
    val agg = probe.agg(count(lit(1)).as("c"), max(pos).as("m")).head()
    val cnt = agg.getLong(0)
    val newWm: Option[Timestamp] =
      if (agg.isNullAt(1)) status.timestampPosition
      else Some(agg.get(1) match {
        case t: Timestamp => t
        case t: java.time.LocalDateTime => Timestamp.valueOf(t)
        case t: java.time.Instant => Timestamp.from(t)
      })
    // Tie-safety: if the limit cut through a group of equal timestamps,
    // the strict `> watermark` filter of the NEXT poll would skip the
    // unconsumed ties forever. Re-derive the batch as "everything up to
    // and including the new watermark" — at most tie-group-size rows
    // over batchSize, and no tie is ever split across the watermark.
    val batch =
      if (cnt == n && newWm.isDefined)
        source(spark, spec).filter(lower && upper && pos <= lit(newWm.get))
      else probe
    probe.unpersist()
    ExtractResult(
      batch.withColumn(Method.Col, lit(Method.Replace.name)),
      status.copy(timestampPosition = newWm, lastRun = Some(now())),
      moreData = cnt == n)
  }
}

/** Two-column `IFNULL(a, b)` position variant
  * (reference `extractor_timestamp_fallback.go:34-44`).
  */
class TimestampFallbackExtractor(clock: () => Timestamp = () => new Timestamp(System.currentTimeMillis()))
    extends TimestampExtractor("timestamp_fallback", clock) {
  override protected def posExpr(spec: PipelineSpec): Column = {
    require(spec.keyColumns.size == 2,
      s"timestamp_fallback needs two comma-separated columns, got ${spec.sourceKey}")
    coalesce(col(spec.keyColumns.head), col(spec.keyColumns(1)))
  }
}

/** Trigger-fed CDC changelog scan (reference `extractor_queue.go:17-172`):
  * drain the queue oldest-first in bounded batches, synthesize REMOVE
  * rows for deletes (`extractor_queue.go:57-72`), and fetch the latest
  * row for updates.
  *
  * Where the reference does one point query per entry (an index-driven
  * nested-loop join), we run ONE broadcast hash join of the (≤ batch,
  * always small) queue batch against the base table — the base side
  * streams, nothing but the queue batch is collected. Per SURVEY §7.4 H4
  * the batch is first deduped to the latest entry per PK
  * (`row_number() over (partition by pk order by timestampUpdated desc)`)
  * so set-based processing converges to the same end state as the
  * reference's strictly-ordered per-entry replay.
  *
  * Queue entries are acked (deleted) in the deferred `commit` callback —
  * i.e. only after the sink succeeded — fixing the reference's lossy
  * ack-during-extract (`extractor_queue.go:130`, `TODO.md:4-11`).
  */
object QueueExtractor extends Extractor {
  val name = "queue"

  /** Changelog schema parity: `record_queue.sql:2-13`. */
  val queueCols = Seq("sourceDatabase", "sourceTable", "pkColumn", "pkValue",
    "timestampUpdated", "method")

  private def queue(spark: SparkSession, spec: PipelineSpec): DataFrame =
    ParquetTable.read(spark, queuePath(spec)).getOrElse(
      throw new IllegalArgumentException(s"queue table missing at ${queuePath(spec)}"))

  private def queuePath(spec: PipelineSpec): String =
    spec.queuePath.getOrElse(s"${spec.sourcePath}/MigratorRecordQueue")

  /** Build the method-tagged change batch from a set of changelog
    * entries: last-write-wins dedup per PK (H4), broadcast lookup join
    * for updates (J1), REMOVE-row synthesis (R8). Shared by the
    * micro-batch extractor and the Structured Streaming facade
    * ([[graft.streaming.StreamingPipeline]]).
    */
  def changeBatch(spark: SparkSession, spec: PipelineSpec, entries: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    // H4: last-write-wins — keep only the newest entry per PK so one
    // set-based pass equals the reference's ordered per-entry replay.
    val latest = entries
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("pkValue"))
          .orderBy(col("timestampUpdated").desc, col("method").desc)))
      .filter(col("_rn") === 1)
      .drop("_rn")

    val base = source(spark, spec)
    val pkCols = spec.pkColumns

    // Composite PKs arrive comma-joined (reference `extractor_queue.go:75-90`);
    // match by joining on the same canonical string form of the base PK.
    val basePkStr = concat_ws(",", pkCols.map(c => col(c).cast(StringType)): _*)

    val updates = base
      .join(broadcast(latest.filter(col("method") =!= "REMOVE").select(col("pkValue"))),
        basePkStr === col("pkValue"), "inner")
      .drop("pkValue")
      .withColumn(Method.Col, lit(Method.Replace.name))

    // R8: deletes synthesize a PK-only row — the base row is gone.
    val removeEntries = latest.filter(col("method") === "REMOVE")
    val pkTypes = pkCols.map(c => base.schema(c).dataType)
    val removeRows = {
      val parts = split(col("pkValue"), ",")
      val typedCols = pkCols.zip(pkTypes).zipWithIndex.map {
        case ((c, dt), i) => parts.getItem(i).cast(dt).as(c)
      }
      removeEntries.select(typedCols: _*)
        .withColumn(Method.Col, lit(Method.Remove.name))
    }

    // Align REMOVE rows to the full batch schema (missing cols → null)
    // so the two legs union cleanly; the loader only reads the PK cols.
    val removeAligned = updates.columns.foldLeft(removeRows) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(updates.schema(c).dataType))
    }.select(updates.columns.map(col): _*)

    updates.unionByName(removeAligned)
  }

  def extract(spark: SparkSession, spec: PipelineSpec, status: TrackingStatus): ExtractResult = {
    val n = spec.params.batchSize
    val entries = queue(spark, spec)
      .filter(col("sourceDatabase") === spec.sourceDatabase &&
        col("sourceTable") === spec.sourceTable)
      .orderBy(col("timestampUpdated"), col("pkValue"))
      .limit(n)
      .cache()
    val cnt = entries.count()

    val batch = changeBatch(spark, spec, entries)

    val ack = () => {
      // Delete consumed entries only after sink success (commit-after-load).
      // CAVEAT: this is a read/anti-join/swap of the whole changelog dir —
      // entries appended between the staged read and the swap are lost,
      // and two pipelines sharing one queuePath would clobber each other's
      // acks. Single-consumer queues only (one pipeline per queuePath, the
      // reference's own layout); concurrent-writer deployments should use
      // the streaming facade, whose checkpoint offsets never rewrite the
      // queue (graft.streaming.StreamingPipeline).
      val remaining = queue(spark, spec).join(
        entries.select(queueCols.map(col): _*),
        queueCols, "left_anti")
      ParquetTable.overwriteAtomic(spark, queuePath(spec), remaining)
      entries.unpersist()
      ()
    }

    ExtractResult(
      batch,
      // position lives in the queue contents; only LastRun is touched
      // (reference `extractor_queue.go:159-168`)
      status.copy(lastRun = Some(now())),
      moreData = cnt == n,
      commit = ack)
  }
}
