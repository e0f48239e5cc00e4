package graft.core

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.SparkSession

import graft.operators._

/** Pipeline lifecycle states — reference state machine
  * (`state.go:5-27` in /root/reference).
  */
sealed trait RunState
object RunState {
  case object New      extends RunState
  case object Running  extends RunState
  case object Paused   extends RunState
  case object Stopping extends RunState
  case object Stopped  extends RunState
}

/** Per-stage failure context — the reference's `ErrorCallback` receives
  * a map naming the failing stage and table (`migrator.go:50`, invoked
  * at `migrator.go:353-359` extract and `migrator.go:371-379` load);
  * collapsing that to just a table name loses the distinction an ops
  * runbook actually branches on.
  */
final case class ErrorContext(stage: String, table: String)
object ErrorContext {
  val Init = "init"; val Extract = "extract"; val Transform = "transform"
  val Load = "load"; val Commit = "commit"; val Compact = "compact"
}

private[core] final class StageFailure(val stage: String, cause: Throwable)
  extends RuntimeException(s"[$stage] ${cause.getMessage}", cause)

/** One bound per-table pipeline: extract → transform → load → commit
  * tracking (reference `Iteration` + the per-table goroutine body,
  * `migrator.go:329-423`).
  *
  * Commit ordering is the corrected one (SURVEY §7.4 H2): the tracking
  * position AND any extractor side-effects (queue acks) persist only
  * after the sink succeeded — at-least-once with idempotent REPLACE, no
  * lost batches on crash (the reference's `TODO.md:4-11` wants this).
  */
final class Pipeline(spark: SparkSession, val spec: PipelineSpec,
                     tracking: TrackingStore) {

  val extractor: Extractor = Registry.extractor(spec.extractor)
  val transformer: Transformer = Registry.transformer(spec.transformer)

  def init(): TrackingStatus = {
    extractor.validate(spark, spec)
    tracking.getOrSeed(spec.sourceDatabase, spec.sourceTable, spec.sourceKey)
  }

  private def stage[T](name: String)(body: => T): T =
    try body catch {
      case e: StageFailure => throw e
      case e: Throwable    => throw new StageFailure(name, e)
    }

  /** One micro-batch. @return (rows loaded by method, moreData). */
  def runBatch(status: TrackingStatus): (Map[String, Long], Boolean, TrackingStatus) = {
    val res = stage(ErrorContext.Extract) { extractor.extract(spark, spec, status) }
    try {
      val batch = TableBatch(spec.destinationDatabase, spec.destinationTable, res.df)
      val outBatches = stage(ErrorContext.Transform) {
        transformer(batch, spec.params,
          graft.operators.TransformContext(spark, spec.destinationPath, spec.pkColumns))
      }
      val counts = stage(ErrorContext.Load) {
        outBatches.map { b =>
          MethodRoutedLoader.load(spark, b, spec.destinationPath, spec.pkColumns, spec.params)
        }.foldLeft(Map.empty[String, Long].withDefaultValue(0L)) { (acc, m) =>
          m.foldLeft(acc) { case (a, (k, v)) => a.updated(k, a(k) + v) }
        }
      }
      // remember what was actually written (transformers rename/fan out)
      // so drain-boundary compaction follows the loader, not the spec
      outBatches.foreach(b => touchedTables += b.table)
      // commit AFTER load: tracking position, then extractor side-effects
      stage(ErrorContext.Commit) {
        tracking.put(res.newStatus)
        res.commit()
      }
      (counts, res.moreData, res.newStatus)
    } finally res.cleanup() // ALWAYS release extractor caches — a leaked
    // entry both holds memory and poisons the next identical plan with
    // stale results (see ExtractResult.cleanup)
  }

  /** Drain until the extractor reports no more data (the reference loops
    * immediately while `moreData`, `migrator.go:329-423`).
    * @return total rows loaded by method.
    */
  def drain(maxBatches: Int = Int.MaxValue): Map[String, Long] = {
    var status = init()
    var more = true
    var batches = 0
    var totals = Map.empty[String, Long].withDefaultValue(0L)
    while (more && batches < maxBatches) {
      val (counts, m, st) = runBatch(status)
      totals = counts.foldLeft(totals) { case (a, (k, v)) => a.updated(k, a(k) + v) }
      status = st
      more = m
      batches += 1
    }
    if (!more) {
      // maintenance must not fail a drain that already succeeded: the
      // caller still needs the totals; the failure is logged and the
      // next drain boundary retries
      try maybeCompact() catch {
        case e: StageFailure => log.warn(
          s"compaction of ${spec.destinationTable} failed (drain unaffected)", e)
      }
    }
    totals
  }

  private lazy val log =
    org.slf4j.LoggerFactory.getLogger(classOf[Pipeline])

  /** Destination tables the loader actually wrote this run — the
    * transformer owns the final table name(s) (rename, 1→N fan-out),
    * so compaction must follow what was written, not the spec field.
    */
  private val touchedTables = scala.collection.mutable.LinkedHashSet[String]()

  /** End-of-drain small-file maintenance: for each FLAT parquet
    * destination written this run, if it holds more than
    * [[Params.compactFileThreshold]] data files AND those files are
    * meaningfully smaller than the ~256 MB target (the rewrite would
    * cut the file count at least in half), rewrite it through the
    * atomic-swap compactor. Both tests come from ONE metadata listing —
    * no count(), no data read unless compaction actually runs — and the
    * post-compaction layout fails the trigger, so a large healthy table
    * is never rewritten again and again merely for being big. Runs only
    * at drain boundaries; bucketed layouts are skipped (the flat
    * rewrite would destroy the partition dirs the loader prunes by);
    * JDBC destinations have no files.
    */
  def maybeCompact(): Unit = {
    val th = spec.params.compactFileThreshold
    if (th <= 0 || graft.sources.JdbcTable.isJdbc(spec.destinationPath)) return
    // NB: no early returns inside the staged block — `return` from a
    // by-name body unwinds via ControlThrowable and would be wrapped
    stage(ErrorContext.Compact) { touchedTables.toSeq.foreach { table =>
      val path = s"${spec.destinationPath}/$table.parquet"
      // both partitioned layouts keep their directories: bucketed
      // tables are told by the marker, value-partitioned (PartitionBy)
      // ones by config — compacting either would collapse the layout
      if (spec.params.partitionByCol.isEmpty &&
          ParquetTable.readBucketMarker(spark, path).isEmpty) {
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) {
          val files = fs.listStatus(p)
            .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
          val totalBytes = files.map(_.getLen).sum
          val desired = math.max(1L,
            math.ceil(totalBytes.toDouble / Pipeline.CompactTargetFileBytes).toLong)
          if (files.length > th && files.length >= 2 * desired)
            ParquetTable.compactToFileCount(spark, path, desired.toInt)
        }
      }
    } }
  }
}

object Pipeline {
  /** Compaction sizes output files toward this many bytes (the row-group
    * scale object stores and parquet readers like).
    */
  val CompactTargetFileBytes: Long = 256L * 1024 * 1024
}

/** Multi-pipeline job — reference `Migrator` (`migrator.go:27-59`): one
  * worker thread per pipeline (ST7), shared SparkSession, pause/stop
  * lifecycle (ST6), per-stage error callback with retry-and-backoff
  * (ST8, `migrator.go:312-327`).
  *
  * Spark-first note: concurrent pipelines are concurrent jobs on one
  * scheduler — Spark's FAIR/FIFO pool replaces the reference's
  * connection-pool arithmetic (`migrator.go:215-216`).
  */
final class Runner(spark: SparkSession, specs: Seq[PipelineSpec],
                   trackingPath: String,
                   errorCallback: (ErrorContext, Throwable) => Unit = (_, _) => ()) {

  private val state = new AtomicReference[RunState](RunState.New)
  private val tracking = new TrackingStore(spark, trackingPath)
  val pipelines: Seq[Pipeline] = specs.map(new Pipeline(spark, _, tracking))
  private var threads: Seq[Thread] = Nil

  def currentState: RunState = state.get()
  def pause(): Unit = state.compareAndSet(RunState.Running, RunState.Paused)
  def unpause(): Unit = state.compareAndSet(RunState.Paused, RunState.Running)
  def quit(): Unit = state.set(RunState.Stopping)

  /** Start one thread per pipeline; each loops drain → idle sleep
    * (reference `SleepBetweenRuns`, `migrator.go:390-394` — the jitter is
    * unnecessary under one scheduler, SURVEY §4).
    */
  def run(): Unit = {
    state.set(RunState.Running)
    threads = pipelines.map { p =>
      val t = new Thread(() => {
        // init with retry-forever (reference `migrator.go:312-327`):
        // a missing source/tracking store at start-up must not kill the
        // pipeline thread silently
        val table = p.spec.sourceTable
        var status: TrackingStatus = null
        while (status == null && state.get() != RunState.Stopping) {
          try status = p.init()
          catch {
            case e: Throwable =>
              errorCallback(ErrorContext(ErrorContext.Init, table), e)
              sleepInterruptibly(p.spec.params.sleepBetweenRunsSec)
          }
        }
        while (state.get() != RunState.Stopping) {
          if (state.get() == RunState.Paused) Thread.sleep(100)
          else {
            try {
              val (_, more, st) = p.runBatch(status)
              status = st
              if (!more) {
                p.maybeCompact() // drain boundary: bounded-file upkeep
                sleepInterruptibly(p.spec.params.sleepBetweenRunsSec)
              }
            } catch {
              case sf: StageFailure =>
                errorCallback(ErrorContext(sf.stage, table), sf.getCause)
                sleepInterruptibly(p.spec.params.sleepBetweenRunsSec)
              case e: Throwable =>
                errorCallback(ErrorContext(ErrorContext.Extract, table), e)
                sleepInterruptibly(p.spec.params.sleepBetweenRunsSec)
            }
          }
        }
      }, s"graft-pipeline-${p.spec.sourceTable}")
      t.setDaemon(true)
      t.start()
      t
    }
  }

  /** Interruptible sleep, polling the stop flag (reference
    * `migrator.go:273-280`).
    */
  private def sleepInterruptibly(seconds: Double): Unit = {
    val deadline = System.nanoTime() + (seconds * 1e9).toLong
    while (System.nanoTime() < deadline && state.get() != RunState.Stopping)
      Thread.sleep(50)
  }

  /** Block until all pipeline threads exit (reference `wg.Wait()`,
    * `cmd/migrator/main.go:140-141`).
    */
  def awaitTermination(): Unit = {
    threads.foreach(_.join())
    state.set(RunState.Stopped)
  }

  /** Run every pipeline's full drain once, synchronously — the batch
    * ("availableNow") facade used by tests and the verify harness.
    */
  def drainOnce(): Map[String, Map[String, Long]] =
    pipelines.map(p => p.spec.sourceTable -> p.drain()).toMap
}
