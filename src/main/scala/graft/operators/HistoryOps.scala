package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history from a change stream —
  * the warehouse-side complement of the CDC extractors: where
  * `Extractors.queueScan` answers "what is the latest row per key",
  * this operator answers "what was the row at ANY point in time", by
  * turning the change log into versioned rows with half-open validity
  * intervals `[valid_from, valid_to)`.
  *
  * Reference anchor: the queue tables of `migrator` (`extractor_queue
  * .go:24-60`) carry exactly this change-log shape (PK + method +
  * update time); the reference replays them forward only. SCD2 is the
  * standard way a warehouse keeps the whole trajectory queryable.
  *
  * Shape at 100 TB: ONE hash exchange on the key (the window's
  * `partitionBy`) — every window function here (`lag` for
  * change-collapse, `lead` for interval close, `row_number` for the
  * version) runs over that same partitioning, so Catalyst plans a
  * single Exchange + one sort feeding all three. Per-key work is the
  * key's own history; there is no cross-key traffic at all, so the
  * operator scales with the hottest key, not the table.
  *
  * Determinism: rows are ordered by (`orderCol`, tie-break cols) — a
  * TOTAL order per key, so version numbers and interval bounds are
  * reproducible regardless of partitioning. Two changes with the same
  * timestamp produce a zero-length `[t, t)` interval for the earlier
  * one (by tie-break): harmless and exact — no point-in-time probe can
  * land inside it, and the later change rules from `t` on.
  */
object HistoryOps {

  /** Build the SCD2 history of `stateCols` per `key` from change rows
    * ordered by (`orderCol`, `tieCols`*).
    *
    * Consecutive rows whose state columns are all unchanged are
    * COLLAPSED (no-op updates extend the current version instead of
    * opening a new one — the standard SCD2 rule, and at scale the
    * difference between history proportional to real change and
    * history proportional to write traffic).
    *
    * Output per version: the key, `version` (1-based, in order),
    * the state columns, `valid_from`, `valid_to` (null = still open),
    * `is_current`, and `last_changed` — the key's maximum `orderCol`
    * over ALL its change rows, collapsed ones included. That last
    * column is the append-only frontier [[scd2Extend]]'s guard needs:
    * a collapsed no-op change advances the frontier without opening a
    * version, so `max(valid_from)` alone would under-report it.
    */
  def scd2(changes: DataFrame, key: String, orderCol: String,
           stateCols: Seq[String],
           tieCols: Seq[String] = Nil): DataFrame = {
    require(stateCols.nonEmpty, "scd2 needs at least one state column")
    val ord: Seq[Column] = (orderCol +: tieCols).map(col)
    val w = Window.partitionBy(key).orderBy(ord: _*)
    // a change opens a new version iff it is the key's FIRST row or
    // ANY state column differs from the previous row's; the null-safe
    // comparator makes NULL→value and value→NULL changes and
    // NULL→NULL a collapse — which is exactly why first-row detection
    // needs its own marker (a NULL first state would otherwise look
    // like NULL<=>NULL against the lag frontier)
    val isFirst = lag(lit(1), 1).over(w).isNull
    val changed = stateCols
      .map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _)
    val starts = changes
      .withColumn("__new", isFirst || changed)
      // the frontier is computed over the PRE-collapse rows (same
      // key-hash exchange, unordered frame) so no-op changes advance it
      .withColumn("last_changed",
        max(col(orderCol)).over(Window.partitionBy(key)))
      .filter(col("__new"))
      .withColumn("valid_from", col(orderCol))
    // lead/row_number over the SAME (partitionBy, orderBy) as the lag
    // pass: one exchange, one sort, three window functions. The
    // tie-break columns stay in the order — two retained changes at
    // the same instant must version deterministically
    val w2 = Window.partitionBy(key)
      .orderBy((col("valid_from") +: tieCols.map(col)): _*)
    starts
      .withColumn("version", row_number().over(w2))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select((col(key) +: col("version") +: stateCols.map(col) :+
        col("valid_from") :+ col("valid_to") :+ col("is_current") :+
        col("last_changed")): _*)
  }

  /** Incremental SCD2 maintenance: fold a batch of NEW changes into an
    * existing history WITHOUT rebuilding it — the 100 TB posture,
    * where the stored history is years deep and a day's batch touches
    * a sliver of keys.
    *
    * Cost shape: keys untouched by the batch pass through UNREAD
    * (anti-join on the batch's bounded key set); for touched keys only
    * their version rows re-enter the window — per-key history depth,
    * not table depth. The batch's rows must all order AFTER the
    * stored history's (append-only change log, the watermark
    * discipline every extractor in this engine already enforces);
    * rows at or before a touched key's `last_changed` frontier —
    * which covers COLLAPSED no-op changes, not just retained
    * `valid_from`s — reject loudly rather than silently corrupting
    * closed intervals.
    *
    * Equivalence contract (spec-pinned): `scd2Extend(scd2(a), b)`
    * equals `scd2(a ∪ b)` row-for-row.
    */
  def scd2Extend(dim: DataFrame, changes: DataFrame, key: String,
                 orderCol: String, stateCols: Seq[String],
                 tieCols: Seq[String] = Nil): DataFrame = {
    val touchedKeys = changes.select(key).distinct()
    // untouched keys pass through UNREAD by the window — at scale the
    // anti-join broadcasts the batch's bounded key set
    val untouched = dim.join(touchedKeys, Seq(key), "left_anti")
    val touchedDim = dim.join(touchedKeys, Seq(key))
    // append-only guard against the key's CHANGE frontier
    // (last_changed covers collapsed no-ops; max(valid_from) would
    // not) — a batch row at or before it would rewrite already-decided
    // collapse/version outcomes, so reject loudly, row-level
    val guard = touchedDim.groupBy(key)
      .agg(max("last_changed").as("__last_seen"))
    val checkedBatch = changes.join(guard, Seq(key), "left")
      .withColumn("__guard",
        when(col("__last_seen").isNull ||
          col(orderCol) > col("__last_seen"), lit(true))
          .otherwise(raise_error(concat(
            lit("scd2Extend: batch row for key "),
            col(key).cast("string"),
            lit(" orders at or before the stored history's " +
              "last_changed frontier — this operator takes " +
              "append-only change feeds only")))))
      .filter(col("__guard"))
      .select((col(key) +: col(orderCol) +: lit(0).as("__replay_ord") +:
        stateCols.map(col) ++: tieCols.map(col)): _*)
    // touched keys replay their stored versions as synthetic changes,
    // ordered by a DEDICATED numeric replay column: stored rows carry
    // their version (version order IS the original change order, so
    // same-instant stored rows re-sort correctly whatever the real
    // tie column's type), batch rows carry 0 — they can never tie
    // with a stored row (the guard forbids it), and batch-batch ties
    // fall through to the caller's own tie columns
    val tieTypes = tieCols.map(c => changes.schema(c).dataType)
    val storedAsChanges = touchedDim
      .select((col(key) +: col("valid_from").as(orderCol) +:
        col("version").as("__replay_ord") +:
        stateCols.map(col) ++:
        tieCols.zip(tieTypes).map { case (c, t) =>
          lit(null).cast(t).as(c)
        }): _*)
    val replayed = scd2(storedAsChanges.unionByName(checkedBatch),
      key, orderCol, stateCols, "__replay_ord" +: tieCols)
    // the replay saw only RETAINED stored instants, so its recomputed
    // frontier can sit below the stored one (collapsed no-ops) —
    // restore it; greatest() ignores the null a batch-only key gets
    val fixed = replayed.join(guard, Seq(key), "left")
      .withColumn("last_changed",
        greatest(col("last_changed"), col("__last_seen")))
      .drop("__last_seen")
    untouched.unionByName(fixed)
  }

  /** Point-in-time join: for each probe row, attach the dimension
    * version that was valid at `probe.asOfCol` — the lookup every
    * feature pipeline and every "report as of date X" runs against an
    * SCD2 table.
    *
    * Semantics: half-open intervals — version matches iff
    * `valid_from <= asOf && (valid_to is null || asOf < valid_to)`.
    * Because a key's intervals are disjoint by construction, each
    * probe matches AT MOST one version (probes before the key's first
    * version, or with no dimension key at all, keep null dimension
    * columns — left join).
    *
    * Plan shape: an EQUI-join on the key with the interval predicate
    * as a residual filter — one shuffle per side (or zero, if the
    * dimension is broadcast-sized), never a range-explosion: the
    * per-key match set is the key's version count, and the residual
    * keeps exactly one.
    */
  def pointInTime(probes: DataFrame, dim: DataFrame, key: String,
                  asOfCol: String): DataFrame = {
    val p = probes.alias("p")
    val d = dim.alias("d")
    p.join(d,
      col(s"p.$key") === col(s"d.$key") &&
        col("d.valid_from") <= col(s"p.$asOfCol") &&
        (col("d.valid_to").isNull ||
          col(s"p.$asOfCol") < col("d.valid_to")),
      "left")
      .drop(col(s"d.$key"))
  }
}
