package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints, evaluated in ONE scan — the
  * validation gate a training pipeline runs on every ingest batch
  * before the data is allowed near an index, a store, or a tokenizer
  * (the Deequ/Great-Expectations shape, re-expressed as a single
  * Spark aggregate). At 100 TB the defining property is that a
  * constraint SUITE costs one pass: every check below compiles to a
  * conditional-count (or count-distinct) column of the same
  * aggregate, so checking 20 constraints reads the table exactly once
  * — map-side combined, no join, no window, nothing driver-side but
  * the ≤ |constraints| result rows.
  *
  * (`Unique` adds the standard multi-distinct expand to that
  * aggregate — k distinct checks replicate the scan's rows k+1× in
  * the exchange, the documented Spark cost of exact distinct counts;
  * everything else stays a plain conditional count.)
  *
  * Emission protocol matches [[ProfileOps]]: ratios leave as
  * fixed-point longs (`violation_ppm` = violations·10^6 div total),
  * never rounded doubles, so the report hash-checks across engines.
  */
object ConstraintOps {

  /** One declarative check. `violations` semantics per case are
    * documented on the fields; null handling follows SQL practice —
    * a null value violates `NotNull` and nothing else (range/pattern/
    * set checks skip nulls, compose with `NotNull` to forbid them).
    */
  sealed trait Constraint {
    /** Short machine name in the report (`check_name`). */
    def name: String
    /** The column (or comma-joined columns) the report names. */
    def target: String
    /** The aggregate counting this check's violating rows. */
    private[ConstraintOps] def violationsAgg: Column
  }

  /** Null values in `column` are violations. */
  final case class NotNull(column: String) extends Constraint {
    def name = "not_null"
    def target: String = column
    private[ConstraintOps] def violationsAgg: Column =
      count(when(col(column).isNull, 1))
  }

  /** Duplicate (non-null) tuples of `columns` are violations:
    * violations = non-null-tuple rows − distinct non-null tuples.
    */
  final case class Unique(columns: Seq[String]) extends Constraint {
    def name = "unique"
    def target: String = columns.mkString(",")
    private[ConstraintOps] def violationsAgg: Column =
      count(when(columns.map(col(_).isNotNull).reduce(_ && _), 1)) -
        countDistinct(columns.head, columns.tail: _*)
  }

  /** Non-null values outside `[lo, hi]` are violations. */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Constraint {
    def name = "in_range"
    def target: String = column
    private[ConstraintOps] def violationsAgg: Column =
      count(when(col(column) < lo || col(column) > hi, 1))
  }

  /** Non-null values NOT matching `regex` (rlike — unanchored; anchor
    * explicitly) are violations.
    */
  final case class Matches(column: String, regex: String)
      extends Constraint {
    def name = "matches"
    def target: String = column
    private[ConstraintOps] def violationsAgg: Column =
      count(when(col(column).isNotNull && !col(column).rlike(regex), 1))
  }

  /** Non-null values outside the allowed set are violations. */
  final case class InSet(column: String, values: Seq[String])
      extends Constraint {
    def name = "in_set"
    def target: String = column
    private[ConstraintOps] def violationsAgg: Column =
      count(when(col(column).isNotNull &&
        !col(column).isin(values: _*), 1))
  }

  /** Fewer than `n` rows is a violation (reported as the shortfall —
    * how many rows are missing). The ingest-sanity check: an upstream
    * export that silently truncated shows up here, not three stages
    * later as a mysteriously small index.
    */
  final case class MinRows(n: Long) extends Constraint {
    def name = "min_rows"
    def target = "*"
    private[ConstraintOps] def violationsAgg: Column =
      greatest(lit(n) - count(lit(1)), lit(0L))
  }

  /** Evaluate the suite: one row per constraint, in declaration order
    * — `(check_no, check_name, target, violations, total_rows,
    * violation_ppm, passed)`. One aggregate job however long the
    * suite; the ≤ |constraints| result rows are assembled by exploding
    * the single aggregate row, so nothing is collected.
    */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "constraint suite is empty")
    val aggs: Seq[Column] = count(lit(1)).as("__total") +:
      constraints.zipWithIndex.map { case (c, i) =>
        c.violationsAgg.cast("long").as(s"__v$i")
      }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val items = constraints.zipWithIndex.map { case (c, i) =>
      struct(lit(i + 1L).as("check_no"), lit(c.name).as("check_name"),
        lit(c.target).as("target"), col(s"__v$i").as("violations"))
    }
    row.select(col("__total"), explode(array(items: _*)).as("c"))
      .select(col("c.check_no"), col("c.check_name"), col("c.target"),
        col("c.violations"),
        col("__total").as("total_rows"),
        // fixed-point ppm over exact integers (ProfileOps protocol);
        // an empty table reports 0 ppm (and fails via MinRows, the
        // check that owns that case)
        expr("(CAST(c.violations AS DECIMAL(38,0)) * 1000000)" +
          " div greatest(__total, 1)").as("violation_ppm"),
        (col("c.violations") === 0L).as("passed"))
      .orderBy("check_no")
  }
}
