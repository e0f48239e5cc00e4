package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Overflow posture of the fixed-point sum family (ADVICE r9): the
  * x10k-grid product is ~1e9 per row, so a LONG accumulator over an
  * unbounded group fails at ~9e9 rows — far below the 100 TB target's
  * ~1.5e11 rows/group. Under the session's ANSI mode (the Spark 4
  * repo default) the failure is a query-killing ARITHMETIC_OVERFLOW;
  * under non-ANSI it is a silent wrap. [[RelationalQueries
  * .sumX10kGrid]] accumulates DECIMAL(38,0) instead. Row counts that
  * large can't run in a spec, so the boundary is pinned with two rows
  * of extreme values.
  */
class FixedPointSumSpec extends SparkSpec {
  import spark.implicits._

  // true total 1.8e19 > Long.MaxValue (9.22e18)
  private def overRange =
    Seq(9000000000000000000L, 9000000000000000000L).toDF("v").coalesce(1)

  test("long sum past 2^63 kills the query under ANSI; the decimal accumulator stays exact") {
    val e = intercept[Exception] { overRange.agg(sum($"v")).collect() }
    assert(e.getMessage.contains("overflow") ||
      Option(e.getCause).exists(_.getMessage.contains("overflow")),
      s"expected the ANSI long-sum overflow, got: ${e.getMessage}")

    val exact = overRange.agg(sum($"v".cast("decimal(38,0)"))).first.getDecimal(0)
    assert(exact.toBigInteger == new java.math.BigInteger("18000000000000000000"))
  }

  test("the BIGINT presentation cast of an over-range decimal total rejects loudly") {
    val e = intercept[Exception] {
      overRange.agg(RelationalQueries.sumX10kGrid($"v")).collect()
    }
    val msgs = (Iterator(e.getMessage) ++
      Option(e.getCause).map(_.getMessage).iterator).mkString(" | ")
    assert(msgs.toLowerCase.contains("overflow") ||
      msgs.contains("CAST_OVERFLOW") || msgs.contains("cannot be represented"),
      s"expected a loud cast rejection, got: $msgs")
  }

  test("sumX10kGrid ≡ long sum while the total is in range") {
    val df = Seq(123456789L, -987654L, 5000000000L, 0L).toDF("v")
    val viaLong = df.agg(sum($"v")).first.getLong(0)
    val viaDec = df.agg(RelationalQueries.sumX10kGrid($"v")).first.getLong(0)
    assert(viaLong == viaDec && viaDec == 123456789L - 987654L + 5000000000L)
  }

  test("q1_agg's x10k measure survives the rewrite (non-null at spec scale)") {
    val q1 = RelationalQueries.q1Agg(spark, sf).collect()
    assert(q1.nonEmpty)
    assert(q1.forall(!_.isNullAt(q1.head.fieldIndex("sum_disc_price_x10k"))))
  }
}
