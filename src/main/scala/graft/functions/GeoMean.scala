package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed UDAF (§2.9 UDAF slot): geometric mean as an
  * `Aggregator` — log-domain running sum, so the buffer is two scalars
  * and partial aggregation (map-side combine) works like any built-in.
  * Registered as SQL `geomean` by `GraftSession.configure`; the DuckDB
  * oracle replays it as `exp(avg(ln(x)))`.
  */
object GeoMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    if (x > 0) (b._1 + math.log(x), b._2 + 1) else b
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(r: (Double, Long)): Double =
    if (r._2 == 0) Double.NaN else math.exp(r._1 / r._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
