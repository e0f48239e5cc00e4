package graft

import org.apache.spark.sql.SparkSession

import graft.core._

/** The BASELINE.md derived metric: sustained drain throughput (rows/s),
  * seeded source → empty sink until tracking catches up, per extractor
  * discipline, at BatchSize ∈ {1k, 10k}.
  *
  * Prints one JSON line per (extractor, batchSize) run. `orders` drives
  * the sequential discipline (unique integral key), `events` the
  * timestamp discipline (REPLACE loads — each batch pays the upsert
  * rewrite, which is the honest cost of idempotent replay on plain
  * parquet; the INSERT path measures the append-only fast path).
  */
object DrainBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    // stage the events table as a plain-timestamp copy (the raw table is
    // TIMESTAMP(NANOS); extractors read through Tables.readTable anyway,
    // but staging keeps the measured path identical to a user table)
    val staged = java.nio.file.Files.createTempDirectory("drain-src").toString
    graft.sources.Tables.events(spark, sfDir)
      .write.parquet(s"$staged/events.parquet")
    graft.sources.Tables.orders(spark, sfDir)
      .write.parquet(s"$staged/orders.parquet")

    // the partitionBy leg drains events into a value-partitioned
    // destination (day-derived immutable column staged onto the copy):
    // the REPLACE rewrite per batch then touches only the partitions
    // the batch's rows live in instead of the whole table
    graft.sources.Tables.events(spark, sfDir)
      .withColumn("day", org.apache.spark.sql.functions
        .date_format(org.apache.spark.sql.functions.col("ts"), "yyyy-MM-dd"))
      .write.parquet(s"$staged/events_day.parquet")

    val runs = Seq(
      ("sequential", "orders", "o_orderkey", 1000, None),
      ("sequential", "orders", "o_orderkey", 10000, None),
      ("timestamp", "events", "ts", 1000, None),
      ("timestamp", "events", "ts", 10000, None),
      ("timestamp", "events_day", "ts", 1000, Some("day")),
      ("timestamp", "events_day", "ts", 10000, Some("day")))

    runs.foreach { case (extractor, table, key, batch, partitionBy) =>
      val dest = java.nio.file.Files.createTempDirectory(s"drain-$extractor-$batch").toString
      val spec = PipelineSpec("bench", table, key, "out", table,
        staged, dest, extractor = extractor,
        primaryKey = Some(if (table.startsWith("events")) "event_id" else key),
        params = Params(batchSize = batch, partitionByCol = partitionBy))
      val tracking = new TrackingStore(spark, s"$dest/_tracking")
      val t0 = System.nanoTime()
      val totals = new Pipeline(spark, spec, tracking).drain()
      val secs = (System.nanoTime() - t0) / 1e9
      val rows = totals.values.sum
      val layout = partitionBy.map(c => s"partitionBy=$c").getOrElse("flat")
      println(f"""{"metric":"drain_rows_per_sec","extractor":"$extractor","table":"$table","layout":"$layout","batchSize":$batch,"rows":$rows,"seconds":$secs%.2f,"value":${rows / secs}%.0f}""")
    }
    spark.stop()
  }
}
