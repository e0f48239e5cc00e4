package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.core._
import graft.operators._

/** Extractor-discipline semantics: watermark strictness (ST3), OnlyPast
  * (R3), fallback coalesce (S3), queue CDC with REMOVE synthesis and
  * commit-after-load ack (S4/R8/H2).
  */
class ExtractorsSpec extends SparkSpec {
  import spark.implicits._

  private def tsSpec(src: String, dest: String, extractor: String,
                     key: String = "ts", batch: Int = 100,
                     onlyPast: Boolean = false) = PipelineSpec(
    sourceDatabase = "a", sourceTable = "t", sourceKey = key,
    destinationDatabase = "b", destinationTable = "t",
    sourcePath = src, destinationPath = dest, extractor = extractor,
    primaryKey = Some("id"),
    params = Params(batchSize = batch, onlyPast = onlyPast))

  private def mkTs(s: String) = Timestamp.valueOf(s)

  test("timestamp extractor: strict-> watermark, replay idempotent") {
    val src = tmpDir("ts-src"); val dest = tmpDir("ts-dest")
    Seq((1L, mkTs("2024-01-01 10:00:00")), (2L, mkTs("2024-01-01 11:00:00")),
        (3L, mkTs("2024-01-01 12:00:00")))
      .toDF("id", "ts").write.parquet(s"$src/t.parquet")
    val tracking = new TrackingStore(spark, s"$dest/_tracking")
    val p = new Pipeline(spark, tsSpec(src, dest, "timestamp"), tracking)
    assert(p.drain()("REPLACE") === 3L)
    // rows AT the watermark are skipped on re-poll (ST3); REPLACE keeps it idempotent
    assert(p.drain()("REPLACE") === 0L)
    assert(spark.read.parquet(s"$dest/t.parquet").count() === 3)
    val st = tracking.get("a", "t").get
    assert(st.timestampPosition.get === mkTs("2024-01-01 12:00:00"))
  }

  test("timestamp extractor: OnlyPast excludes future rows") {
    val src = tmpDir("op-src"); val dest = tmpDir("op-dest")
    Seq((1L, mkTs("2024-01-01 10:00:00")), (2L, mkTs("2099-01-01 10:00:00")))
      .toDF("id", "ts").write.parquet(s"$src/t.parquet")
    val p = new Pipeline(spark, tsSpec(src, dest, "timestamp", onlyPast = true),
      new TrackingStore(spark, s"$dest/_tracking"))
    assert(p.drain()("REPLACE") === 1L)
    val got = spark.read.parquet(s"$dest/t.parquet")
    assert(got.agg(max("id")).head().getLong(0) === 1L)
  }

  test("timestamp_fallback: coalesce(a, b) drives the watermark") {
    val src = tmpDir("fb-src"); val dest = tmpDir("fb-dest")
    Seq((1L, Some(mkTs("2024-01-02 00:00:00")), mkTs("2024-01-01 00:00:00")),
        (2L, None, mkTs("2024-01-03 00:00:00")))
      .toDF("id", "updated", "created").write.parquet(s"$src/t.parquet")
    val p = new Pipeline(spark,
      tsSpec(src, dest, "timestamp_fallback", key = "updated,created"),
      new TrackingStore(spark, s"$dest/_tracking"))
    assert(p.drain()("REPLACE") === 2L)
    val st = new TrackingStore(spark, s"$dest/_tracking").get("a", "t").get
    // max(coalesce(updated, created)) = 2024-01-03 from the NULL-updated row
    assert(st.timestampPosition.get === mkTs("2024-01-03 00:00:00"))
  }

  test("sequential extractor: SequentialReplace tags REPLACE") {
    val src = tmpDir("sr-src"); val dest = tmpDir("sr-dest")
    Seq((1L, "x"), (2L, "y")).toDF("id", "v").write.parquet(s"$src/t.parquet")
    val spec = PipelineSpec("a", "t", "id", "b", "t", src, dest,
      params = Params(sequentialReplace = true))
    val p = new Pipeline(spark, spec, new TrackingStore(spark, s"$dest/_tracking"))
    assert(p.drain()("REPLACE") === 2L)
  }

  test("queue extractor: composite PK lookup, REMOVE synthesis, ack after load") {
    val src = tmpDir("q-src"); val dest = tmpDir("q-dest")
    Seq((1L, 10L, "keep"), (1L, 11L, "update-me"), (2L, 10L, "delete-me"))
      .toDF("k1", "k2", "v").write.parquet(s"$src/t.parquet")
    Seq((2L, 10L, "old")).toDF("k1", "k2", "v").write.parquet(s"$dest/t.parquet")
    val ts = mkTs("2024-06-01 00:00:00")
    Seq(("a", "t", "k1,k2", "1,11", ts, "UPDATE"),
        ("a", "t", "k1,k2", "2,10", ts, "REMOVE"))
      .toDF("sourceDatabase", "sourceTable", "pkColumn", "pkValue",
        "timestampUpdated", "method")
      .write.parquet(s"$src/MigratorRecordQueue")
    val spec = PipelineSpec("a", "t", "k1,k2", "b", "t", src, dest,
      extractor = "queue")
    val p = new Pipeline(spark, spec, new TrackingStore(spark, s"$dest/_tracking"))
    p.drain()
    val got = spark.read.parquet(s"$dest/t.parquet")
      .orderBy("k1", "k2").collect()
    // REMOVE deleted (2,10); UPDATE upserted (1,11)
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ===
      Seq((1L, 11L, "update-me")))
    assert(spark.read.parquet(s"$src/MigratorRecordQueue").count() === 0)
  }
}
