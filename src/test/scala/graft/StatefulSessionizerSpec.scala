package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StatefulSessionizer
import graft.streaming.StatefulSessionizer.Event

class StatefulSessionizerSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stateful sessionizer: sessions persist in state across triggers") {
    val src = tmpDir("ss-src"); val out = tmpDir("ss-out"); val ckpt = tmpDir("ss-ckpt")

    def run(): Unit = {
      val stream = spark.readStream
        .schema("user_id LONG, ts TIMESTAMP, value DOUBLE")
        .parquet(src).as[Event]
      val q = StatefulSessionizer.sessions(spark, stream).writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .format("parquet").option("path", out)
        .start()
      q.awaitTermination()
    }

    // trigger 1: user 1 has two close events; user 2 one event
    Seq(Event(1L, ts("2024-01-01 10:00:00"), 1.0),
        Event(1L, ts("2024-01-01 10:10:00"), 2.0),
        Event(2L, ts("2024-01-01 10:05:00"), 5.0))
      .toDF().write.mode("append").parquet(src)
    run()

    // trigger 2: user 1 continues the SAME session (gap 20 min < 30);
    // a far-future event pushes the watermark past everything open
    Seq(Event(1L, ts("2024-01-01 10:30:00"), 3.0),
        Event(9L, ts("2024-01-02 00:00:00"), 0.0))
      .toDF().write.mode("append").parquet(src)
    run()
    // trigger 3: one more far event advances the watermark again so the
    // user-9 session can also time out if needed
    Seq(Event(9L, ts("2024-01-03 00:00:00"), 0.0))
      .toDF().write.mode("append").parquet(src)
    run()

    val sessions = spark.read.parquet(out)
      .filter(col("user_id").isin(1L, 2L))
      .orderBy("user_id").collect()
    assert(sessions.length === 2)
    val u1 = sessions(0)
    // the state store merged events across triggers into ONE session
    assert(u1.getAs[Long]("n_events") === 3L)
    assert(u1.getAs[Timestamp]("session_start") === ts("2024-01-01 10:00:00"))
    assert(math.abs(u1.getAs[Double]("session_value") - 6.0) < 1e-9)
    assert(sessions(1).getAs[Long]("n_events") === 1L)
  }
}
