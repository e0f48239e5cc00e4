package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusOps, ShardManifest}

/** Incremental shard packing: stream ≡ one-shot batch, exactly-once
  * across crash-replays, loud out-of-order reject.
  */
class ShardManifestSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(ids: Range) =
    ids.map(i => (i.toLong, "tok " * (i % 23 + 1))).toDF("doc_id", "text")

  test("streamed packing equals the one-shot batch packing") {
    import graft.streaming.StreamingPipeline
    val path = tmpDir("sm-stream") + "/manifest"
    val all = mkDocs(0 until 300)
    val src = tmpDir("sm-src")
    // FileStreamSource orders the initial backlog by modification
    // time; pin strictly increasing mtimes on each slice's NEW files
    // so the trigger order can't depend on filesystem timestamp
    // granularity (a tie would legitimately trip the out-of-order
    // reject)
    import scala.jdk.CollectionConverters._
    val stamped = scala.collection.mutable.Set[java.nio.file.Path]()
    Seq(0 until 100, 100 until 220, 220 until 300).zipWithIndex
      .foreach { case (r, i) =>
        mkDocs(r).coalesce(1).write.mode("append").parquet(src)
        val listing = java.nio.file.Files.list(java.nio.file.Paths.get(src))
        val parts =
          try listing.iterator().asScala.toList
          finally listing.close()
        parts.filter(_.getFileName.toString.startsWith("part-"))
          .filterNot(stamped.contains)
          .foreach { p =>
            stamped += p
            java.nio.file.Files.setLastModifiedTime(p,
              java.nio.file.attribute.FileTime.fromMillis((i + 1) * 60000L))
          }
      }
    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    StreamingPipeline.packShardsStream(stream, path,
      tmpDir("sm-ckpt"), budget = 64).awaitTermination()
    val got = ShardManifest.assignments(spark, path)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = CorpusOps.packShards(all, budget = 64)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === want.toSeq,
      "incremental packing diverged from the one-shot definition")
    // files arrive in append order here, but the stream's trigger
    // order is the source's listing order — the monotone contract must
    // actually have been exercised (3 triggers recorded)
    assert(ShardManifest.state(spark, path).get.lastBatch === 2L)
  }

  test("a replayed batch id is a no-op; state totals are exact") {
    val path = tmpDir("sm-replay") + "/manifest"
    val b0 = mkDocs(0 until 50)
    val b1 = mkDocs(50 until 80)
    assert(ShardManifest.appendBatch(spark, path, b0, 64, 0L))
    assert(ShardManifest.appendBatch(spark, path, b1, 64, 1L))
    val before = ShardManifest.assignments(spark, path).collect().toSet
    val st = ShardManifest.state(spark, path).get
    // crash-replay: same batch id again → skipped, nothing changes
    assert(!ShardManifest.appendBatch(spark, path, b1, 64, 1L))
    assert(ShardManifest.assignments(spark, path).collect().toSet === before)
    assert(ShardManifest.state(spark, path).get === st)
    val tokens = b0.union(b1)
      .select(sum(ceil(length(col("text")) / 4.0).cast("bigint"))).head.getLong(0)
    assert(st.totalTokens === tokens)
    assert(st.maxDocId === 79L)
  }

  test("crash between assignments and state: replay converges to the clean result") {
    val path = tmpDir("sm-crash") + "/manifest"
    val ref = tmpDir("sm-crash-ref") + "/manifest"
    val b0 = mkDocs(0 until 60)
    val b1 = mkDocs(60 until 110)
    ShardManifest.appendBatch(spark, ref, b0, 64, 0L)
    ShardManifest.appendBatch(spark, ref, b1, 64, 1L)
    // the crash window: batch 1's assignments land but the process
    // dies BEFORE the state row is replaced — simulated by running
    // batch 1 fully, then restoring the pre-batch state file
    ShardManifest.appendBatch(spark, path, b0, 64, 0L)
    val stateDir = java.nio.file.Paths.get(s"$path/state")
    val saved = tmpDir("sm-crash-saved")
    org.apache.commons.io.FileUtils.copyDirectory(
      stateDir.toFile, new java.io.File(saved))
    ShardManifest.appendBatch(spark, path, b1, 64, 1L)
    org.apache.commons.io.FileUtils.deleteDirectory(stateDir.toFile)
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(saved), stateDir.toFile)
    assert(ShardManifest.state(spark, path).get.lastBatch === 0L,
      "crash simulation must restore the pre-batch state")
    // replay of batch 1 (same id, same data — the foreachBatch replay
    // contract) must rewrite the orphaned assignments idempotently
    // and complete the state flip
    assert(ShardManifest.appendBatch(spark, path, b1, 64, 1L))
    val got = ShardManifest.assignments(spark, path)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val want = ShardManifest.assignments(spark, ref)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(got === want, "healed manifest diverged from the clean run")
    assert(ShardManifest.state(spark, path).get ===
      ShardManifest.state(spark, ref).get)
  }

  test("writeShards materialises every document exactly once, in training order") {
    val out = tmpDir("sm-shards") + "/shards"
    val d = mkDocs(0 until 150)
    val asg = CorpusOps.packShards(d, budget = 96)
    graft.operators.ShardManifest.writeShards(d, asg, out)
    val back = spark.read.parquet(out)
    // exactly the corpus, no dup/loss, with its assignment attached
    assert(back.count() === 150L)
    assert(back.select("doc_id").distinct().count() === 150L)
    // per shard: files exist per shard dir; contents ordered by offset
    val byShard = back.select("shard_id", "start_token", "doc_id")
      .collect()
      .groupBy(_.getAs[Number]("shard_id").longValue())
    val wantShards = asg.select("shard_id").distinct().count()
    assert(byShard.size.toLong === wantShards)
    // training order inside a shard = offset order = doc_id order here
    byShard.values.foreach { rows =>
      val byOffset = rows.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
      assert(byOffset === byOffset.sorted)
    }
  }

  test("out-of-order documents are rejected loudly") {
    val path = tmpDir("sm-ooo") + "/manifest"
    assert(ShardManifest.appendBatch(spark, path, mkDocs(100 until 200), 64, 0L))
    val e = intercept[IllegalArgumentException] {
      ShardManifest.appendBatch(spark, path, mkDocs(0 until 50), 64, 1L)
    }
    assert(e.getMessage.contains("order-sensitive"))
    // the reject left no partial state: batch 1 can retry with good data
    assert(ShardManifest.state(spark, path).get.lastBatch === 0L)
    assert(ShardManifest.appendBatch(spark, path, mkDocs(200 until 220), 64, 1L))
  }
}
