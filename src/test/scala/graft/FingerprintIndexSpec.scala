package graft

import org.apache.spark.sql.functions._

import graft.operators.{FingerprintIndex, MultimodalOps}
import graft.streaming.StreamingPipeline

class FingerprintIndexSpec extends SparkSpec {
  import spark.implicits._

  private def media = {
    val docs = sources.Tables.documents(spark, sf).limit(80)
    val m = MultimodalOps.noisePngMedia(spark, docs)
    m.unionByName(MultimodalOps.perturbClones(spark, m))
  }

  private def fps = MultimodalOps.imageDHash(spark, media)
    .withColumnRenamed("dhash", "fp").localCheckpoint()

  private def pairsVia(path: String, probe: org.apache.spark.sql.DataFrame) =
    FingerprintIndex.classify(spark, path, probe)
      .filter($"media_id" < $"indexed_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("index-served classify equals the direct banded near-dup") {
    val f = fps
    val path = tmpDir("fp-idx")
    FingerprintIndex.write(f, path, nBits = 56)
    val direct = MultimodalOps.imageNearDup(spark, media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairsVia(path, f) === direct)
    assert(direct.nonEmpty)
  }

  test("bucket granularity follows index size and never changes verdicts " +
      "(optimization r13: adaptive bucket_mod, frozen in meta)") {
    val f = fps
    // small index → few bucket directories (the small-file tax fix);
    // forcing the historical 256-mod via the conf reproduces the old
    // layout and the verdict set must be IDENTICAL either way
    val adaptive = tmpDir("fp-idx-adaptive")
    FingerprintIndex.write(f, adaptive, nBits = 56)
    def dirCount(p: String): Int =
      new java.io.File(s"$p/fps").listFiles()
        .count(d => d.isDirectory && d.getName.startsWith("bvp="))
    val nAdaptive = dirCount(adaptive)
    spark.conf.set("spark.graft.fpindex.rowsPerBucket", "1")
    val fine = tmpDir("fp-idx-fine")
    try FingerprintIndex.write(f, fine, nBits = 56)
    finally spark.conf.unset("spark.graft.fpindex.rowsPerBucket")
    val nFine = dirCount(fine)
    assert(nAdaptive < nFine,
      s"adaptive layout should use fewer bucket dirs ($nAdaptive vs $nFine)")
    assert(pairsVia(adaptive, f) === pairsVia(fine, f))
    // the frozen mod survives append: growing the adaptive store must
    // land rows in the SAME directory set, not re-derive a new mod
    val before = nAdaptive
    FingerprintIndex.append(f, adaptive) // idempotent replay, no new dirs
    assert(dirCount(adaptive) === before)
  }

  test("append is row-level idempotent and heals a partial replay; conflicts reject") {
    val f = fps
    val path = tmpDir("fp-idx-app")
    val (half1, half2) = (f.filter($"media_id" % 2 === 0),
      f.filter($"media_id" % 2 =!= 0))
    FingerprintIndex.write(half1, path, nBits = 56)
    FingerprintIndex.append(half2, path)
    val oneShot = tmpDir("fp-idx-oneshot")
    FingerprintIndex.write(f, oneShot, nBits = 56)
    assert(pairsVia(path, f) === pairsVia(oneShot, f))
    // replayed append (same rows) is a no-op, not a reject
    FingerprintIndex.append(half2, path)
    assert(pairsVia(path, f) === pairsVia(oneShot, f))
    // a conflicting fingerprint for an indexed id refuses loudly
    val conflict = half2.withColumn("fp", col("fp") + 1L)
    val e = intercept[IllegalArgumentException] {
      FingerprintIndex.append(conflict, path)
    }
    assert(e.getMessage.contains("differs"))
  }

  test("delete suppresses immediately; compact folds without changing verdicts") {
    val f = fps
    val path = tmpDir("fp-idx-del")
    FingerprintIndex.write(f, path, nBits = 56)
    val before = pairsVia(path, f)
    val victim = before.head._2
    FingerprintIndex.delete(spark, path, Seq(victim))
    val after = pairsVia(path, f)
    assert(after === before.filterNot(p => p._1 == victim || p._2 == victim))
    assert(FingerprintIndex.stats(spark, path)
      .select("tombstoned_ids").head.getLong(0) === 1L)
    // re-appending a tombstoned id rejects loudly (the idempotence
    // anti-join would otherwise swallow it silently)
    val eT = intercept[IllegalArgumentException] {
      FingerprintIndex.append(f.filter($"media_id" === victim), path)
    }
    assert(eT.getMessage.contains("tombstoned"))
    FingerprintIndex.compact(spark, path)
    assert(pairsVia(path, f) === after)
    assert(FingerprintIndex.stats(spark, path)
      .select("tombstoned_ids").head.getLong(0) === 0L)
    // the slot is reusable after the physical fold
    FingerprintIndex.append(f.filter($"media_id" === victim), path)
    assert(pairsVia(path, f) === before)
  }

  test("classify's store scan is pruned to the probe's bucket partitions") {
    val f = fps
    val path = tmpDir("fp-idx-plan")
    FingerprintIndex.write(f, path, nBits = 56)
    val probe = f.limit(3)
    val plan = FingerprintIndex.classify(spark, path, probe)
      .queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[.*bvp.*"),
      s"fingerprint-index scan lost bucket partition pruning:\n$plan")
  }

  test("start-from-nothing edges: empty build, empty append, empty-store compact") {
    val f = fps
    val path = tmpDir("fp-idx-empty")
    FingerprintIndex.write(f.limit(0), path, nBits = 56)
    assert(pairsVia(path, f).isEmpty)       // empty store, empty verdicts
    FingerprintIndex.compact(spark, path)   // no data files — must not throw
    FingerprintIndex.append(f.limit(0), path) // empty batch — no-op
    FingerprintIndex.append(f, path)
    val oneShot = tmpDir("fp-idx-empty-ref")
    FingerprintIndex.write(f, oneShot, nBits = 56)
    assert(pairsVia(path, f) === pairsVia(oneShot, f))
    // build-time conflicting fps reject like append-time ones
    val e = intercept[IllegalArgumentException] {
      FingerprintIndex.write(
        f.unionByName(f.withColumn("fp", col("fp") + 1L)),
        tmpDir("fp-idx-dup"), nBits = 56)
    }
    assert(e.getMessage.contains("conflicting"))
  }

  test("mediaDedupStream over 3 triggers emits the batch operator's pair set") {
    val f = fps
    val ids = f.select("media_id").as[Long].collect().sorted
    val cut1 = ids(ids.length / 3); val cut2 = ids(2 * ids.length / 3)
    val src = tmpDir("fp-stream-src")
    import scala.jdk.CollectionConverters._
    val stamped = scala.collection.mutable.Set[java.nio.file.Path]()
    Seq(f.filter($"media_id" <= cut1),
      f.filter($"media_id" > cut1 && $"media_id" <= cut2),
      f.filter($"media_id" > cut2)).zipWithIndex.foreach { case (b, i) =>
      b.coalesce(1).write.mode("append").parquet(src)
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
    val path = tmpDir("fp-stream-idx")
    FingerprintIndex.write(f.limit(0), path, nBits = 56)
    val pairs = tmpDir("fp-stream-pairs")
    val stream = spark.readStream.schema(f.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    StreamingPipeline.mediaDedupStream(stream, path, pairs,
      tmpDir("fp-stream-ckpt")).awaitTermination()
    val streamed = spark.read.parquet(s"$pairs/b_*")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val direct = MultimodalOps.imageNearDup(spark, media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(streamed === direct)
  }
}
