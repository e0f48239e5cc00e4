package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.core._
import graft.operators.MultimodalOps
import graft.streaming.StreamingPipeline

class MultimodalStreamingSpec extends SparkSpec {
  import spark.implicits._

  test("multimodal: metadata projection keeps row alignment") {
    val docs = sources.Tables.documents(spark, sf)
    val media = MultimodalOps.fromDocuments(docs)
    assert(media.schema("payload").dataType.typeName === "binary")
    val meta = MultimodalOps.metadata(media)
    assert(meta.count() === docs.count())
    // byte_len of UTF-8 payload ≥ char count only when multibyte absent;
    // here text is ASCII so they are equal
    val mismatch = meta.join(docs, col("media_id") === col("doc_id"))
      .filter(col("byte_len") =!= length(col("text")).cast("long"))
    assert(mismatch.count() === 0)
  }

  test("multimodal: REAL PNG round-trip — decoded pixel sums match the pattern formula") {
    val docs = sources.Tables.documents(spark, sf).limit(40)
    val media = MultimodalOps.pngMedia(spark, docs)
    assert(media.schema("payload").dataType.typeName === "binary")
    // the payloads are genuine PNG containers (magic bytes), not fakes
    val magic = media.select("payload").head().getAs[Array[Byte]](0).take(8)
    assert(magic.map(_ & 0xff).toSeq ===
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
    val feats = MultimodalOps.imageFeatures(spark, media)
    assert(feats.count() === 40)
    // every decoded channel sum equals the closed-form pattern sum
    val n = MultimodalOps.PatternSize
    feats.collect().foreach { r =>
      val id = r.getAs[Long]("media_id")
      assert(r.getAs[Int]("width") === n && r.getAs[Int]("height") === n)
      for ((cname, c) <- Seq("sum_r" -> 0, "sum_g" -> 1, "sum_b" -> 2)) {
        val expected = (for (x <- 0 until n; y <- 0 until n)
          yield MultimodalOps.patternChannel(id, c, x, y).toLong).sum
        assert(r.getAs[Long](cname) === expected, s"media $id channel $cname")
      }
    }
  }

  test("multimodal: REAL JPEG round-trip is pixel-exact under the " +
      "flat-block contract; mixed table routes by magic bytes (r9 #3)") {
    val docs = sources.Tables.documents(spark, sf).limit(40)
    val media = MultimodalOps.mixedImageMedia(spark, docs)
    // genuine containers on both legs, detected from bytes (never mime)
    val byContainer = media
      .select(col("media_id"),
        MultimodalOps.containerCol(col("payload")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byContainer.nonEmpty)
    byContainer.foreach { case (id, c) =>
      assert(c === (if (id % 2 == 0) "png" else "jpeg"),
        s"media $id detected as $c")
    }
    // the LOSSY codec's decoded sums equal the closed form exactly
    val feats = MultimodalOps.imageFeatures(spark, media).collect()
    assert(feats.length === byContainer.size)
    feats.filter(_.getAs[Long]("media_id") % 2 == 1).foreach { r =>
      val id = r.getAs[Long]("media_id")
      assert(r.getAs[Int]("width") === MultimodalOps.JpegSize &&
        r.getAs[Int]("height") === MultimodalOps.JpegSize)
      val expected = (for (bx <- 0 until 2; by <- 0 until 2)
        yield 64L * MultimodalOps.jpegBlockGray(id, bx, by)).sum
      for (c <- Seq("sum_r", "sum_g", "sum_b"))
        assert(r.getAs[Long](c) === expected, s"media $id channel $c")
    }
    // unknown containers name themselves in the refusal
    val bad = Seq((7L, Array[Byte](1, 2, 3, 4, 5))).toDF("media_id", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      MultimodalOps.imageFeatures(spark, bad).count()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("container: unknown"))
  }

  test("multimodal: REAL resize rescales the raster; corrupt payloads fail loudly") {
    val docs = sources.Tables.documents(spark, sf).limit(10)
    val resized = MultimodalOps.resizeImages(
      spark, MultimodalOps.pngMedia(spark, docs), 4, 4)
    val f = MultimodalOps.imageFeatures(spark, resized)
    assert(f.count() === 10)
    assert(f.filter(col("width") =!= 4 || col("height") =!= 4).count() === 0)
    // nearest-neighbour 8→4 keeps pixels from the source raster, so per
    // medium every resized channel sum is positive and bounded by the
    // source image's sum (all channel values non-negative)
    val src = MultimodalOps.imageFeatures(
      spark, MultimodalOps.pngMedia(spark, docs))
    val outOfBounds = f.as("r").join(src.as("s"), "media_id")
      .filter(
        col("r.sum_r") <= 0 || col("r.sum_r") > col("s.sum_r") ||
        col("r.sum_g") <= 0 || col("r.sum_g") > col("s.sum_g") ||
        col("r.sum_b") <= 0 || col("r.sum_b") > col("s.sum_b"))
    assert(outOfBounds.count() === 0)
    val bad = Seq((7L, "definitely not a png".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      MultimodalOps.imageFeatures(spark, bad).count()
    }
    assert(e.getMessage.contains("not a decodable image") ||
      Option(e.getCause).exists(_.getMessage.contains("not a decodable image")))
  }

  test("multimodal: frame sampling fans out n frames per video") {
    val media = MultimodalOps.fromDocuments(sources.Tables.documents(spark, sf))
    val videos = media.filter(col("kind") === "video").count()
    val frames = MultimodalOps.sampleFrames(media, n = 4)
    assert(frames.count() === videos * 4)
    // frame byte ranges tile the payload exactly
    val total = frames.groupBy("media_id").agg(sum("frame_bytes").as("s"))
      .join(media, "media_id")
      .filter(col("s") =!= col("meta.byte_len"))
    assert(total.count() === 0)
  }

  test("streaming CDC: availableNow drain applies changes; checkpoint skips replay") {
    val src = tmpDir("st-src"); val dest = tmpDir("st-dest")
    val ckpt = tmpDir("st-ckpt")
    Seq((1L, "one"), (2L, "two-v2"), (3L, "three"))
      .toDF("id", "v").write.parquet(s"$src/t.parquet")
    Seq((2L, "two-v1"), (4L, "gone")).toDF("id", "v")
      .write.parquet(s"$dest/t.parquet")
    val ts = Timestamp.valueOf("2024-06-01 00:00:00")
    Seq(("a", "t", "id", "1", ts, "UPDATE"), ("a", "t", "id", "2", ts, "UPDATE"),
        ("a", "t", "id", "3", ts, "UPDATE"), ("a", "t", "id", "4", ts, "REMOVE"))
      .toDF("sourceDatabase", "sourceTable", "pkColumn", "pkValue",
        "timestampUpdated", "method")
      .write.parquet(s"$src/queue")
    val spec = PipelineSpec("a", "t", "id", "b", "t", src, dest,
      extractor = "queue", queuePath = Some(s"$src/queue"))

    StreamingPipeline.runAvailableNow(spark, spec, ckpt)
    val got = spark.read.parquet(s"$dest/t.parquet").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((1L, "one"), (2L, "two-v2"), (3L, "three")))

    // second run with the same checkpoint: no new files → no changes,
    // even though the queue files still exist (offsets, not acks)
    Seq((1L, "one-NEW")).toDF("id", "v").write.mode("overwrite")
      .parquet(s"$src/t.parquet")
    StreamingPipeline.runAvailableNow(spark, spec, ckpt)
    val again = spark.read.parquet(s"$dest/t.parquet").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(again === got)

    // new queue file arrives → only it is processed
    val ts2 = Timestamp.valueOf("2024-06-02 00:00:00")
    Seq(("a", "t", "id", "1", ts2, "UPDATE"))
      .toDF("sourceDatabase", "sourceTable", "pkColumn", "pkValue",
        "timestampUpdated", "method")
      .write.mode("append").parquet(s"$src/queue")
    StreamingPipeline.runAvailableNow(spark, spec, ckpt)
    val v1 = spark.read.parquet(s"$dest/t.parquet")
      .filter(col("id") === 1L).head().getString(1)
    assert(v1 === "one-NEW")
  }

  test("streaming CDC: a producer appending mid-drain loses no changes") {
    val src = tmpDir("cp-src"); val dest = tmpDir("cp-dest")
    val ckpt = tmpDir("cp-ckpt")
    // base carries the post-update truth the queue entries point at;
    // dest starts stale for 1..10 and holds two rows due for deletion
    (1 to 10).map(i => (i.toLong, s"new-$i")).toDF("id", "v")
      .write.parquet(s"$src/t.parquet")
    ((1 to 10).map(i => (i.toLong, "stale")) ++
      Seq((11L, "doomed"), (12L, "doomed"))).toDF("id", "v")
      .write.parquet(s"$dest/t.parquet")
    val spec = PipelineSpec("a", "t", "id", "b", "t", src, dest,
      extractor = "queue", queuePath = Some(s"$src/queue"))
    // seed one entry so the stream has a first batch to chew on
    def enqueue(id: Long, method: String, day: Int): Unit =
      Seq(("a", "t", "id", id.toString,
          Timestamp.valueOf(f"2024-06-$day%02d 00:00:00"), method))
        .toDF("sourceDatabase", "sourceTable", "pkColumn", "pkValue",
          "timestampUpdated", "method")
        .write.mode("append").parquet(s"$src/queue")
    enqueue(1L, "UPDATE", 1)

    val q = StreamingPipeline.start(spark, spec, ckpt,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
    try {
      // concurrent producer: appends land WHILE micro-batches run —
      // the file source must pick every one up on a later listing
      for (i <- 2 to 10) { enqueue(i.toLong, "UPDATE", i); Thread.sleep(60) }
      enqueue(11L, "REMOVE", 11)
      enqueue(12L, "REMOVE", 12)
      val expected = (1 to 10).map(i => (i.toLong, s"new-$i")).toSet
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var got = Set.empty[(Long, String)]
      while (got != expected && System.nanoTime() < deadline) {
        Thread.sleep(250)
        // dest swaps atomically per micro-batch; a read can race the
        // swap, so tolerate transient failures while polling
        got = try spark.read.parquet(s"$dest/t.parquet").collect()
          .map(r => (r.getLong(0), r.getString(1))).toSet
        catch { case _: Throwable => got }
      }
      assert(got === expected,
        s"drain missed concurrent appends: ${expected -- got} absent, " +
          s"${got -- expected} unexpected")
    } finally q.stop()
  }

  test("streaming CDC honours the spec's transformer like the batch pipeline") {
    val src = tmpDir("sttr-src"); val dest = tmpDir("sttr-dest")
    val ckpt = tmpDir("sttr-ckpt")
    Seq((1L, "one"), (2L, "two")).toDF("id", "v").write.parquet(s"$src/t.parquet")
    val ts = Timestamp.valueOf("2024-06-01 00:00:00")
    Seq(("a", "t", "id", "1", ts, "UPDATE"), ("a", "t", "id", "2", ts, "UPDATE"))
      .toDF("sourceDatabase", "sourceTable", "pkColumn", "pkValue",
        "timestampUpdated", "method")
      .write.parquet(s"$src/queue")
    // tablerenamer: the same YAML knob must mean the same thing under
    // the streaming scheduler — output lands in the RENAMED table
    val spec = PipelineSpec("a", "t", "id", "b", "t", src, dest,
      extractor = "queue", transformer = "tablerenamer",
      queuePath = Some(s"$src/queue"),
      params = Params(tableName = Some("renamed")))
    StreamingPipeline.runAvailableNow(spark, spec, ckpt)
    val got = spark.read.parquet(s"$dest/renamed.parquet").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((1L, "one"), (2L, "two")))
    assert(!new java.io.File(s"$dest/t.parquet").exists(),
      "rows must not ALSO land under the original table name")
  }

  test("streaming: watermarked exact dedup keeps first sighting, bounds state") {
    val src = tmpDir("sd-src")
    // 60 docs: 20 distinct texts, each appearing 3x with later timestamps
    val rows = (0 until 60).map { i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-01 10:${i % 50}%02d:00"),
        s"doc body number ${i % 20}")
    }
    rows.toDF("doc_id", "ts", "text").coalesce(1).write.parquet(s"$src/docs")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$src/docs").schema)
      .parquet(s"$src/docs")
    val out = tmpDir("sd-out"); val ckpt = tmpDir("sd-ckpt")
    val q = StreamingPipeline.dedupStream(stream).writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").option("path", out).start()
    q.awaitTermination()
    val got = spark.read.parquet(out)
    assert(got.count() === 20) // one survivor per distinct content
    assert(got.select("fp").distinct().count() === 20)
    // the plan carries the state-evicting dedup operator, not the
    // unbounded-state dropDuplicates
    assert(StreamingPipeline.dedupStream(stream).queryExecution.logical.toString
      .contains("WithinWatermark"))
  }

  test("streaming: watermarked tumbling window matches the batch plan") {
    val src = tmpDir("wm-src")
    val rows = (0 until 200).map { i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-01 ${i % 24}%02d:00:01"),
        if (i % 2 == 0) "a" else "b", i * 1.5)
    }
    rows.toDF("event_id", "ts", "event_type", "value").write.parquet(s"$src/ev")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$src/ev").schema)
      .parquet(s"$src/ev")
    val out = tmpDir("wm-out"); val ckpt = tmpDir("wm-ckpt")
    val q = StreamingPipeline.windowedCounts(stream).writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").option("path", out).start()
    q.awaitTermination()
    val streamed = spark.read.parquet(out)
    val batch = StreamingPipeline.windowedCounts(
      spark.read.parquet(s"$src/ev"))
    // append-mode emits only watermark-closed windows; with availableNow
    // the final watermark closes all but the max-event-time window
    assert(streamed.count() >= batch.count() - 2)
    val joined = streamed.as("s").join(batch.as("b"),
      Seq("hour_start", "event_type"))
      .filter(col("s.n") =!= col("b.n") || col("s.sum_value") =!= col("b.sum_value"))
    assert(joined.count() === 0)
  }
  test("streaming: stream-stream interval join matches the batch " +
    "join; state is watermark-bounded") {
    val src = tmpDir("ssj-src")
    // views every 10 min per user; purchases at offsets that land
    // inside AND outside the 1 h attribution horizon
    val views = (0 until 120).map { i =>
      (i.toLong, (i % 5).toLong,
        Timestamp.valueOf(f"2024-01-01 ${i / 12}%02d:${(i % 12) * 5}%02d:00"),
        0.0)
    }
    val purchases = (0 until 40).map { i =>
      (1000L + i, (i % 5).toLong,
        Timestamp.valueOf(f"2024-01-01 ${(i / 4) + 1}%02d:${(i % 4) * 13}%02d:07"),
        i * 2.5)
    }
    views.toDF("event_id", "user_id", "ts", "value")
      .write.parquet(s"$src/views")
    purchases.toDF("event_id", "user_id", "ts", "value")
      .write.parquet(s"$src/purch")
    def stream(dir: String) = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
    val out = tmpDir("ssj-out"); val ckpt = tmpDir("ssj-ckpt")
    StreamingPipeline.attributionJoinStream(
      stream(s"$src/views"), stream(s"$src/purch"))
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").option("path", out).start().awaitTermination()
    val streamed = spark.read.parquet(out)
    val batch = StreamingPipeline.attributionJoinStream(
      spark.read.parquet(s"$src/views"),
      spark.read.parquet(s"$src/purch"))
    assert(streamed.count() > 0, "the horizon must attribute something")
    assert(streamed.except(batch).count() === 0 &&
      batch.except(streamed).count() === 0,
      "stream-stream interval join diverged from the batch join")
    // the physical plan is the symmetric stream-stream join operator
    // with watermark-driven state eviction, not a static-side join
    val plan = StreamingPipeline.attributionJoinStream(
      stream(s"$src/views"), stream(s"$src/purch"))
      .queryExecution.logical.toString
    assert(plan.contains("EventTimeWatermark"),
      s"both sides must carry watermarks:\n$plan")
    // leftOuter (the conversion-funnel shape): unmatched views emit
    // with null purchase columns once "no match" is watermark-decided;
    // matched rows equal the inner result exactly
    val out2 = tmpDir("ssj-out2"); val ckpt2 = tmpDir("ssj-ckpt2")
    StreamingPipeline.attributionJoinStream(
      stream(s"$src/views"), stream(s"$src/purch"),
      joinType = "leftOuter")
      .writeStream.option("checkpointLocation", ckpt2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").option("path", out2).start().awaitTermination()
    val outer = spark.read.parquet(out2)
    val outerMatched = outer.filter(col("purchase_id").isNotNull)
    assert(outerMatched.except(streamed).count() === 0 &&
      streamed.except(outerMatched).count() === 0,
      "leftOuter's matched rows must equal the inner join")
    // views whose join window closed under the final watermark and
    // matched nothing appear exactly once with null purchase columns
    val unmatched = outer.filter(col("purchase_id").isNull)
    assert(unmatched.count() > 0,
      "the fixture has views with no purchase inside the horizon")
    assert(unmatched.select("view_id").distinct().count() ===
      unmatched.count(), "one null-emission per unmatched view")
    assert(unmatched.join(streamed.select("view_id").distinct(),
      Seq("view_id"), "left_semi").count() === 0,
      "a matched view must never also null-emit")
  }

  test("dhash: every bit matches the driver-side pattern reference; clones land hamming-near") {
    val docs = sources.Tables.documents(spark, sf).limit(30)
    val media = MultimodalOps.pngMedia(spark, docs)
    val withClones = media.unionByName(
      MultimodalOps.perturbClones(spark, media))
    val got = MultimodalOps.imageDHash(spark, withClones)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver reference: gray(x,y) from the pattern formula, bit (y,x) =
    // gray(x) > gray(x+1), little-endian packed — clones bump (0,0) red
    def gray(base: Long, pert: Boolean, x: Int, y: Int): Long = {
      val r0 = MultimodalOps.patternChannel(base, 0, x, y)
      val r = if (pert && x == 0 && y == 0) (r0 + 96) % 256 else r0
      r.toLong + MultimodalOps.patternChannel(base, 1, x, y) +
        MultimodalOps.patternChannel(base, 2, x, y)
    }
    def ref(base: Long, pert: Boolean): Long = {
      var bits = 0L
      for (y <- 0 until 8; x <- 0 until 7)
        if (gray(base, pert, x, y) > gray(base, pert, x + 1, y))
          bits |= 1L << (y * 7 + x)
      bits
    }
    val baseIds = docs.select("doc_id").collect().map(_.getLong(0))
    baseIds.foreach { id =>
      assert(got(id) === ref(id, pert = false), s"dhash mismatch for $id")
      assert(got(id + 1000000L) === ref(id, pert = true),
        s"clone dhash mismatch for $id")
    }
    // the edit is perceptually small: every clone is within 2 bits
    baseIds.foreach { id =>
      val ham = java.lang.Long.bitCount(got(id) ^ got(id + 1000000L))
      assert(ham <= 2, s"clone of $id drifted $ham bits")
    }
    // near-dup join surfaces every (original, clone) twin exactly
    val pairs = MultimodalOps.imageNearDup(spark, withClones)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    baseIds.foreach { id =>
      assert(pairs.exists(p => p._1 == id && p._2 == id + 1000000L),
        s"missing twin pair for $id")
    }
    // banded-join exhaustiveness: pairs equal the all-pairs filter
    val all = for {
      a <- got.keys.toSeq; b <- got.keys.toSeq if a < b
      h = java.lang.Long.bitCount(got(a) ^ got(b)) if h <= 4
    } yield (a, b, h)
    assert(pairs.toSet === all.toSet,
      "banded join must equal the exhaustive hamming filter")
  }

  test("audio: REAL WAV round-trip — decoded window features match the waveform formula") {
    val docs = sources.Tables.documents(spark, sf).limit(60)
    val media = MultimodalOps.wavMedia(spark, docs)
    assert(media.schema("payload").dataType.typeName === "binary")
    // genuine RIFF/WAVE containers, not raw PCM blobs
    val head = media.select("payload").head().getAs[Array[Byte]](0)
    assert(new String(head.take(4), "US-ASCII") === "RIFF")
    assert(new String(head.slice(8, 12), "US-ASCII") === "WAVE")
    val feats = MultimodalOps.audioFeatures(spark, media)
      .orderBy("media_id", "win_no").collect()
    val ids = media.select("media_id").as[Long].collect().sorted
    val win = MultimodalOps.AudioWindow
    val nWin = MultimodalOps.AudioSamples / win
    assert(feats.length === ids.length * nWin)
    // driver-side reference from the closed form, bit-for-bit
    val ref = for (id <- ids; w <- 0 until nWin) yield {
      val s = Array.tabulate(win)(j => MultimodalOps.audioSample(id, w * win + j))
      val zc = (1 until win).count(j => (s(j) >= 0) != (s(j - 1) >= 0))
      (id, w, s.map(v => v.toLong * v).sum, zc.toLong, s.map(math.abs).max)
    }
    assert(feats.map(r => (r.getAs[Long]("media_id"), r.getAs[Int]("win_no"),
      r.getAs[Long]("sum_sq"), r.getAs[Long]("zero_cross"),
      r.getAs[Int]("peak"))).toSeq === ref.toSeq)
  }

  test("audio fingerprint: gain-scaled clones land hamming-near, banded join is exhaustive") {
    val docs = sources.Tables.documents(spark, sf).limit(90)
    val m = MultimodalOps.noiseWavMedia(spark, docs)
    val withClones = m.unionByName(MultimodalOps.gainClones(spark, m))
    val fp = MultimodalOps.audioFingerprint(spark, withClones)
      .collect().map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("afp"))).toMap
    val baseIds = fp.keys.filter(_ < MultimodalOps.CloneOffset).toSeq.sorted
    assert(baseIds.nonEmpty)
    // driver-side reference for one base clip: energies from the formula
    val id = baseIds.head
    val s = Array.tabulate(MultimodalOps.AudioSamples)(MultimodalOps.noiseSample(id, _))
    val es = s.grouped(MultimodalOps.AudioSubWin).map(_.map(v => v.toLong * v).sum).toArray
    val ref = (0 until es.length - 1)
      .filter(k => es(k) > es(k + 1)).map(1L << _).sum
    assert(fp(id) === ref, "fingerprint must match the closed-form contour")
    // gain invariance: uniform volume change preserves the energy
    // contour up to rounding — every clone within the dedup radius
    baseIds.foreach { b =>
      val h = java.lang.Long.bitCount(fp(b) ^ fp(b + MultimodalOps.CloneOffset))
      assert(h <= 4, s"clip $b: gain clone drifted to hamming $h")
    }
    // md5 waveforms decorrelate clips: every planted clone pair is
    // found, and coincidental collisions stay rare (the affine sweep
    // collided ~12% of ALL pairs — the degenerate-fixture failure)
    val pairs = MultimodalOps.audioNearDup(spark, withClones)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    baseIds.foreach { b =>
      assert(pairs.exists(p => p._1 == b && p._2 == b + MultimodalOps.CloneOffset),
        s"missing clone pair for $b")
    }
    val coincidental = pairs.count(p => p._2 - p._1 != MultimodalOps.CloneOffset)
    assert(coincidental <= pairs.size / 4,
      s"fixture degenerate: $coincidental coincidental of ${pairs.size}")
    // banded join equals the exhaustive hamming filter
    val all = for {
      a <- fp.keys.toSeq; b <- fp.keys.toSeq if a < b
      h = java.lang.Long.bitCount(fp(a) ^ fp(b)) if h <= 4
    } yield (a, b, h)
    assert(pairs === all.toSet)
  }

  test("video: REAL demux + per-frame decode — dhashes match the formula; one cut per clip") {
    val docs = sources.Tables.documents(spark, sf).limit(60)
    val media = MultimodalOps.videoMedia(spark, docs)
    // genuine GVID containers carrying genuine PNG frames
    val head = media.select("payload").head().getAs[Array[Byte]](0)
    assert(new String(head.take(4), "US-ASCII") === "GVID")
    val fd = MultimodalOps.frameDHashes(spark, media)
      .collect()
      .map(r => ((r.getAs[Long]("media_id"), r.getAs[Int]("frame_no")),
        r.getAs[Long]("dhash"))).toMap
    val ids = fd.keys.map(_._1).toSeq.distinct.sorted
    assert(ids.nonEmpty && fd.size === ids.length * MultimodalOps.VideoFrames)
    // driver-side reference from videoChannel, bit-for-bit (one clip)
    val id = ids.head
    (0 until MultimodalOps.VideoFrames).foreach { f =>
      val gray = Array.tabulate(8, 8)((y, x) =>
        (0 to 2).map(c => MultimodalOps.videoChannel(id, f, c, x, y)).sum)
      val ref = (for (y <- 0 until 8; x <- 0 until 7
                      if gray(y)(x) > gray(y)(x + 1))
        yield 1L << (y * 7 + x)).sum
      assert(fd((id, f)) === ref, s"frame $f dhash mismatch")
    }
    // in-scene neighbours are near; the planted cut is the ONLY far pair
    val cuts = MultimodalOps.sceneChanges(spark, media)
      .collect().map(r => (r.getAs[Long]("media_id"), r.getAs[Int]("cut_frame")))
    assert(cuts.length === ids.length, "exactly one cut per clip")
    assert(cuts.forall(_._2 == MultimodalOps.VideoCut),
      s"cut must land at frame ${MultimodalOps.VideoCut}")
    ids.foreach { v =>
      (1 until MultimodalOps.VideoFrames)
        .filter(_ != MultimodalOps.VideoCut).foreach { f =>
          val h = java.lang.Long.bitCount(fd((v, f)) ^ fd((v, f - 1)))
          assert(h <= 4, s"in-scene jitter too large: clip $v frame $f ($h bits)")
        }
    }
  }

  test("video: malformed container refuses loudly") {
    import spark.implicits._
    val bad = Seq((9L, Array[Byte]('G', 'V', 'I', 'X', 0, 0, 0, 1)))
      .toDF("media_id", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      MultimodalOps.frameDHashes(spark, bad).collect()
    }
    assert(e.getMessage.contains("not a GVID container") ||
      Option(e.getCause).exists(_.getMessage.contains("not a GVID container")))
  }

  test("audio: only audio-kind docs synthesize; malformed payload refuses loudly") {
    val docs = sources.Tables.documents(spark, sf)
    val media = MultimodalOps.wavMedia(spark, docs)
    val kinds = media.select("media_id").as[Long].collect()
    assert(kinds.nonEmpty && kinds.forall(_ % 3 == 1))
    val bad = Seq((7L, Array[Byte](1, 2, 3))).toDF("media_id", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      MultimodalOps.audioFeatures(spark, bad).collect()
    }
    assert(e.getMessage.contains("not a decodable WAV") ||
      Option(e.getCause).exists(_.getMessage.contains("not a decodable WAV")))
  }

}
