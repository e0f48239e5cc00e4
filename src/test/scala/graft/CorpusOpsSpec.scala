package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusOps, TextOps}

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a a a a", "en"),
    (2L, "b c d e", "en"),
    (3L, "x y x y", "de")
  ).toDF("doc_id", "text", "lang")

  test("repetition fractions match hand computation") {
    val r = TextOps.repetition(docs).orderBy("doc_id")
      .select("doc_id", "dup_token_frac_x10k", "dup_bigram_frac_x10k",
        "top_token_frac_x10k")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    // doc1 [a,a,a,a]: dup tokens (4-1)/4, bigrams ["a a"]×3 → (3-1)/3,
    // mode 4/4; doc2 [b,c,d,e]: none, mode 1/4; doc3 [x,y,x,y]:
    // dup (4-2)/4, bigrams [x y, y x, x y] distinct 2 of 3 → (3-2)/3,
    // mode 2/4 — all ×10⁴ truncated
    assert(r.toSeq == Seq(
      (1L, 7500L, 6666L, 10000L),
      (2L, 0L, 0L, 2500L),
      (3L, 5000L, 3333L, 5000L)))
  }

  test("repetition skips single-token documents") {
    val one = Seq((9L, "solo", "en")).toDF("doc_id", "text", "lang")
    assert(TextOps.repetition(one).count() === 0)
  }

  test("stratified sample is deterministic and respects stratum rates") {
    val d = spark.range(1000).select(col("id").as("doc_id"),
      when(col("id") % 2 === 0, "en").otherwise("de").as("lang"))
      .withColumn("text", lit("irrelevant"))
    // rate 1.0 keeps the whole stratum, rate 0.0 drops the other entirely
    val kept = CorpusOps.stratifiedSample(d, Map("en" -> 1.0), defaultRate = 0.0)
    assert(kept.filter(col("lang") === "de").count() === 0)
    assert(kept.filter(col("lang") === "en").count() === 500)
    // a 50% hash rate lands near half (hash16 uniformity), and twice
    // the same plan yields the identical sample (no RNG)
    val half = CorpusOps.stratifiedSample(d, Map("en" -> 0.5), defaultRate = 0.0)
    val n = half.count()
    assert(n > 175 && n < 325, s"expected ~250 of 500, got $n")
    val again = CorpusOps.stratifiedSample(d, Map("en" -> 0.5), defaultRate = 0.0)
    assert(half.exceptAll(again).isEmpty && again.exceptAll(half).isEmpty)
  }

  test("pack sequences: per-lang bins, token totals conserved, budget boundaries") {
    // est_tokens = ceil(7/4) = 2 for every doc; budget 2 ⇒ each en doc
    // opens its own bin (cum-exclusive 0, 2), de has one bin
    val out = CorpusOps.packSequences(docs, budget = 2)
      .orderBy("lang", "bin_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("de", 0L, 1L, 2L),
      ("en", 0L, 1L, 2L),
      ("en", 1L, 1L, 2L)))
  }

  test("exclusivePrefixSum equals the global-window cumsum on any partitioning") {
    import org.apache.spark.sql.expressions.Window
    // bijective id scramble (gcd(37, 5000) = 1) → a total order whose
    // range partitioning differs from the input row order
    val d = spark.range(5000).select(
      (col("id") * 37 % 5000).as("k"), (col("id") % 13).cast("long").as("v"))
    val expected = d
      .withColumn("e", sum("v").over(Window.orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val got = CorpusOps.exclusivePrefixSum(d, Seq("k"), "v")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === expected)
    // determinism under a hostile input partitioning
    val got7 = CorpusOps.exclusivePrefixSum(d.repartition(7), Seq("k"), "v")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got7 === expected)
    // fewer rows than shuffle partitions → empty range partitions
    val tiny = Seq((3L, 10L), (1L, 5L), (2L, 7L)).toDF("k", "v")
    val t = CorpusOps.exclusivePrefixSum(tiny, Seq("k"), "v")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(t === Map(1L -> 0L, 2L -> 5L, 3L -> 12L))
  }

  test("exclusivePrefixSum rejects a non-total order loudly") {
    // duplicated order key: the pair's cumsums would be
    // arrival-order-dependent — must throw, not emit either answer
    val dup = Seq((1L, 2L), (2L, 1L), (1L, 3L)).toDF("k", "v")
    val e = intercept[Throwable] {
      CorpusOps.exclusivePrefixSum(dup, Seq("k"), "v").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m => m.contains("total")),
      s"expected the total-order reject, got: ${messages(e)}")
  }

  test("packShards: global greedy packing matches the sequential definition") {
    val d = (1 to 200).map(i => (i.toLong, "w " * (i % 40 + 1), "en"))
      .toDF("doc_id", "text", "lang")
    val got = CorpusOps.packShards(d, budget = 64)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // sequential replay on the driver
    var cum = 0L
    val want = (1 to 200).map { i =>
      val text = "w " * (i % 40 + 1)
      val tok = math.ceil(text.length / 4.0).toLong
      val row = (i.toLong, tok, cum, cum / 64)
      cum += tok
      row
    }
    assert(got.toSeq === want)
    // shard ids are non-decreasing in doc order and start at 0
    assert(got.head._4 === 0L)
    assert(got.sliding(2).forall(p => p(0)._4 <= p(1)._4))
    // shard membership is exactly the integral-division contract
    val starts = got.groupBy(_._4).map { case (s, rs) => s -> rs.map(_._3).min }
    starts.foreach { case (s, st) => assert(st >= s * 64 && st < (s + 1) * 64) }
  }

  test("mixture weights: temperature flattens shares but preserves order") {
    val d = graft.sources.Tables.documents(spark, sf)
      .withColumnRenamed("lang", "ignored") // uses `source`
    val natural = CorpusOps.mixtureWeights(d, alpha = 1.0)
      .select("source", "mix_weight").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val smoothed = CorpusOps.mixtureWeights(d, alpha = 0.5)
      .select("source", "mix_weight").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(natural.keySet === smoothed.keySet)
    // weights are a distribution
    assert(math.abs(natural.values.sum - 1.0) < 1e-4)
    assert(math.abs(smoothed.values.sum - 1.0) < 1e-4)
    // α < 1 moves every share toward uniform: biggest shrinks, smallest grows
    val bigSrc = natural.maxBy(_._2)._1
    val smallSrc = natural.minBy(_._2)._1
    if (natural(bigSrc) > natural(smallSrc)) {
      assert(smoothed(bigSrc) <= natural(bigSrc) + 1e-9)
      assert(smoothed(smallSrc) >= natural(smallSrc) - 1e-9)
      // ranking by weight is preserved (monotone transform)
      assert(smoothed(bigSrc) >= smoothed(smallSrc))
    }
    // allocations never overshoot the budget (floor semantics)
    val alloc = CorpusOps.mixtureWeights(d).agg(sum("alloc_tokens")).head.getLong(0)
    assert(alloc <= 1000000L)
  }

  test("per-group sample: exact k, deterministic, small groups kept whole") {
    val d = spark.range(500).select(col("id").as("doc_id"),
      when(col("id") % 3 === 0, "en")
        .when(col("id") % 3 === 1, "de").otherwise("zh").as("lang"))
    val s = CorpusOps.samplePerGroup(d, k = 10)
    val counts = s.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ == 10L))
    // deterministic: identical winner set on re-run
    val s2 = CorpusOps.samplePerGroup(d, k = 10)
    assert(s.exceptAll(s2).isEmpty && s2.exceptAll(s).isEmpty)
    // a group smaller than k survives in full
    val tiny = d.limit(4)
    assert(CorpusOps.samplePerGroup(tiny, k = 10).count() === 4)
  }

  test("per-group sample ranks exactly as the window form — bounded " +
    "TopKStrAgg partials, no Window in plan") {
    import org.apache.spark.sql.expressions.Window
    val d = spark.range(500).select(col("id").as("doc_id"),
      when(col("id") % 3 === 0, "en")
        .when(col("id") % 3 === 1, "de").otherwise("zh").as("lang"))
    val got = CorpusOps.samplePerGroup(d, k = 7)
    assert(!got.queryExecution.executedPlan.toString.contains("Window"))
    val want = d.select(col("doc_id"), col("lang"),
        row_number().over(Window.partitionBy("lang")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id")))
          .cast("bigint").as("rn"))
      .filter(col("rn") <= 7)
    assert(got.except(want).count() === 0 && want.except(got).count() === 0)
    // rank column itself agrees row-for-row, not just the winner set
    assert(got.join(want, Seq("doc_id", "lang"))
      .filter(got("rn") =!= want("rn")).count() === 0)
  }

  test("pack sequences equals the per-lang window form on a skewed corpus") {
    import org.apache.spark.sql.expressions.Window
    // 90% of docs in one stratum — the shape that makes the window
    // form a single task; text lengths vary so bins are non-trivial
    val d = spark.range(800).select(col("id").as("doc_id"),
        when(col("id") % 10 === 0, "de").otherwise("en").as("lang"))
      .withColumn("text",
        concat_ws("", array_repeat(lit("x"), (col("doc_id") % 37 + 1).cast("int"))))
    val got = CorpusOps.packSequences(d, budget = 16)
      .orderBy("lang", "bin_id").collect().toSeq
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = d.select(col("doc_id"), col("lang"),
        ceil(length(col("text")) / 4.0).cast("bigint").as("est_tokens"))
      .withColumn("cum", sum("est_tokens").over(w))
      .withColumn("bin_id",
        floor((col("cum") - col("est_tokens")) / lit(16.0)).cast("bigint"))
      .groupBy("lang", "bin_id")
      .agg(count(lit(1)).as("n_docs"), sum("est_tokens").as("bin_tokens"))
      .orderBy("lang", "bin_id").collect().toSeq
    assert(got === want)
  }

  test("weighted sample: deterministic, proportion-biased, loud on bad weights") {
    val d = spark.range(400).select(col("id").as("doc_id"),
      // ids < 40 are 'heavy' (weight 10), the rest weight 1
      when(col("id") < 40, 10.0).otherwise(1.0).as("quality_score"))
    val s = CorpusOps.weightedSample(d, k = 50, seed = "t")
    val ids = s.select("doc_id").as[Long].collect().toSet
    assert(ids.size === 50)
    // determinism: a different partitioning reproduces the winner set
    val s2 = CorpusOps.weightedSample(d.repartition(7), k = 50, seed = "t")
    assert(s2.select("doc_id").as[Long].collect().toSet === ids)
    // proportion bias: the heavy 10% carry half the total weight
    // (40·10 = 360·1), so ~half the sample should be heavy; at the very
    // least they must be far over-represented vs their 10% share
    val heavy = ids.count(_ < 40)
    assert(heavy >= 15, s"heavy docs under-sampled: $heavy of 50")
    // a fresh seed is a fresh draw (overlap yes, identity no)
    val s3 = CorpusOps.weightedSample(d, k = 50, seed = "u")
    assert(s3.select("doc_id").as[Long].collect().toSet !== ids)
    // non-positive weight fails loudly with the offending id
    val bad = d.withColumn("quality_score",
      when(col("doc_id") === 7, 0.0).otherwise(col("quality_score")))
    val e = intercept[Exception] {
      CorpusOps.weightedSample(bad, k = 5, seed = "t").collect()
    }
    assert(e.getMessage.contains("doc_id=7"))
  }

  test("chunking: windows overlap by the configured amount, short docs stay whole") {
    val d = Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")), // 100 tokens
      (2L, (1 to 5).map(i => s"s$i").mkString(" "))    // short -> one chunk
    ).toDF("doc_id", "text")
    val out = CorpusOps.chunkDocuments(d, chunkTokens = 32, overlap = 8)
      .orderBy("doc_id", "chunk_no").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // doc 1: stride 24, ceil((100-32)/24) = 3 -> 4 chunks covering
    // [0,32) [24,56) [48,80) [72,100): sizes 32,32,32,28
    assert(out.filter(_._1 == 1L).toSeq ===
      Seq((1L, 0, 32L), (1L, 1, 32L), (1L, 2, 32L), (1L, 3, 28L)))
    // doc 2: one whole chunk of 5
    assert(out.filter(_._1 == 2L).toSeq === Seq((2L, 0, 5L)))
  }

  test("chunking: every token position is covered (no gaps at any length)") {
    val d = spark.range(1, 80).select(col("id").as("doc_id"),
      expr("concat_ws(' ', transform(sequence(1, cast(id as int)), i -> concat('w', i)))")
        .as("text"))
    val chunks = CorpusOps.chunkDocuments(d, chunkTokens = 16, overlap = 4)
    // per doc: last chunk must END at the doc's token count, i.e.
    // stride * last_chunk_no + its size == n  (windows tile with overlap)
    val bad = chunks.groupBy("doc_id")
      .agg(max(col("chunk_no") * 12 + col("n_chunk_tokens")).as("covered"))
      .join(d.select(col("doc_id"), col("doc_id").as("n")), "doc_id")
      .filter(col("covered") =!= col("n"))
    assert(bad.isEmpty, bad.collect().mkString(","))
  }

  test("corpus operators are total on an empty corpus") {
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
    val emptyS = empty.withColumnRenamed("lang", "source")
    assert(CorpusOps.chunkDocuments(empty).count() === 0)
    assert(CorpusOps.packSequences(empty).count() === 0)
    assert(CorpusOps.samplePerGroup(empty, k = 5).count() === 0)
    assert(CorpusOps.stratifiedSample(empty, Map("en" -> 0.5), 0.1).count() === 0)
    assert(CorpusOps.mixtureWeights(emptyS).count() === 0)
  }

  test("pack sequences conserves the corpus token total at sf0.001") {
    val d = graft.sources.Tables.documents(spark, sf)
    val total = d.select(ceil(length(col("text")) / 4.0).cast("bigint").as("e"))
      .agg(sum("e")).head.getLong(0)
    val packed = CorpusOps.packSequences(d, budget = 512)
    assert(packed.agg(sum("bin_tokens")).head.getLong(0) === total)
    assert(packed.agg(sum("n_docs")).head.getLong(0) === d.count())
    // bin ids start at 0 in every lang; full contiguity additionally
    // holds only while no document exceeds the budget (an oversized doc
    // legitimately skips bins — "the budget is a target"), so assert it
    // conditionally on that data property
    assert(packed.groupBy("lang").agg(min("bin_id").as("mn"))
      .filter(col("mn") =!= 0).isEmpty)
    val maxDoc = d.select(ceil(length(col("text")) / 4.0).cast("bigint").as("e"))
      .agg(max("e")).head.getLong(0)
    if (maxDoc <= 512) {
      val gaps = packed.groupBy("lang")
        .agg(max("bin_id").as("mx"), count(lit(1)).as("n"))
        .filter(col("mx") =!= col("n") - 1)
      assert(gaps.isEmpty, "no doc exceeds the budget, so bins must be dense")
    }
  }

  test("shuffle order: reproducible permutation, seed-sensitive, range-sorted plan") {
    val d = graft.sources.Tables.documents(spark, sf)
    val once = CorpusOps.shuffleOrder(d, seed = "graft")
      .select("doc_id").as[Long].collect()
    // a permutation: every doc exactly once
    assert(once.sorted.toSeq == d.select("doc_id").as[Long].collect().sorted.toSeq)
    assert(once.toSeq != once.sorted.toSeq, "order must actually be shuffled")
    // reproducible across partitionings; a new seed is a new permutation
    val again = CorpusOps.shuffleOrder(d.repartition(7), seed = "graft")
      .select("doc_id").as[Long].collect()
    assert(again.sameElements(once), "permutation must not depend on partitioning")
    val other = CorpusOps.shuffleOrder(d, seed = "graft2")
      .select("doc_id").as[Long].collect()
    assert(!other.sameElements(once), "a fresh seed must re-permute")
    // the global sort must plan as a range-partitioned sort (TeraSort
    // shape), never a single-partition collapse
    val plan = CorpusOps.shuffleOrder(d, seed = "graft")
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"),
      s"global sort should range-partition:\n$plan")
  }
  test("snapshotDiff: added/removed/changed exact, unchanged dropped") {
    import org.apache.spark.sql.functions._
    val old = Seq((1L, "same"), (2L, "will-change"), (3L, "gone"))
      .toDF("doc_id", "text")
    val cur = Seq((1L, "same"), (2L, "changed!"), (4L, "fresh"))
      .toDF("doc_id", "text")
    val diff = CorpusOps.snapshotDiff(old, cur, "doc_id", Seq("text"))
    val got = diff.select("doc_id", "status").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq === Seq((2L, "changed"), (3L, "removed"),
      (4L, "added")))
    // unchanged (id 1) must not appear — the row the filter exists for
    assert(!diff.select("doc_id").collect().map(_.getLong(0)).contains(1L))
    // equi-join shape, never a cartesian
    diff.collect()
    val plan = diff.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"diff join shape:\n$plan")
    // multi-column hashing distinguishes per-column change
    val multi = CorpusOps.snapshotDiff(
      Seq((9L, "a", 1)).toDF("doc_id", "text", "v"),
      Seq((9L, "a", 2)).toDF("doc_id", "text", "v"),
      "doc_id", Seq("text", "v"))
    assert(multi.select("status").head.getString(0) === "changed")
    // column-boundary shifts must NOT collide: ("ab","c") vs ("a","bc")
    // concat to the same string but are a real change
    val shifted = CorpusOps.snapshotDiff(
      Seq((5L, "ab", "c")).toDF("doc_id", "t1", "t2"),
      Seq((5L, "a", "bc")).toDF("doc_id", "t1", "t2"),
      "doc_id", Seq("t1", "t2"))
    assert(shifted.select("status").head.getString(0) === "changed",
      "boundary-shifted columns must hash differently")
    // null -> empty is a change, not a concat_ws-skipped collision
    val nulled = CorpusOps.snapshotDiff(
      Seq((6L, None: Option[String])).toDF("doc_id", "text"),
      Seq((6L, Some(""))).toDF("doc_id", "text"),
      "doc_id", Seq("text"))
    assert(nulled.select("status").head.getString(0) === "changed",
      "null-to-empty must be reported as changed")
  }

  test("epochSchedule: repeats bracket epochs, totals track allocations") {
    import org.apache.spark.sql.functions._
    val d = graft.sources.Tables.documents(spark, sf)
    val alloc = CorpusOps.mixtureWeights(d)
    val sched = CorpusOps.epochSchedule(d, alloc, seed = "ep1")
      .localCheckpoint()
    // per doc: repeats ∈ {⌊epochs⌋, ⌊epochs⌋+1} (epochs = epochs_x1m/1e6)
    assert(sched.filter(col("repeats") < floor(col("epochs_x1m") / 1000000L) ||
      col("repeats") > floor(col("epochs_x1m") / 1000000L) + 1).count() === 0L)
    // per source: realised token total within 10% of the allocation
    // (fractional-epoch coin flips are the only slack)
    val bySource = sched.groupBy("source")
      .agg(sum(col("repeats") * col("est_tokens")).as("got"))
      .join(alloc.select("source", "alloc_tokens"), "source")
      .collect()
    bySource.foreach { r =>
      val (got, want) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(got - want) / want < 0.10,
        s"source ${r.getString(0)}: realised $got vs allocated $want")
    }
    // deterministic: same seed → identical schedule; new seed differs
    val again = CorpusOps.epochSchedule(d, alloc, seed = "ep1")
    assert(sched.orderBy("doc_id").collect().toSeq ===
      again.orderBy("doc_id").collect().toSeq)
    val other = CorpusOps.epochSchedule(d, alloc, seed = "ep2")
      .select("doc_id", "repeats").orderBy("doc_id").collect()
    assert(other.toSeq !==
      sched.select("doc_id", "repeats").orderBy("doc_id").collect().toSeq,
      "a fresh seed must re-draw the fractional repeats")
    // expand: one row per copy, zero-repeat docs absent
    val expanded = CorpusOps.epochExpand(sched)
    assert(expanded.count() ===
      sched.agg(sum("repeats")).head.getLong(0))
    assert(expanded.filter(col("copy_no") < 1).count() === 0L)
    // a zero-token source fails loudly, never NaN epochs
    val emptySrc = Seq((1L, "", "s1"), (2L, "real text here", "s2"))
      .toDF("doc_id", "text", "source")
    val e = intercept[Exception] {
      CorpusOps.epochSchedule(emptySrc,
        Seq(("s1", 100L), ("s2", 100L)).toDF("source", "alloc_tokens"),
        "ep").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(msgs(e).exists(_.contains("no tokens")))
  }

  test("curriculumOrder rejects null and out-of-range scores loudly") {
    import org.apache.spark.sql.functions._
    val bad = Seq((1L, Some(0.5)), (2L, None: Option[Double]))
      .toDF("doc_id", "score")
    val e = intercept[Exception] {
      CorpusOps.curriculumOrder(bad, "cur").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(msgs(e).exists(_.contains("score out of")),
      "null score must fail loudly, not land in the top band")
    intercept[Exception] {
      CorpusOps.curriculumOrder(
        Seq((1L, -0.1)).toDF("doc_id", "score"), "cur").collect()
    }
    // exact 1.0 is legal (clamps into the top band)
    val one = CorpusOps.curriculumOrder(
      Seq((1L, 1.0)).toDF("doc_id", "score"), "cur")
      .select("qband").head.getInt(0)
    assert(one === 9)
  }

  test("curriculumOrder: bands descend, in-band shuffled, no global rank") {
    import org.apache.spark.sql.functions._
    val scored = (0 until 200).map(i => (i.toLong, (i % 100) / 100.0))
      .toDF("doc_id", "score")
    val out = CorpusOps.curriculumOrder(scored, seed = "cur")
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getString(3)))
    // every doc exactly once, bands non-increasing down the order
    assert(out.map(_._1).sorted.toSeq == (0L until 200L).toSeq)
    assert(out.map(_._2).toSeq == out.map(_._2).sortBy(-_).toSeq,
      "quality bands must descend")
    // within a band the order is the md5 shuffle, not doc_id order
    val topBand = out.filter(_._2 == 9)
    assert(topBand.map(_._3).toSeq == topBand.map(_._3).sorted.toSeq)
    assert(topBand.map(_._1).toSeq != topBand.map(_._1).sorted.toSeq,
      "in-band order must be shuffled, not id order")
    // score 1.0-adjacent values clamp into the top band, never band 10
    val clamped = CorpusOps.curriculumOrder(
      Seq((1L, 0.9999), (2L, 0.0)).toDF("doc_id", "score"), "cur")
      .select("qband").collect().map(_.getInt(0))
    assert(clamped.toSeq == Seq(9, 0))
    // no ntile/window: the plan is a plain range-partitioned sort
    val plan = CorpusOps.curriculumOrder(scored, "cur")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"curriculum must not rank:\n$plan")
    assert(plan.contains("rangepartitioning"))
  }

  test("splitAssign: deterministic, boundary-exact, subset-stable") {
    val d = spark.range(500).select(col("id").as("doc_id"),
      concat(lit("s"), col("id") % 3).as("source"), lit("x").as("text"))
    val a = CorpusOps.splitAssign(d, "seed1").orderBy("doc_id").collect()
    // pure function of the id: partitioning must not move anyone
    val b = CorpusOps.splitAssign(d.repartition(7), "seed1")
      .orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq, "assignment must not depend on partitioning")
    // buckets in [0,100), split boundaries exact
    assert(a.forall { r =>
      val bk = r.getLong(2); val s = r.getString(3)
      bk >= 0 && bk < 100 &&
        s == (if (bk < 80) "train" else if (bk < 90) "val" else "test")
    })
    // roughly 80/10/10 (hash16 is uniform; 500 ids gives wide slack)
    val frac = a.count(_.getString(3) == "train") / 500.0
    assert(frac > 0.7 && frac < 0.9, s"train frac $frac off 0.8")
    // subset stability: re-ingesting a filtered corpus keeps survivors'
    // splits — the leakage guarantee
    val sub = CorpusOps.splitAssign(d.filter(col("doc_id") % 3 === 0), "seed1")
      .orderBy("doc_id").collect()
    assert(sub.toSeq == a.filter(_.getLong(0) % 3 == 0).toSeq)
    // a fresh seed is a fresh split
    val c = CorpusOps.splitAssign(d, "seed2").orderBy("doc_id").collect()
    assert(a.zip(c).exists { case (x, y) => x.getString(3) != y.getString(3) })
    // invalid percentages refuse loudly
    intercept[IllegalArgumentException] {
      CorpusOps.splitAssign(d, "s", trainPct = 95, valPct = 10)
    }
    // trainPct + valPct == 100 is the legitimate two-way train/val
    // split: empty test residue, boundaries still exact
    val twoWay = CorpusOps.splitAssign(d, "seed1", trainPct = 90, valPct = 10)
      .collect()
    assert(twoWay.forall(_.getString(3) != "test"), "two-way split has no test rows")
    assert(twoWay.exists(_.getString(3) == "val"))
  }

  test("rendezvousRoute: adding a shard moves docs ONLY to it, " +
    "removing one moves only its own docs, assignments balanced") {
    val d = spark.range(3000).select(col("id").as("doc_id"))
    val s4 = Seq("a", "b", "c", "d")
    def routes(shards: Seq[String]): Map[Long, String] =
      CorpusOps.rendezvousRoute(d, shards, "rv")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val r4 = routes(s4)
    // grow: every reassignment lands on the new shard; expectation
    // 1/5 of the corpus moves (wide slack for 3000 draws)
    val r5 = routes(s4 :+ "e")
    val moved = r4.keys.filter(k => r5(k) != r4(k))
    assert(moved.forall(k => r5(k) == "e"),
      "a grown cluster must pull docs only INTO the new shard")
    assert(moved.size > 3000 / 5 / 2 && moved.size < 3000 / 5 * 2,
      s"~1/5 of 3000 should move, got ${moved.size}")
    // shrink: survivors of the removed shard scatter; everyone else
    // stays exactly put
    val r3 = routes(Seq("a", "b", "c"))
    assert(r4.keys.filter(k => r4(k) != "d")
      .forall(k => r3(k) == r4(k)),
      "removing a shard must not move any other shard's docs")
    // balance: each shard within 2x of the uniform share
    val sizes = r4.values.groupBy(identity).map(_._2.size)
    assert(sizes.min > 3000 / 4 / 2 && sizes.max < 3000 / 4 * 2,
      s"unbalanced routing: $sizes")
    // determinism across partitionings (pure function of the id)
    val rep = CorpusOps.rendezvousRoute(d.repartition(7), s4, "rv")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rep === r4)
  }

  test("rendezvousRoute: pure projection (no Exchange), single-shard " +
    "edge, loud guards") {
    val d = spark.range(100).select(col("id").as("doc_id"))
    val plan = CorpusOps.rendezvousRoute(d, Seq("a", "b", "c"), "rv")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"routing must be a pure projection:\n$plan")
    assert(CorpusOps.rendezvousRoute(d, Seq("only"), "rv")
      .select("shard").distinct().collect().map(_.getString(0)).toSeq
      === Seq("only"))
    intercept[IllegalArgumentException] {
      CorpusOps.rendezvousRoute(d, Seq.empty, "rv")
    }
    intercept[IllegalArgumentException] {
      CorpusOps.rendezvousRoute(d, Seq("a", "a"), "rv")
    }
    intercept[IllegalArgumentException] {
      CorpusOps.rendezvousRoute(d,
        (0 to 4096).map(i => s"s$i"), "rv")
    }
    // a null id must error loudly, not land in a null "shard"
    val withNull = Seq(Some(1L), None).toDF("doc_id")
    val eNull = intercept[Exception] {
      CorpusOps.rendezvousRoute(withNull, Seq("a", "b"), "rv").collect()
    }
    assert(eNull.getMessage.contains("null doc_id") ||
      Option(eNull.getCause).exists(_.getMessage.contains("null doc_id")))
  }

  test("rendezvousRouteWeighted: shares track the weights, a weight " +
    "bump moves docs ONLY into the bumped shard, loud guards") {
    val d = spark.range(4000).select(col("id").as("doc_id"))
    def routes(shards: Seq[(String, Int)]): Map[Long, String] =
      CorpusOps.rendezvousRouteWeighted(d, shards, "rvw")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val base = routes(Seq(("a", 1), ("b", 2), ("c", 5)))
    val shares = base.values.groupBy(identity).map { case (s, g) =>
      s -> g.size / 4000.0 }
    // expected 1/8, 2/8, 5/8 — wide slack for 4000 draws
    assert(math.abs(shares("a") - 0.125) < 0.04, s"a: ${shares("a")}")
    assert(math.abs(shares("b") - 0.250) < 0.05, s"b: ${shares("b")}")
    assert(math.abs(shares("c") - 0.625) < 0.05, s"c: ${shares("c")}")
    // bump b's weight: only moves INTO b (new virtual entry b#2 wins
    // some docs; every other assignment is untouched)
    val bumped = routes(Seq(("a", 1), ("b", 3), ("c", 5)))
    val moved = base.keys.filter(k => bumped(k) != base(k))
    assert(moved.nonEmpty)
    assert(moved.forall(k => bumped(k) == "b"),
      "a weight bump must pull docs only INTO the bumped shard")
    intercept[IllegalArgumentException] {
      CorpusOps.rendezvousRouteWeighted(d, Seq(("a#x", 1)), "rvw")
    }
    intercept[IllegalArgumentException] {
      CorpusOps.rendezvousRouteWeighted(d, Seq(("a", 0)), "rvw")
    }
    intercept[IllegalArgumentException] {
      CorpusOps.rendezvousRouteWeighted(d, Seq(("a", 1), ("a", 2)), "rvw")
    }
    // ΣW over the cap is a WEIGHT diagnostic, not the flat form's
    // shard-count advice (ADVICE r10): the message must talk gcd /
    // coarsening, never "route hierarchically"
    val eW = intercept[IllegalArgumentException] {
      CorpusOps.rendezvousRouteWeighted(d,
        Seq(("a", 4000), ("b", 97)), "rvw")
    }
    assert(eW.getMessage.contains("summed weight") &&
      eW.getMessage.contains("gcd"))
    assert(!eW.getMessage.contains("hierarchically"))
  }

  test("rendezvousRouteHierarchical ≡ the two flat contests composed; " +
    "a within-group add moves only that group's docs; loud guards") {
    val d = spark.range(3000).select(col("id").as("doc_id"))
    val groups = Seq("g0" -> Seq("a", "b"), "g1" -> Seq("c", "d"),
      "g2" -> Seq("e", "f"))
    def routesH(gs: Seq[(String, Seq[String])]): Map[Long, String] =
      CorpusOps.rendezvousRouteHierarchical(d, gs, "rvh")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val r = routesH(groups)
    // level equivalence: the doc's group is the flat contest over the
    // group names in the :g domain; its shard the flat contest over
    // that group's shards in the :s domain
    val grpOf = CorpusOps.rendezvousRoute(d, groups.map(_._1), "rvh:g")
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    groups.foreach { case (g, shards) =>
      val within = CorpusOps.rendezvousRoute(d, shards, "rvh:s")
        .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
      grpOf.filter(_._2 == g).keys.foreach { k =>
        assert(r(k) === within(k), s"doc $k in group $g")
      }
    }
    // a shard added INSIDE g1 pulls docs only from g1, only into it
    val r2 = routesH(Seq("g0" -> Seq("a", "b"),
      "g1" -> Seq("c", "d", "x"), "g2" -> Seq("e", "f")))
    val moved = r.keys.filter(k => r2(k) != r(k))
    assert(moved.nonEmpty)
    assert(moved.forall(k => r2(k) == "x" && grpOf(k) == "g1"),
      "a within-group add must move only that group's docs, into " +
        "the new shard")
    // guards: duplicate shard across groups, empty group
    intercept[IllegalArgumentException] {
      CorpusOps.rendezvousRouteHierarchical(d,
        Seq("g0" -> Seq("a"), "g1" -> Seq("a")), "rvh")
    }
    intercept[IllegalArgumentException] {
      CorpusOps.rendezvousRouteHierarchical(d,
        Seq("g0" -> Seq.empty[String]), "rvh")
    }
    // the reserved dispatch temp: an input already carrying __rv_grp
    // would be silently overwritten and dropped (ADVICE r10)
    val eTmp = intercept[IllegalArgumentException] {
      CorpusOps.rendezvousRouteHierarchical(
        d.withColumn("__rv_grp", lit("keepme")), groups, "rvh")
    }
    assert(eTmp.getMessage.contains("__rv_grp"))
  }
}
