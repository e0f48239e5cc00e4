package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis and document-deduplication operators for training-data
  * pipelines — the [EXT] surface of SURVEY §7 (the reference's own
  * "compute" never goes past templated SQL; these are the large-scale
  * operators a user of a 100 TB corpus needs on top).
  *
  * Everything here is built from codegen'd builtins and higher-order
  * array functions — no UDFs, no collect; every operator is a
  * declarative plan that scales with the cluster:
  *
  *  - shingling explodes to an inverted index (doc_id, shingle) —
  *    hash-partitioned on the shingle, the classic near-dup join layout;
  *  - MinHash signatures are a single groupBy over that index with
  *    map-side partial min() aggregation;
  *  - LSH banding turns the quadratic pair search into an equi-join on
  *    (band, bucket) — only colliding docs ever meet, so cost follows
  *    the number of true near-dups, not n²;
  *  - hash functions are md5 (deterministic across engines, so the
  *    DuckDB oracle can replay every step bit-for-bit).
  *
  * At 100 TB you would additionally drop stop-shingles (document
  * frequency cap) before the self-join to bound skew; AQE's skew-join
  * splitting covers the residual.
  */
object TextOps {

  /** Whitespace tokens of the `text` column. */
  def tokens: Column = split(col("text"), " ")

  /** Distinct k-word shingles per document: the (doc_id, shingle)
    * inverted index all near-dup operators share.
    */
  def shingles(docs: DataFrame, k: Int = 3): DataFrame = {
    val slide = (0 until k).map(j => s"t[i+$j]").mkString("concat_ws(' ', ", ", ", ")")
    docs.select(col("doc_id"), tokens.as("t"))
      .filter(size(col("t")) >= k)
      .select(col("doc_id"),
        explode(expr(s"transform(sequence(0, size(t) - $k), i -> $slide)")).as("s"))
      .distinct()
  }

  /** Per-document stats: token counts, lexical diversity, mean token
    * length — the quality-scoring primitives.
    */
  def textStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"), tokens.as("t"))
      .select(
        col("doc_id"),
        size(col("t")).cast("bigint").as("n_tokens"),
        size(array_distinct(col("t"))).cast("bigint").as("n_distinct"),
        expr("round(size(array_distinct(t)) / cast(size(t) as double), 4)").as("distinct_ratio"),
        expr("round(aggregate(transform(t, x -> length(x)), 0, (acc, x) -> acc + x) " +
          "/ cast(size(t) as double), 4)").as("avg_token_len"),
        expr("round(length(regexp_replace(text, '[a-z0-9 ]', '')) " +
          "/ cast(length(text) as double), 4)").as("punct_ratio"))

  /** Stopword-ratio language-ID heuristic (n-gram heuristics reduce to
    * token-class ratios on this whitespace-clean corpus).
    */
  def langId(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens.as("t"))
      .select(col("doc_id"),
        expr("round(size(filter(t, x -> x = 'the' or x = 'a')) / cast(size(t) as double), 4)")
          .as("stop_ratio"))
      .withColumn("lang_guess",
        when(col("stop_ratio") > 0.05, "en").otherwise("unk"))

  /** Normalised-content fingerprint (rolling-hash document fingerprinting
    * collapses to a full-content hash once content is normalised).
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(lower(col("text"))).as("fp"))

  /** Exact dedup: group by content hash, keep the smallest doc_id as the
    * canonical representative. One shuffle on the 32-byte hash — the
    * exact-dedup shape that holds at any corpus size.
    */
  def exactDedup(docs: DataFrame): DataFrame =
    fingerprint(docs)
      .groupBy("fp")
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))

  /** SimHash near-dup candidate pairs: pigeonhole banding — two
    * fingerprints within hamming distance ≤ 3 must agree on at least one
    * of 4 four-bit bands, so the quadratic search becomes an equi-join
    * on (band, nibble) and a `bit_count(xor)` filter. Same LSH shape as
    * MinHash banding, over the simhash domain.
    *
    * The 16-bit width keeps the cross-engine oracle tractable but is
    * coarse — on a small-vocabulary corpus unrelated docs collide, so the
    * default threshold is tight (≤1); a production profile widens the
    * fingerprint to 64 bits (same plan, 64 sums) before loosening it.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 1): DataFrame = {
    val sh = simhash(docs)
    val bands = sh.select(col("doc_id"), col("simhash16"),
      explode(expr("transform(sequence(0, 3), b -> " +
        "struct(b as band, (simhash16 div shiftleft(1, b * 4)) % 16 as nib))")).as("e"))
      .select(col("doc_id"), col("simhash16"), col("e.band").as("band"), col("e.nib").as("nib"))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.nib") === col("y.nib") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        expr("cast(bit_count(x.simhash16 ^ y.simhash16) as bigint)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Number of MinHash permutations (8 hashes → 4 bands of 2 rows,
    * detection threshold ≈ (1/bands)^(1/rows) ≈ 0.5 Jaccard).
    */
  val MinhashSeeds = 8
  val MinhashBands = 4

  /** MinHash signature per document: per seed i, min over shingles of
    * md5("i:" + shingle). String-min over hex is engine-portable; a
    * production tuning would swap md5 for xxhash64 (same plan shape,
    * one less allocation) at the cost of the cross-engine oracle.
    */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val mins = (0 until MinhashSeeds)
      .map(i => min(md5(concat(lit(s"$i:"), col("s")))).as(s"h$i"))
    shingles(docs).groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** LSH band table: (doc_id, band, bucket-key) with bucket-key =
    * md5 of the band's concatenated signature rows.
    */
  def minhashBands(docs: DataFrame): DataFrame = {
    val bandStructs = (0 until MinhashBands).map { b =>
      struct(lit(b).as("band"),
        md5(concat(col(s"h${2 * b}"), col(s"h${2 * b + 1}"))).as("bk"))
    }
    minhashSignatures(docs)
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("e"))
      .select(col("doc_id"), col("e.band").as("band"), col("e.bk").as("bk"))
  }

  /** Candidate near-dup pairs: equi-join of the band table with itself —
    * only same-bucket docs meet. Output (a, b) with a < b, distinct
    * across bands.
    */
  def minhashCandidatePairs(docs: DataFrame): DataFrame =
    bandPairs(minhashBands(docs))

  private def bandPairs(bands: DataFrame): DataFrame =
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bk") === col("y.bk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()

  /** Production-profile MinHash: same plan shape as the md5 variant but
    * hashed with codegen'd `xxhash64` (numeric min, no hex strings) —
    * ~3× cheaper per shingle. Not oracle-replayable (xxhash64 isn't in
    * DuckDB), so the driver-gate queries keep the md5 form; recall
    * equivalence is spec-tested instead.
    */
  def fastMinhashCandidatePairs(docs: DataFrame): DataFrame = {
    val mins = (0 until MinhashSeeds)
      .map(i => min(xxhash64(lit(i), col("s"))).as(s"h$i"))
    val sig = shingles(docs).groupBy("doc_id").agg(mins.head, mins.tail: _*)
    val bandStructs = (0 until MinhashBands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(col(s"h${2 * b}"), col(s"h${2 * b + 1}")).as("bk"))
    }
    bandPairs(sig
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("e"))
      .select(col("doc_id"), col("e.band").as("band"), col("e.bk").as("bk")))
  }

  /** Exact n-gram Jaccard over the inverted index: pairs sharing ≥1
    * shingle, similarity = |∩| / |∪|, thresholded. The shingle
    * self-join is the inverted-index pattern — pair cost follows shared
    * shingles, not n².
    */
  def jaccardPairs(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    // The shingle subplan appears three times (sizes + both join sides);
    // measured head-to-head that beats both a window-carried size column
    // (the per-shingle window shuffle quintuples the join input) and a
    // localCheckpoint materialisation — the sizes joins broadcast
    // (O(docs) rows), so re-deriving shingles is the cheaper currency.
    val sh = shingles(docs)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val common = sh.as("x").join(sh.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n", "na"), "a")
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n", "nb"), "b")
      .withColumn("jaccard",
        round(col("common") / (col("na") + col("nb") - col("common")), 4))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** Token counting beyond whitespace: a BPE-ish regex pass (letter
    * runs / digit runs / single other chars — the shape of a byte-level
    * BPE pre-tokenizer) plus the chars/4 heuristic LLM pipelines use for
    * budget estimates.
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("bigint").as("ws_tokens"),
      size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
        .cast("bigint").as("bpe_ish_tokens"),
      ceil(length(col("text")) / 4.0).cast("bigint").as("est_bpe_tokens"))

  /** BM25 ranking of documents against a fixed term set — scoring built
    * entirely from relational primitives (term explode → tf/df
    * aggregates → broadcast scalar join), so it runs at corpus scale as
    * three shuffles and replays exactly in the SQL oracle.
    * k1 = 1.2, b = 0.75, idf = ln((N - df + 0.5)/(df + 0.5) + 1).
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int = 10): DataFrame = {
    val k1 = 1.2; val b = 0.75
    val tok = docs.select(col("doc_id"), explode(tokens).as("w"))
    val docLen = tok.groupBy("doc_id").agg(count(lit(1)).as("len"))
    val scalars = docLen.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg("len").as("avg_len"))
    val tf = tok.filter(col("w").isin(terms: _*))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("w").agg(count(lit(1)).cast("double").as("df"))
    val scored = tf
      .join(broadcast(df_), "w")
      .join(docLen, "doc_id")
      .crossJoin(broadcast(scalars))
      .withColumn("idf", log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1))
      .withColumn("term_score",
        col("idf") * col("tf") * lit(k1 + 1) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("len") / col("avg_len"))))
      .groupBy("doc_id").agg(round(sum("term_score"), 4).as("bm25"))
    scored.orderBy(col("bm25").desc, col("doc_id")).limit(k)
  }

  /** 16-bit SimHash over the token multiset: per token, md5's first 4
    * hex nibbles give 16 bits; each bit votes ±1; the fingerprint keeps
    * the sign. One explode + one groupBy with 16 partial sums —
    * map-side combinable, scales linearly.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(tokens).as("w"))
      .withColumn("h", md5(col("w")))
    val withNibbles = (0 until 4).foldLeft(tok) { (df, i) =>
      df.withColumn(s"n$i",
        conv(substring(col("h"), i + 1, 1), 16, 10).cast("int"))
    }
    val sums = (0 until 16).map { j =>
      val nib = s"n${j / 4}"
      val bitMask = 1 << (j % 4)
      sum(when(expr(s"($nib div $bitMask) % 2") === 1, 1).otherwise(-1)).as(s"s$j")
    }
    val fingerprintExpr = (0 until 16)
      .map(j => s"(CASE WHEN s$j > 0 THEN ${1 << j} ELSE 0 END)")
      .mkString(" + ")
    withNibbles.groupBy("doc_id")
      .agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), expr(fingerprintExpr).cast("bigint").as("simhash16"))
  }
}
