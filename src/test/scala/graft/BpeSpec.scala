package graft

import org.apache.spark.sql.functions._

import graft.functions.BpeTokens
import graft.operators.TextOps

/** BPE trainer + tokenizer kernel. The trained merge table is not
  * SQL-replayable, so the correctness story lives here: a spec-local
  * REFERENCE implementation (independently written train + tokenize,
  * straightforward quadratic code) must agree with the production
  * trainer and the codegen kernel on a toy corpus AND on real corpus
  * words; plus pinned semantics for overlap, ties, surrogate pairs and
  * nulls. The corpus-scale character-conservation leg is additionally
  * hash-checked at the gate (`text_bpe_roundtrip`).
  */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  // ---- spec-local reference implementation (independent code path) ----

  private def refSymbols(word: String): Vector[String] =
    word.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))

  private def refMergePass(syms: Vector[String], p: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == p._1 && syms(i + 1) == p._2) {
        out += (syms(i) + syms(i + 1)); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refTrain(wordCounts: Map[String, Long], numMerges: Int): Vector[(String, String)] = {
    var words = wordCounts.map { case (w, n) => (refSymbols(w), n) }.toVector
    var merges = Vector.empty[(String, String)]
    var stop = false
    while (!stop && merges.length < numMerges) {
      val counts = words.flatMap { case (syms, n) =>
        syms.zip(syms.drop(1)).map(p => (p, n))
      }.groupMapReduce(_._1)(_._2)(_ + _)
      if (counts.isEmpty) stop = true
      else {
        val (pair, c) = counts.toVector.minBy { case ((l, r), n) => (-n, l, r) }
        if (c < 2) stop = true
        else {
          merges :+= pair
          words = words.map { case (syms, n) => (refMergePass(syms, pair), n) }
        }
      }
    }
    merges
  }

  private def refTokenize(word: String, merges: Seq[(String, String)]): Vector[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = refSymbols(word)
    var stop = syms.length < 2
    while (!stop) {
      val present = syms.zip(syms.drop(1)).flatMap(p => rank.get(p).map(r => (r, p)))
      if (present.isEmpty) stop = true
      else syms = refMergePass(syms, present.minBy(_._1)._2)
    }
    syms
  }

  // Sennrich et al.'s running example vocabulary (no end-of-word
  // marker in our variant): pair counts put (e,s) and (s,t) both at 9;
  // the lexicographic tie-break learns (e,s) first, then (es,t).
  private val toyCounts = Map[String, Long]("low" -> 5L, "lower" -> 2L,
    "newest" -> 6L, "widest" -> 3L)

  private def toyDocs = {
    val rows = toyCounts.toSeq.sortBy(_._1).zipWithIndex.flatMap {
      case ((w, n), i) => Seq.fill(n.toInt)(w).zipWithIndex
        .map { case (word, j) => (i * 100L + j, word) }
    }
    rows.toDF("doc_id", "text")
  }

  test("trainer matches the reference implementation on the toy corpus") {
    val got = TextOps.bpeTrain(toyDocs, numMerges = 50)
    val want = refTrain(toyCounts, 50)
    assert(got == want, s"trainer diverged:\n got $got\nwant $want")
    assert(got.take(2) == Seq(("e", "s"), ("es", "t")),
      s"first merges should be the classic (e,s),(es,t): $got")
  }

  test("incremental pair counts equal the recount trainer everywhere") {
    // the production (incremental-update) merge loop must learn the
    // SAME merge sequence as the recount-every-iteration twin — on the
    // toy corpus, on the sf corpus, and on an overlap-adversarial
    // corpus ('aaaa…' makes merged symbols immediately re-pair with
    // themselves, the classic incremental-update off-by-one trap)
    assert(TextOps.bpeTrain(toyDocs, numMerges = 50) ==
      TextOps.bpeTrainRecount(toyDocs, numMerges = 50))
    val docs = sources.Tables.documents(spark, sf)
    assert(TextOps.bpeTrain(docs, numMerges = 120) ==
      TextOps.bpeTrainRecount(docs, numMerges = 120))
    val adversarial = Seq(
      (1L, "aaaaaaaa aaaa aa"),
      (2L, "aaaaaaaa bbbb abab"),
      (3L, "abab abab baba"),
      (4L, "xyxyxyxy xyxy")
    ).toDF("doc_id", "text")
    assert(TextOps.bpeTrain(adversarial, numMerges = 30) ==
      TextOps.bpeTrainRecount(adversarial, numMerges = 30))
  }

  test("kernel tokenization matches the reference on toy + corpus words") {
    val merges = TextOps.bpeTrain(toyDocs, numMerges = 50)
    val toy = toyDocs.select(col("doc_id"), col("text"),
        TextOps.bpeTokens(merges).as("toks"))
      .collect()
    for (r <- toy) {
      val want = refTokenize(r.getString(1), merges)
      assert(r.getSeq[String](2) == want,
        s"toy '${r.getString(1)}': got ${r.getSeq[String](2)}, want $want")
    }
    // real corpus: train on sf0.001 documents, compare every doc's
    // token stream word-by-word against the reference tokenizer
    val docs = sources.Tables.documents(spark, sf)
    val corpusMerges = TextOps.bpeTrain(docs, numMerges = 120)
    // the tiny sf0.001 vocabulary runs dry (no pair left with count ≥ 2)
    // before 120 — early stop is the CORRECT behaviour; just require a
    // non-trivial learned table
    assert(corpusMerges.size >= 50 && corpusMerges.size <= 120,
      s"unexpected merge-table size ${corpusMerges.size}")
    val sample = docs.select(col("text"), TextOps.bpeTokens(corpusMerges).as("toks"))
      .limit(50).collect()
    for (r <- sample) {
      val want = r.getString(0).split(" ", -1).filter(_.nonEmpty)
        .flatMap(w => refTokenize(w, corpusMerges)).toSeq
      assert(r.getSeq[String](1) == want,
        s"corpus doc diverged from reference tokenizer on '${r.getString(0).take(60)}…'")
    }
  }

  test("trainer replay: tokenizing a training word reproduces its final state") {
    // the rank-greedy inference loop must land every training word in
    // exactly the state the trainer left it — the standard BPE
    // guarantee, which holds only if trainer and tokenizer share merge
    // semantics (they share BpeTokens.mergeOnce)
    val merges = TextOps.bpeTrain(toyDocs, numMerges = 50)
    val ranks = BpeTokens.rankMap(merges)
    // replay training by hand with mergeOnce to obtain final states
    var state = toyCounts.keys.map(w => w -> BpeTokens.codePointSymbols(w)).toMap
    for ((l, r) <- merges)
      state = state.map { case (w, s) => w -> BpeTokens.mergeOnce(s, l, r) }
    for ((w, want) <- state) {
      val got = BpeTokens.applyMerges(BpeTokens.codePointSymbols(w), ranks)
      assert(got.toSeq == want.toSeq, s"replay of '$w': ${got.toSeq} vs ${want.toSeq}")
    }
  }

  test("merge pass is left-to-right non-overlapping; edge inputs hold") {
    val merges = Seq(("a", "a"))
    val out = Seq((1L, "aaa aaaa  aa"), (2L, ""), (3L, null: String),
        (4L, "b")).toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.bpeTokens(merges).as("toks"))
      .orderBy("doc_id").collect()
    assert(out(0).getSeq[String](1) == Seq("aa", "a", "aa", "aa", "aa"),
      "aaa→[aa,a] (never [a,aa]), aaaa→[aa,aa], double space drops the empty word")
    assert(out(1).getSeq[String](1) == Seq.empty, "empty text → empty tokens")
    assert(out(2).isNullAt(1), "null text → null (nullIntolerant)")
    assert(out(3).getSeq[String](1) == Seq("b"), "single symbol untouched")
  }

  test("surrogate pairs stay whole symbols and round-trip") {
    // U+1F600 is a surrogate pair in UTF-16; a char-based split would
    // let a merge splice half a code point
    val text = "a😀b 😀😀"
    val merges = Seq(("😀", "😀"), ("a", "😀"))
    val got = Seq((1L, text)).toDF("doc_id", "text")
      .select(TextOps.bpeTokens(merges).as("toks")).head.getSeq[String](0)
    assert(got == Seq("a😀", "b", "😀😀"), got.toString)
    assert(got.mkString == text.replace(" ", ""), "code-point round-trip")
  }

  test("corpus round-trip + compression: gate-query invariants at sf0.001") {
    val docs = sources.Tables.documents(spark, sf)
    val rt = graft.queries.ExtQueries.textBpeRoundtrip(spark, sf)
      .agg(sum(when(col("intact"), 0).otherwise(1)).as("broken"),
        sum("chars").as("chars")).head
    assert(rt.getLong(0) == 0L, "every doc must reconstruct exactly")
    val toks = graft.queries.ExtQueries.textBpeTokens(spark, sf)
      .agg(sum("n_tokens")).head.getLong(0)
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).count()
    assert(toks < rt.getLong(1),
      s"merges must compress below character count ($toks vs ${rt.getLong(1)})")
    assert(toks >= words, "a word never tokenizes below one subword")
  }
}
