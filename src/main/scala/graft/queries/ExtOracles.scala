package graft.queries

/** DuckDB oracle SQL for the [EXT] queries. Each statement replays the
  * Spark plan step-for-step (same md5 hashing, same rounding, same
  * tiebreaks) so the driver's hash compare is exact. Shared CTE
  * fragments are assembled here; the simhash oracle is generated from
  * the same bit layout as [[graft.operators.TextOps.simhash]].
  */
object ExtOracles {

  private val tokCte = "tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)"

  /** One row per (doc, token) — the exploded form the surprisal oracle
    * consumes.
    */
  private val tokCte2 =
    "tokw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)"

  private val shCte =
    """sh AS (SELECT DISTINCT doc_id, t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS s
      |       FROM tok, unnest(range(len(t) - 2)) AS u(i))""".stripMargin

  private val minhashCte = {
    val mins = (0 until TextOpsConsts.seeds)
      .map(i => s"min(md5('$i:' || s)) AS h$i").mkString(",\n  ")
    s"mh AS (SELECT doc_id,\n  $mins\n  FROM sh GROUP BY doc_id)"
  }

  private val bandsCte = {
    val rows = (0 until TextOpsConsts.bands)
      .map(b => s"SELECT doc_id, $b AS band, md5(h${2 * b} || h${2 * b + 1}) AS bk FROM mh")
      .mkString(" UNION ALL ")
    s"bands AS ($rows)"
  }

  /** Band-self-join candidate pairs — ONE definition for every oracle
    * that consumes the LSH candidate graph (pairs, clusters, the
    * Jaccard estimator); a banding-scheme change edits one string.
    */
  private val cpCte =
    """cp AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      |       FROM bands x JOIN bands y
      |         ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id)""".stripMargin

  /** CTE chain replaying [[graft.operators.TextOps.langId]]'s trained
    * trigram classifier — shared by the language-ID oracle and the
    * drift diagnostic (one classifier, one definition). `range(n)` is
    * empty for n ≤ 0, mirroring the Spark side's length ≥ 3 guard;
    * 1.0::DOUBLE forces float division (DuckDB's bare 1.0 is DECIMAL).
    */
  private val langIdCte =
    """tri AS (SELECT doc_id, lang,
      |          unnest(list_transform(range(length(text) - 2),
      |            i -> substring(text, CAST(i + 1 AS INT), 3))) AS g
      |        FROM documents WHERE length(text) >= 3),
      |dtf AS (SELECT doc_id, g, count(*) AS tf FROM tri GROUP BY 1, 2),
      |prof AS (SELECT lang, g, count(*) AS c FROM tri GROUP BY 1, 2),
      |lt AS (SELECT lang, sum(c) AS nl FROM prof GROUP BY 1),
      |vv AS (SELECT count(DISTINCT g) AS v FROM tri),
      |scored AS (SELECT dtf.doc_id, lt.lang,
      |    round(sum(dtf.tf * ln((coalesce(prof.c, 0) + 1.0::DOUBLE)
      |      / CAST(lt.nl + vv.v AS DOUBLE))), 4) AS score
      |  FROM dtf CROSS JOIN lt CROSS JOIN vv
      |  LEFT JOIN prof ON prof.lang = lt.lang AND prof.g = dtf.g
      |  GROUP BY 1, 2),
      |guess AS (SELECT doc_id, lang AS lang_guess, score FROM (
      |    SELECT *, row_number() OVER (PARTITION BY doc_id
      |      ORDER BY score DESC, lang) AS rn FROM scored)
      |  WHERE rn = 1)""".stripMargin

  private val embCte = "e AS (SELECT vec_id, embedding::DOUBLE[] AS v, embedding FROM embeddings)"

  /** The shared Lloyd replay behind `embed_kmeans` and
    * `embed_cluster_sample` (VectorOps.kmeansCentroids, k=8, iters=3):
    * init = the k lowest-vec_id vectors; each round an argmin on the
    * bit-identical d² expansion (list_dot_product is the same
    * left-to-right double fold as the ArrayDot kernel) with ties to
    * the smallest cell, then per-(cell, dim) means re-pinned to 6 dp,
    * empty cells carrying the previous centroid forward (the LEFT
    * JOIN + coalesce). Ends at `af` — the final assignment with raw
    * d2.
    */
  private def kmeansCte(k: Int, iters: Int): String = {
    val d2 = "list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, p.c)" +
      " + list_dot_product(p.c, p.c)"
    val init =
      s"""c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER)
         |    AS cell, v AS c
         |  FROM e ORDER BY vec_id LIMIT $k)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""a$i AS (SELECT vec_id, v, cell FROM (
         |    SELECT e.vec_id, e.v, p.cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY $d2, p.cell) AS rn
         |    FROM e CROSS JOIN c${i - 1} p) WHERE rn = 1),
         |u$i AS (SELECT cell, pos, round(avg(x), 6) AS cv FROM (
         |    SELECT cell, generate_subscripts(v, 1) AS pos, unnest(v) AS x
         |    FROM a$i) GROUP BY 1, 2),
         |c$i AS (SELECT p.cell, coalesce(n.c, p.c) AS c
         |  FROM c${i - 1} p LEFT JOIN
         |    (SELECT cell, list(cv ORDER BY pos) AS c FROM u$i GROUP BY cell) n
         |  USING (cell))""".stripMargin
    }
    val fin =
      s"""af AS (SELECT vec_id, cell, d2 FROM (
         |    SELECT e.vec_id, p.cell, $d2 AS d2,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY $d2, p.cell) AS rn
         |    FROM e CROSS JOIN c$iters p) WHERE rn = 1)""".stripMargin
    (init +: rounds :+ fin).mkString(",\n")
  }

  /** The ONE SQ8 replay both sq8 gates share: the quantize() contract
    * (per-vector symmetric scale, floor rounding), the asymmetric
    * score scale * list_dot_product(full-precision query, codes), and
    * the (score desc, vec_id) ranking.
    */
  private val sq8TopkSql: String =
    s"""WITH $embCte,
         |c AS (SELECT vec_id, scale,
         |        list_transform(v, x -> floor(x / scale + 0.5)) AS codes
         |      FROM (SELECT vec_id, v,
         |              greatest(list_max(list_transform(v, x -> abs(x)))
         |                / 127.0, 1e-12) AS scale
         |            FROM e)),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN (0, 1, 2, 3, 4)),
         |scored AS (SELECT qid, c.vec_id,
         |  round(scale * list_dot_product(qv, codes), 5) AS sq8_score
         |  FROM c JOIN q ON c.vec_id <> qid),
         |ranked AS (SELECT qid, vec_id, sq8_score,
         |  row_number() OVER (PARTITION BY qid ORDER BY sq8_score DESC, vec_id) AS rn
         |  FROM scored)
         |SELECT qid, vec_id, sq8_score, rn FROM ranked WHERE rn <= 10
         |ORDER BY qid, rn""".stripMargin

  /** The fixed-weight logistic quality score — ONE definition serving
    * `text_quality_score` and `dedup_canonical` (the same one-classifier
    * contract as [[langIdCte]]; a weight/regex change edits one string).
    */
  private val qualityCte =
    """qtok AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
      |qs AS (SELECT doc_id,
      |    round(1.0::DOUBLE / (1.0::DOUBLE + exp(-(-2.0
      |      + ln(CAST(len(t) AS BIGINT)) * 0.6
      |      + CAST((CAST(len(list_distinct(t)) AS BIGINT) * 10000)
      |          // len(t) AS BIGINT) / 10000.0 * 2.0
      |      - CAST((CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))
      |          AS BIGINT) * 10000) // length(text) AS BIGINT)
      |          / 10000.0 * 4.0))), 4) AS quality_score
      |  FROM qtok)""".stripMargin

  /** Classifier feature-space geometry, derived from the operator's
    * own constants so the oracle can never silently drift from the
    * Spark side's bucket space.
    */
  private val qcDim = graft.operators.QualityClassifier.DefaultDim
  // the operator's own derivation (incl. its power-of-16 validation) —
  // a re-derived formula here could silently round a bad dim
  private val qcNibbles =
    graft.operators.QualityClassifier.nibblesFor(qcDim)

  /** Big-endian value of the first `nibbles` hex nibbles of the md5
    * column `mExpr` — the strpos hex trick widened past [[hash16]]'s
    * four-nibble form.
    */
  /** One hex byte of an md5 string as 0..255 (chars `pos`, `pos+1` —
    * 1-indexed, so byte k lives at pos = 2k+1).
    */
  private def hexByte(mExpr: String, pos: Int): String =
    s"((strpos('0123456789abcdef', substring($mExpr, $pos, 1)) - 1) * 16" +
      s" + (strpos('0123456789abcdef', substring($mExpr, ${pos + 1}, 1)) - 1))"

  private def nibbleValue(mExpr: String, nibbles: Int): String =
    (0 until nibbles).map { i =>
      val weight = BigInt(16).pow(nibbles - 1 - i)
      s"(strpos('0123456789abcdef', substring($mExpr, ${i + 1}, 1)) - 1) * $weight"
    }.mkString("(", " +\n      ", ")")

  private val cosExpr =
    "list_dot_product(x.v, y.v) / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v)))"

  private def bucketExpr(alias: String) =
    (0 until 8).map(i => s"($alias.embedding[${i + 1}] >= 0)").mkString("concat(", ", ", ")")

  /** CTE chain computing the per-bit vote sums and the packed 64-bit
    * fingerprint — shared by the signature dump and the banded near-dup
    * pair oracle. Replays [[graft.operators.TextOps.simhashSums]] /
    * [[graft.operators.TextOps.simhash]] bit-for-bit: md5's first 16 hex
    * nibbles give 64 ±1 votes; bit 63 packs as (-max - 1) so the sum
    * lands on the identical two's-complement BIGINT in both engines
    * (partial sums of bits 0..62 stay ≤ 2^63-1, so left-to-right
    * addition never overflows before the negative term).
    */
  private val simhashCte: String = {
    val nibbles = (0 until 16)
      .map(i => s"strpos('0123456789abcdef', substring(md5(w), ${i + 1}, 1)) - 1 AS n$i")
      .mkString(",\n  ")
    val sums = (0 until 64).map { j =>
      val nib = s"n${j / 4}"
      val mask = 1 << (j % 4)
      s"sum(CASE WHEN ($nib // $mask) % 2 = 1 THEN 1 ELSE -1 END) AS s$j"
    }.mkString(",\n  ")
    val fp = (0 until 64).map { j =>
      val p = if (j == 63) "(-9223372036854775807 - 1)" else (1L << j).toString
      s"(CASE WHEN s$j > 0 THEN $p ELSE 0 END)"
    }.mkString(" + ")
    s"""tokw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |nib AS (SELECT doc_id,
       |  $nibbles
       |  FROM tokw),
       |sums AS (SELECT doc_id,
       |  $sums
       |  FROM nib GROUP BY doc_id),
       |shash AS (SELECT doc_id, CAST($fp AS BIGINT) AS simhash64 FROM sums)""".stripMargin
  }

  private val simhashSql: String =
    s"""WITH $simhashCte
       |SELECT doc_id, simhash64 FROM shash ORDER BY doc_id""".stripMargin

  /** 4 bands of 16 bits, band values rebuilt from the vote sums (not the
    * packed word) exactly as [[graft.operators.TextOps.simhashPairs]]
    * does, and the per-band hamming sum — sign-pitfall-free because band
    * values are non-negative ≤16-bit ints.
    */
  private val simhashPairsSql: String = {
    def bandVal(b: Int): String = (0 until 16)
      .map(t => s"(CASE WHEN s${b * 16 + t} > 0 THEN ${1 << t} ELSE 0 END)")
      .mkString("(", " + ", ")")
    val bandCols = (0 until 4)
      .map(b => s"CAST(${bandVal(b)} AS BIGINT) AS b$b").mkString(",\n  ")
    val bandRows = (0 until 4)
      .map(b => s"SELECT doc_id, b0, b1, b2, b3, $b AS band, b$b AS bv FROM sbv")
      .mkString(" UNION ALL ")
    val hamming = (0 until 4)
      .map(b => s"bit_count(xor(x.b$b, y.b$b))").mkString(" + ")
    s"""WITH $simhashCte,
       |sbv AS (SELECT doc_id,
       |  $bandCols
       |  FROM sums),
       |sbands AS ($bandRows)
       |SELECT a, b, hamming FROM (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
       |    CAST($hamming AS BIGINT) AS hamming
       |  FROM sbands x JOIN sbands y
       |    ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id)
       |WHERE hamming <= 3 ORDER BY a, b""".stripMargin
  }

  /** Transitive closure of the minhash candidate pairs via recursive
    * CTE — min reachable id per vertex, i.e. the fixpoint both the
    * min-label-propagation AND the star-contraction implementations
    * converge to.
    */
  private val dedupClustersSql: String =
    s"""WITH RECURSIVE $tokCte, $shCte, $minhashCte, $bandsCte,
       |$cpCte,
       |edges AS (SELECT a AS src, b AS dst FROM cp UNION SELECT b, a FROM cp),
       |reach(id, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, rr.r FROM edges e JOIN reach rr ON e.dst = rr.id)
       |SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id
       |ORDER BY doc_id""".stripMargin

  /** CTE chain replaying [[graft.operators.VectorOps.ivfPqSearch]] over
    * the exported trained state + code table, through the ADC ranking
    * (`rr`); the search and rerank oracles append their own final
    * select. Shared by `embed_ivf_pq_topk`, `embed_index_search`
    * (spec-pinned identical searches) and `embed_ivf_pq_rerank`.
    */
  private def ivfPqAdcCtes: String =
    s"""WITH $embCte,
       |cent AS (SELECT cell, c FROM read_parquet('${OracleArtifacts.pathFor("ivf_centroids")}/*.parquet')),
       |meta AS (SELECT nprobe FROM read_parquet('${OracleArtifacts.pathFor("ivf_meta")}/*.parquet')),
       |rcb AS (SELECT s, ci, c FROM read_parquet('${OracleArtifacts.pathFor("ivfpq_codebooks")}/*.parquet')),
       |codes AS (SELECT vec_id, cell, codes FROM read_parquet('${OracleArtifacts.pathFor("ivfpq_codes")}/*.parquet')),
       |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN (0, 1, 2, 3, 4)),
       |pc AS (SELECT qid, cell FROM (
       |         SELECT q.qid, cent.cell,
       |           row_number() OVER (PARTITION BY q.qid ORDER BY
       |             list_dot_product(q.qv, cent.c) /
       |               greatest(sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(cent.c, cent.c)), 1e-12) DESC,
       |             cent.cell) AS crn
       |         FROM q CROSS JOIN cent)
       |       WHERE crn <= (SELECT nprobe FROM meta)),
       |iplut AS (SELECT q.qid, rcb.s, rcb.ci,
       |            list_sum(list_transform(range(1, len(rcb.c) + 1),
       |              i -> rcb.c[i] * q.qv[rcb.s * len(rcb.c) + i])) AS ip
       |          FROM q CROSS JOIN rcb),
       |nlut AS (SELECT cent.cell, rcb.s, rcb.ci,
       |           list_sum(list_transform(range(1, len(rcb.c) + 1),
       |             i -> (cent.c[rcb.s * len(rcb.c) + i] + rcb.c[i]) * (cent.c[rcb.s * len(rcb.c) + i] + rcb.c[i]))) AS n2
       |         FROM cent CROSS JOIN rcb),
       |qc AS (SELECT q.qid, cent.cell, list_dot_product(q.qv, cent.c) AS qcip
       |       FROM q CROSS JOIN cent),
       |qn AS (SELECT qid, sqrt(list_dot_product(qv, qv)) AS qnorm FROM q),
       |cand AS (SELECT pc.qid, c2.vec_id, c2.cell, c2.codes
       |         FROM pc JOIN codes c2 ON c2.cell = pc.cell AND c2.vec_id <> pc.qid),
       |cx AS (SELECT qid, vec_id, cell, CAST(u.s AS INT) AS s,
       |         codes[CAST(u.s AS INT) + 1] AS code
       |       FROM cand, unnest(range(len(codes))) AS u(s)),
       |sc AS (SELECT cx.qid, cx.vec_id, cx.cell,
       |         sum(i.ip) AS ipsum, sum(n.n2) AS rnorm2
       |       FROM cx
       |         JOIN iplut i ON i.qid = cx.qid AND i.s = cx.s AND i.ci = cx.code
       |         JOIN nlut n ON n.cell = cx.cell AND n.s = cx.s AND n.ci = cx.code
       |       GROUP BY 1, 2, 3),
       |ranked AS (SELECT sc.qid, sc.vec_id,
       |    round((qc.qcip + sc.ipsum) / greatest(qn.qnorm * sqrt(sc.rnorm2), 1e-12), 5) AS adc_cos
       |  FROM sc JOIN qc ON qc.qid = sc.qid AND qc.cell = sc.cell
       |       JOIN qn ON qn.qid = sc.qid),
       |rr AS (SELECT qid, vec_id, adc_cos,
       |         row_number() OVER (PARTITION BY qid ORDER BY adc_cos DESC, vec_id) AS rn
       |       FROM ranked)""".stripMargin

  /** Replay of [[graft.operators.VectorOps.ivfPqSearch]]'s final top-k. */
  private def ivfPqSearchSql: String =
    s"""$ivfPqAdcCtes
       |SELECT qid, vec_id, adc_cos, rn FROM rr WHERE rn <= 10 ORDER BY qid, rn""".stripMargin

  /** Replay of [[graft.operators.VectorOps.ivfPqSearchRerank]]: the ADC
    * chain ranks rerankK = 100 candidates, then exact cosine over the
    * raw vectors re-ranks them to the final top-10 — the refine stage
    * end-to-end in SQL.
    */
  private def ivfPqRerankSql: String =
    s"""$ivfPqAdcCtes,
       |cand100 AS (SELECT qid, vec_id FROM rr WHERE rn <= 100),
       |ex AS (SELECT c.qid, c.vec_id,
       |    round(list_dot_product(q.qv, e.v) /
       |      (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))), 5) AS cos
       |  FROM cand100 c JOIN e ON e.vec_id = c.vec_id JOIN q ON q.qid = c.qid),
       |fr AS (SELECT qid, vec_id, cos,
       |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
       |       FROM ex)
       |SELECT qid, vec_id, cos, rn FROM fr WHERE rn <= 10 ORDER BY qid, rn""".stripMargin

  /** Replay of [[graft.operators.TextOps.incrementalNearDup]] over the
    * dedup_incremental delta split, shared by the direct and the
    * index-served gate queries (deterministic bands ⇒ identical
    * verdicts).
    */
  private def incrementalNearSql: String =
    s"""WITH $tokCte, $shCte, $minhashCte, $bandsCte,
       |bb AS (SELECT doc_id, band, bk FROM bands WHERE doc_id % 10 = 7),
       |cb AS (SELECT doc_id, band, bk FROM bands WHERE doc_id % 10 <> 7),
       |ch AS (SELECT b.doc_id, count(DISTINCT c.doc_id) AS n_c,
       |         min(c.doc_id) AS m_c
       |       FROM bb b JOIN cb c ON b.band = c.band AND b.bk = c.bk
       |       GROUP BY 1),
       |bh AS (SELECT y.doc_id, count(DISTINCT x.doc_id) AS n_b,
       |         min(x.doc_id) AS m_b
       |       FROM bb x JOIN bb y
       |         ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id
       |       GROUP BY 1),
       |base AS (SELECT doc_id FROM documents WHERE doc_id % 10 = 7),
       |sg AS (SELECT DISTINCT doc_id FROM bb)
       |SELECT base.doc_id,
       |  CASE WHEN sg.doc_id IS NULL THEN 'no_signature'
       |       WHEN ch.doc_id IS NOT NULL THEN 'near_dup_of_corpus'
       |       WHEN bh.doc_id IS NOT NULL THEN 'near_dup_in_batch'
       |       ELSE 'unique' END AS verdict,
       |  coalesce(ch.m_c, bh.m_b) AS match_doc,
       |  coalesce(ch.n_c, bh.n_b, 0) AS n_matches
       |FROM base LEFT JOIN sg ON base.doc_id = sg.doc_id
       |          LEFT JOIN ch ON base.doc_id = ch.doc_id
       |          LEFT JOIN bh ON base.doc_id = bh.doc_id
       |ORDER BY base.doc_id""".stripMargin

  /** Replays TextOps.decontaminate with the PLAIN exact join — no
    * Bloom anywhere: the sketch prefilter has no false negatives, so
    * the kept set must equal the exact form's exactly. Shared by the
    * direct and the persisted-artifact (ContaminationIndex) gates.
    */
  private def bpeTokensSql: String =
      s"""WITH RECURSIVE
         |m AS (SELECT rnk, chr(1)||l||chr(1)||chr(1)||r||chr(1) AS pat,
         |             chr(1)||l||r||chr(1) AS rep
         |      FROM read_parquet('${OracleArtifacts.pathFor("bpe_merges")}/*.parquet')),
         |tokw AS (SELECT doc_id,
         |           generate_subscripts(string_split(text, ' '), 1) AS wpos,
         |           unnest(string_split(text, ' ')) AS w FROM documents),
         |words AS (SELECT DISTINCT w FROM tokw WHERE w <> ''),
         |seg(w, state) AS (
         |  SELECT w, chr(1)||chr(1)||
         |    list_aggregate(regexp_extract_all(w, '(?s).'), 'string_agg',
         |                   chr(1)||chr(1))||chr(1)||chr(1)
         |  FROM words
         |  UNION ALL
         |  SELECT s.w, replace(s.state, b.pat, b.rep)
         |  FROM seg s
         |  JOIN LATERAL (SELECT pat, rep FROM m
         |                WHERE position(m.pat IN s.state) > 0
         |                ORDER BY rnk LIMIT 1) b ON true),
         |final AS (SELECT w, state FROM seg s
         |          WHERE NOT EXISTS (SELECT 1 FROM m
         |                            WHERE position(m.pat IN s.state) > 0)),
         |wordtok AS (SELECT w,
         |              replace(trim(state, chr(1)), chr(1)||chr(1), ' ') AS wt
         |            FROM final),
         |perdoc AS (SELECT t.doc_id,
         |             coalesce(string_agg(k.wt, ' ' ORDER BY t.wpos), '') AS stream
         |           FROM tokw t JOIN wordtok k ON t.w = k.w
         |           GROUP BY t.doc_id)
         |SELECT d.doc_id,
         |  CAST(CASE WHEN coalesce(p.stream, '') = '' THEN 0
         |       ELSE len(string_split(p.stream, ' ')) END AS BIGINT) AS n_tokens,
         |  md5(coalesce(p.stream, '')) AS toks_digest
         |FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
         |ORDER BY d.doc_id""".stripMargin

  /** [[bpeTokensSql]]'s tokenization CTE chain with the coverage
    * aggregates as the final projection — replays
    * `TokenizerStore.coverage` from the same merges artifact.
    */
  private def bpeCoverageSql: String = {
    val ctes = bpeTokensSql.substring(0,
      bpeTokensSql.lastIndexOf("SELECT d.doc_id"))
    s"""$ctes
       |SELECT d.doc_id,
       |  CAST(CASE WHEN coalesce(p.stream, '') = '' THEN 0
       |       ELSE len(string_split(p.stream, ' ')) END AS BIGINT)
       |    AS n_tokens,
       |  CAST(len(replace(d.text, ' ', '')) AS BIGINT) AS n_chars,
       |  CAST(CASE WHEN coalesce(p.stream, '') = '' THEN 0
       |       ELSE len(list_filter(string_split(p.stream, ' '),
       |                            x -> len(x) = 1)) END AS BIGINT)
       |    AS n_char_tokens,
       |  CAST(CASE WHEN coalesce(p.stream, '') = '' THEN 0
       |       ELSE (len(replace(d.text, ' ', '')) * 10000)
       |            // len(string_split(p.stream, ' ')) END AS BIGINT)
       |    AS chars_per_token_x10k
       |FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  private def boilerplateSql: String =
    s"""WITH $tokCte,
       |seg AS (SELECT doc_id, CAST(i AS INT) AS seg_no,
       |          array_to_string(list_slice(t, i * 10 + 1, i * 10 + 10), ' ') AS seg
       |        FROM tok, unnest(range((len(t) - 1) // 10 + 1)) AS u(i)),
       |d AS (SELECT md5(seg) AS h, count(DISTINCT doc_id) AS seg_df
       |      FROM seg GROUP BY 1),
       |k AS (SELECT doc_id, seg_no, seg, seg_df < 2 AS kept
       |      FROM seg JOIN d ON md5(seg) = d.h)
       |SELECT doc_id, count(*) AS n_segs,
       |  CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_boiler,
       |  CAST((sum(CASE WHEN kept THEN 0 ELSE 1 END) * 10000) // count(*)
       |    AS BIGINT) AS boiler_frac_x10k,
       |  md5(coalesce(string_agg(CASE WHEN kept THEN seg END, ' '
       |    ORDER BY seg_no), '')) AS clean_fp
       |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin

  private def decontaminateSql: String =
    """WITH tokc AS (SELECT doc_id, string_split(text, ' ') AS t
      |              FROM documents WHERE doc_id % 100 <> 0),
      |shc0 AS (SELECT DISTINCT doc_id,
      |           t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS s
      |         FROM tokc, unnest(range(len(t) - 2)) AS u(i)),
      |shc AS (SELECT doc_id, s FROM (
      |          SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df
      |          FROM shc0)
      |        WHERE df <= least((SELECT count(*) FROM documents
      |                     WHERE doc_id % 100 <> 0) * 0.1, 10000)),
      |tokb AS (SELECT doc_id, string_split(text, ' ') AS t
      |         FROM documents WHERE doc_id % 100 = 0),
      |shb AS (SELECT DISTINCT t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS s
      |        FROM tokb, unnest(range(len(t) - 2)) AS u(i)),
      |bad AS (SELECT c.doc_id FROM shc c JOIN shb b ON c.s = b.s
      |        GROUP BY 1 HAVING count(DISTINCT c.s) >= 3)
      |SELECT doc_id FROM documents
      |WHERE doc_id % 100 <> 0 AND doc_id NOT IN (SELECT doc_id FROM bad)
      |ORDER BY doc_id""".stripMargin

  /** Replay of the VERIFIED incremental near-dup (minJaccard = 0.5):
    * band collisions are candidates; a pair may support a verdict only
    * if its exact shingle Jaccard clears the threshold — the same
    * ratio + 4-dp rounding as the dedup_jaccard_pairs oracle. Shared
    * by the direct and the index-served (shingle-store) gate queries.
    */
  private def incrementalVerifiedSql: String =
    s"""WITH $tokCte, $shCte, $minhashCte, $bandsCte,
       |bb AS (SELECT doc_id, band, bk FROM bands WHERE doc_id % 10 = 7),
       |cb AS (SELECT doc_id, band, bk FROM bands WHERE doc_id % 10 <> 7),
       |cp2 AS (SELECT DISTINCT b.doc_id, c.doc_id AS other
       |        FROM bb b JOIN cb c ON b.band = c.band AND b.bk = c.bk),
       |bp2 AS (SELECT DISTINCT y.doc_id, x.doc_id AS other
       |        FROM bb x JOIN bb y
       |          ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |vcp AS (SELECT p.doc_id, p.other FROM
       |          (SELECT cp2.doc_id, cp2.other, count(*) AS common
       |           FROM cp2 JOIN sh sa ON sa.doc_id = cp2.doc_id
       |                    JOIN sh sb ON sb.doc_id = cp2.other AND sb.s = sa.s
       |           GROUP BY 1, 2) p
       |        JOIN sizes za ON za.doc_id = p.doc_id
       |        JOIN sizes zb ON zb.doc_id = p.other
       |        WHERE (CAST(p.common AS BIGINT) * 10000)
       |          // (za.n + zb.n - p.common) >= 5000),
       |vbp AS (SELECT p.doc_id, p.other FROM
       |          (SELECT bp2.doc_id, bp2.other, count(*) AS common
       |           FROM bp2 JOIN sh sa ON sa.doc_id = bp2.doc_id
       |                    JOIN sh sb ON sb.doc_id = bp2.other AND sb.s = sa.s
       |           GROUP BY 1, 2) p
       |        JOIN sizes za ON za.doc_id = p.doc_id
       |        JOIN sizes zb ON zb.doc_id = p.other
       |        WHERE (CAST(p.common AS BIGINT) * 10000)
       |          // (za.n + zb.n - p.common) >= 5000),
       |ch AS (SELECT doc_id, count(DISTINCT other) AS n_c, min(other) AS m_c
       |       FROM vcp GROUP BY 1),
       |bh AS (SELECT doc_id, count(DISTINCT other) AS n_b, min(other) AS m_b
       |       FROM vbp GROUP BY 1),
       |base AS (SELECT doc_id FROM documents WHERE doc_id % 10 = 7),
       |sg AS (SELECT DISTINCT doc_id FROM bb)
       |SELECT base.doc_id,
       |  CASE WHEN sg.doc_id IS NULL THEN 'no_signature'
       |       WHEN ch.doc_id IS NOT NULL THEN 'near_dup_of_corpus'
       |       WHEN bh.doc_id IS NOT NULL THEN 'near_dup_in_batch'
       |       ELSE 'unique' END AS verdict,
       |  coalesce(ch.m_c, bh.m_b) AS match_doc,
       |  coalesce(ch.n_c, bh.n_b, 0) AS n_matches
       |FROM base LEFT JOIN sg ON base.doc_id = sg.doc_id
       |          LEFT JOIN ch ON base.doc_id = ch.doc_id
       |          LEFT JOIN bh ON base.doc_id = bh.doc_id
       |ORDER BY base.doc_id""".stripMargin

  /** A def, not a val: the ANN oracles interpolate
    * [[OracleArtifacts.pathFor]] paths registered when the gate queries
    * RAN, and [[graft.Verify]] dumps the SQL after running them.
    */
  def sql: Map[String, String] = Map(
    // ratios fixed-point (_x10k = num·10^4 // den over exact integers)
    // — the cross-engine rounding-robust emission protocol
    "text_stats" ->
      s"""WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)
         |SELECT doc_id,
         |  CAST(len(t) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
         |  CAST((CAST(len(list_distinct(t)) AS BIGINT) * 10000) // len(t)
         |    AS BIGINT) AS distinct_ratio_x10k,
         |  CAST((CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT)
         |    * 10000) // len(t) AS BIGINT) AS avg_token_len_x10k,
         |  CAST((CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))
         |    AS BIGINT) * 10000) // length(text) AS BIGINT)
         |    AS punct_ratio_x10k
         |FROM tok ORDER BY doc_id""".stripMargin,

    "text_langid" ->
      s"""WITH $langIdCte
         |SELECT doc_id, lang_guess, score FROM guess ORDER BY doc_id""".stripMargin,

    "text_quality_filter" ->
      s"""WITH $tokCte,
         |st AS (SELECT doc_id,
         |  CAST(len(t) AS BIGINT) AS n_tokens,
         |  CAST((CAST(len(list_distinct(t)) AS BIGINT) * 10000) // len(t)
         |    AS BIGINT) AS distinct_ratio_x10k
         |  FROM tok)
         |SELECT doc_id, n_tokens, distinct_ratio_x10k FROM st
         |WHERE n_tokens >= 20 AND n_tokens <= 120
         |  AND distinct_ratio_x10k >= 3000
         |ORDER BY doc_id""".stripMargin,

    "text_token_counts" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_ish_tokens,
        |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the BPE round-trip invariants, computed INDEPENDENTLY of the
    // tokenizer: however the trained merge table splits a document, the
    // subword characters must sum to the space-free text length and the
    // concatenation must reconstruct it (ExtQueries.textBpeRoundtrip
    // computes both FROM the kernel's tokens; any dropped/duplicated/
    // reordered code point diverges).
    "text_bpe_roundtrip" ->
      """SELECT doc_id,
        |  CAST(length(replace(text, ' ', '')) AS BIGINT) AS chars,
        |  true AS intact
        |FROM documents ORDER BY doc_id""".stripMargin,

    // FULL replay of the rank-greedy BPE tokenizer from the exported
    // trained merge table (the OracleArtifacts posture: training stays
    // outside SQL, everything downstream is independent). Word state
    // rides as symbols joined by DOUBLED chr(1) separators with chr(1)
    // sentinels at both ends: the pair pattern  ^Al^A^Ar^A  then (a)
    // can never match across a symbol boundary, and (b) leaves one
    // separator on each side after replacement, so DuckDB's
    // left-to-right non-overlapping replace() implements EXACTLY the
    // kernel's mergeOnce pass ("aaa" under (a,a) → ["aa","a"]). The
    // recursion applies the lowest-rank applicable pair per step
    // (LATERAL argmin — the kernel's rank-greedy loop); a terminal
    // state produces no successor, and `final` keeps exactly the
    // states with no applicable merge. Code points, not bytes: RE2's
    // '(?s).' matches one rune INCLUDING newline (words are split on
    // ' ' only, so \n survives inside them — plain '.' would silently
    // drop it and diverge from the kernel's codePointSymbols). Known
    // limit: a document containing the chr(1) sentinel itself would
    // corrupt the separator scheme — outside any real text alphabet.
    "text_bpe_tokens" -> bpeTokensSql,

    // store-served tokenize over the persisted merges artifact is
    // value-identical to the direct trained-in-session gate
    "text_bpe_indexed" -> bpeTokensSql,

    // tokenizer-corpus fit from the same artifact + CTE chain
    "text_bpe_coverage" -> bpeCoverageSql,


    // replays TextOps.piiScrub over the same derived-PII text; DuckDB
    // regexp_replace needs the 'g' flag for replace-all (Spark's default)
    "text_pii_scrub" ->
      """WITH p AS (SELECT doc_id,
        |  text || ' contact doc' || CAST(doc_id AS VARCHAR) ||
        |    '@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
        |    AS text
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'))
        |    AS n_emails,
        |  len(regexp_extract_all(text, '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS n_ips,
        |  md5(regexp_replace(
        |    regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}',
        |      '<EMAIL>', 'g'),
        |    '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g')) AS scrub_fp
        |FROM p ORDER BY doc_id""".stripMargin,

    // replays TextOps.contamination: corpus shingles (every-100th docs
    // excluded) minus stop-shingles, equi-joined to benchmark shingles
    "text_contamination" ->
      """WITH tokc AS (SELECT doc_id, string_split(text, ' ') AS t
        |              FROM documents WHERE doc_id % 100 <> 0),
        |shc0 AS (SELECT DISTINCT doc_id,
        |           t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS s
        |         FROM tokc, unnest(range(len(t) - 2)) AS u(i)),
        |shc AS (SELECT doc_id, s FROM (
        |          SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df
        |          FROM shc0)
        |        WHERE df <= least((SELECT count(*) FROM documents
        |                     WHERE doc_id % 100 <> 0) * 0.1, 10000)),
        |tokb AS (SELECT doc_id, string_split(text, ' ') AS t
        |         FROM documents WHERE doc_id % 100 = 0),
        |shb AS (SELECT DISTINCT doc_id AS bench_id,
        |          t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS s
        |        FROM tokb, unnest(range(len(t) - 2)) AS u(i))
        |SELECT c.doc_id,
        |  count(DISTINCT c.s) AS shared_shingles,
        |  count(DISTINCT b.bench_id) AS benchmark_docs
        |FROM shc c JOIN shb b ON c.s = b.s AND c.doc_id <> b.bench_id
        |GROUP BY 1 HAVING count(DISTINCT c.s) >= 3
        |ORDER BY doc_id""".stripMargin,

    // replays TextOps.decontaminate with the PLAIN exact join — no
    // Bloom anywhere in the oracle: the sketch prefilter has no false
    // negatives, so the kept set must equal the exact form's exactly.
    // Same shingle/df-cap CTEs as text_contamination; bench side needs
    // only distinct shingles (no per-bench-doc evidence in the kept-set
    // decision).
    "text_decontaminate" -> decontaminateSql,
    // identical kept set served from the persisted benchmark artifact
    // (ContaminationIndex) — shares the direct operator's oracle
    "text_decontaminate_indexed" -> decontaminateSql,

    // replays TextOps.surprisal: corpus unigram distribution, per-doc
    // mean -ln p(token)
    "text_surprisal" ->
      s"""WITH $tokCte2,
         |freq AS (SELECT w, count(*) AS c FROM tokw GROUP BY w),
         |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tokw)
         |SELECT doc_id, round(avg(-ln(c / n)), 4) AS mean_surprisal,
         |  count(*) AS n_tokens
         |FROM tokw JOIN freq USING (w), tot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // replays LanguageModelStore.score under the doc_id % 3 == 0
    // reference slice: Laplace p(w2|w1) = (cb+1)/(cw+V), unseen
    // words/bigrams coalesce to zero — the frozen-model CCNet gate
    "text_lm_surprisal" ->
      """WITH ref AS (SELECT string_split(text, ' ') AS t FROM documents
        |             WHERE doc_id % 3 = 0),
        |ru AS (SELECT w1, count(*) AS cw
        |       FROM (SELECT unnest(t) AS w1 FROM ref) GROUP BY 1),
        |vs AS (SELECT count(*) AS v FROM ru),
        |rb AS (SELECT t[i+1] AS w1, t[i+2] AS w2, count(*) AS cb
        |       FROM ref, unnest(range(len(t) - 1)) AS u(i)
        |       WHERE len(t) >= 2 GROUP BY 1, 2),
        |tb AS (SELECT doc_id, t[i+1] AS w1, t[i+2] AS w2
        |       FROM (SELECT doc_id, string_split(text, ' ') AS t
        |             FROM documents WHERE doc_id % 3 <> 0) tg,
        |            unnest(range(len(t) - 1)) AS u(i)
        |       WHERE len(t) >= 2)
        |SELECT tb.doc_id,
        |  round(avg(-ln((coalesce(rb.cb, 0) + 1)
        |    / CAST(coalesce(ru.cw, 0) + v AS DOUBLE))), 4)
        |    AS mean_lm_surprisal,
        |  count(*) AS n_bigrams
        |FROM tb LEFT JOIN rb USING (w1, w2) LEFT JOIN ru USING (w1)
        |CROSS JOIN vs
        |GROUP BY tb.doc_id ORDER BY doc_id""".stripMargin,

    // replays LanguageModelStore.importanceSelect: DSIR keep set —
    // top-100 by avg(ln p_target − ln p_background) over the en-slice
    // target and all-docs background Laplace models, rounded-weight
    // rank grain with doc_id tie-break
    "text_dsir_select" ->
      """WITH tgt AS (SELECT string_split(text, ' ') AS t FROM documents
        |             WHERE lang = 'en'),
        |tu AS (SELECT w1, count(*) AS cwt
        |       FROM (SELECT unnest(t) AS w1 FROM tgt) GROUP BY 1),
        |tv AS (SELECT count(*) AS vt FROM tu),
        |tbg AS (SELECT t[i+1] AS w1, t[i+2] AS w2, count(*) AS cbt
        |        FROM tgt, unnest(range(len(t) - 1)) AS u(i)
        |        WHERE len(t) >= 2 GROUP BY 1, 2),
        |bg AS (SELECT string_split(text, ' ') AS t FROM documents),
        |bu AS (SELECT w1, count(*) AS cwb
        |       FROM (SELECT unnest(t) AS w1 FROM bg) GROUP BY 1),
        |bv AS (SELECT count(*) AS vb FROM bu),
        |bbg AS (SELECT t[i+1] AS w1, t[i+2] AS w2, count(*) AS cbb
        |        FROM bg, unnest(range(len(t) - 1)) AS u(i)
        |        WHERE len(t) >= 2 GROUP BY 1, 2),
        |db AS (SELECT doc_id, t[i+1] AS w1, t[i+2] AS w2
        |       FROM (SELECT doc_id, string_split(text, ' ') AS t
        |             FROM documents) d,
        |            unnest(range(len(t) - 1)) AS u(i)
        |       WHERE len(t) >= 2),
        |w AS (SELECT db.doc_id,
        |        round(avg(
        |          ln((coalesce(cbt, 0) + 1)
        |            / CAST(coalesce(cwt, 0) + vt AS DOUBLE)) -
        |          ln((coalesce(cbb, 0) + 1)
        |            / CAST(coalesce(cwb, 0) + vb AS DOUBLE))), 4)
        |          AS dsir_weight,
        |        count(*) AS n_bigrams
        |      FROM db LEFT JOIN tbg USING (w1, w2)
        |              LEFT JOIN tu USING (w1)
        |              LEFT JOIN bbg USING (w1, w2)
        |              LEFT JOIN bu USING (w1)
        |      CROSS JOIN tv CROSS JOIN bv
        |      GROUP BY db.doc_id)
        |SELECT * FROM (SELECT doc_id, dsir_weight, n_bigrams FROM w
        |               ORDER BY dsir_weight DESC, doc_id LIMIT 100)
        |ORDER BY doc_id""".stripMargin,

    // replays LanguageModelStore.coverage: OOV tokens / unseen bigrams
    // vs the doc_id % 3 == 0 reference, exact fixed-point ppm
    "text_lm_oov" ->
      """WITH ref AS (SELECT string_split(text, ' ') AS t FROM documents
        |             WHERE doc_id % 3 = 0),
        |ru AS (SELECT w1, count(*) AS cw
        |       FROM (SELECT unnest(t) AS w1 FROM ref) GROUP BY 1),
        |rb AS (SELECT t[i+1] AS w1, t[i+2] AS w2, count(*) AS cb
        |       FROM ref, unnest(range(len(t) - 1)) AS u(i)
        |       WHERE len(t) >= 2 GROUP BY 1, 2),
        |tg AS (SELECT doc_id, t FROM
        |         (SELECT doc_id, string_split(text, ' ') AS t
        |          FROM documents WHERE doc_id % 3 <> 0)
        |       WHERE len(t) >= 2),
        |tokc AS (SELECT doc_id,
        |           sum(CASE WHEN ru.cw IS NULL THEN 1 ELSE 0 END) AS oov,
        |           count(*) AS n_tokens
        |         FROM (SELECT doc_id, unnest(t) AS w1 FROM tg) tt
        |         LEFT JOIN ru USING (w1) GROUP BY doc_id),
        |bgc AS (SELECT doc_id,
        |          sum(CASE WHEN rb.cb IS NULL THEN 1 ELSE 0 END) AS unseen,
        |          count(*) AS n_bigrams
        |        FROM (SELECT doc_id, t[i+1] AS w1, t[i+2] AS w2
        |              FROM tg, unnest(range(len(t) - 1)) AS u(i)) tb
        |        LEFT JOIN rb USING (w1, w2) GROUP BY doc_id)
        |SELECT doc_id,
        |  CAST((oov * 1000000) // n_tokens AS BIGINT) AS oov_ppm,
        |  CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST((unseen * 1000000) // n_bigrams AS BIGINT)
        |    AS unseen_bigram_ppm,
        |  CAST(n_bigrams AS BIGINT) AS n_bigrams
        |FROM tokc JOIN bgc USING (doc_id) ORDER BY doc_id""".stripMargin,

    // replays TextOps.bigramSurprisal: p(w2|w1) = c(w1w2)/c(w1·)
    "text_bigram_surprisal" ->
      s"""WITH $tokCte,
         |bg AS (SELECT doc_id, t[i+1] AS w1, t[i+2] AS w2
         |       FROM tok, unnest(range(len(t) - 1)) AS u(i)
         |       WHERE len(t) >= 2),
         |cbg AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2),
         |cw1 AS (SELECT w1, count(*) AS cw FROM bg GROUP BY 1)
         |SELECT doc_id,
         |  round(avg(-ln(cb / CAST(cw AS DOUBLE))), 4) AS mean_bigram_surprisal,
         |  count(*) AS n_bigrams
         |FROM bg JOIN cbg USING (w1, w2) JOIN cw1 USING (w1)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "text_bm25" ->
      """WITH tokw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |dl AS (SELECT doc_id, count(*) AS len FROM tokw GROUP BY doc_id),
        |sc AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(len) AS avg_len FROM dl),
        |tf AS (SELECT doc_id, w, count(*) AS tf FROM tokw
        |       WHERE w IN ('fast', 'join', 'table') GROUP BY doc_id, w),
        |dfq AS (SELECT w, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY w),
        |term AS (SELECT tf.doc_id,
        |    ln((sc.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1) * tf.tf * 2.2 /
        |      (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.len / sc.avg_len)) AS s
        |  FROM tf JOIN dfq USING (w) JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN sc)
        |SELECT doc_id, round(sum(s), 4) AS bm25 FROM term GROUP BY doc_id
        |ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id, md5(lower(text)) AS fp FROM documents ORDER BY doc_id""",

    // exact token top-10: approx_top_k is EXACT while its tracked-item
    // budget (100k) exceeds the vocabulary — which holds at every test
    // SF (spec-pinned in SketchSpec), so the sketch replays as plain
    // group/order/limit
    "frequent_tokens" ->
      s"""WITH $tokCte2
         |SELECT w AS token, count(*) AS n FROM tokw
         |GROUP BY w ORDER BY n DESC, token LIMIT 10""".stripMargin,

    // replays ExtQueries.sketchCms's exact audit side; probe_ok is
    // CMS's deterministic estimate ≥ exact guarantee — constant TRUE in
    // SQL, real computation on the Spark side (a broken build/probe
    // hash pairing under-counts and goes red here)
    "sketch_cms" -> cmsSql,

    // the store-served twin (FrequencyStore built write(doc_id even) +
    // extend(doc_id odd)) shares the oracle verbatim: CMS merge is
    // exact additive algebra (cell-wise counter sums under one seed),
    // so the split-built sketch's probes must satisfy the same
    // ≥-exact invariant the one-shot sketch does
    "sketch_cms_store" -> cmsSql,

    // replays ExtQueries.textNoveltyIndexed's EXACT side: 3-shingles
    // distinct per doc, presence among the even docs' shingles, per-
    // odd-doc exact seen counts and fixed-point novelty ppm; probe_ok
    // is the one-sided Bloom invariant (no false negatives — a truly-
    // seen shingle can never be missed), asserted TRUE here
    "text_novelty_indexed" ->
      s"""WITH $tokCte,
         |$shCte,
         |base AS (SELECT DISTINCT s FROM sh WHERE doc_id % 2 = 0),
         |probe AS (SELECT doc_id, s FROM sh WHERE doc_id % 2 = 1),
         |seen AS (SELECT p.doc_id, count(*) AS exact_seen
         |         FROM probe p JOIN base b ON p.s = b.s
         |         GROUP BY p.doc_id),
         |n AS (SELECT doc_id, count(*) AS n_shingles FROM probe
         |      GROUP BY doc_id)
         |SELECT n.doc_id, n.n_shingles,
         |       COALESCE(seen.exact_seen, 0) AS exact_seen,
         |       (n.n_shingles - COALESCE(seen.exact_seen, 0)) * 1000000
         |         // n.n_shingles AS novelty_exact_ppm,
         |       TRUE AS probe_ok
         |FROM n LEFT JOIN seen ON n.doc_id = seen.doc_id
         |ORDER BY n.doc_id""".stripMargin,

    "graph_pagerank" -> pagerankSql,

    "graph_label_prop" -> labelPropSql,

    // replays GraphOps.kCorePeel(k=80, rounds=3) over the co-purchase
    // graph: every synchronous peel round unrolled (degree over the
    // current subgraph, drop deg < 3, keep edges between survivors)
    "graph_kcore" -> kcoreSql,

    // replays ExtQueries.profileConstraints: the six-check
    // data-quality suite over orders as plain one-pass SQL — each
    // check a conditional count (uniqueness via count-distinct), the
    // ppm fixed-point over HUGEINT cast back to BIGINT (the oracle
    // type-fidelity rule the r8 reds taught)
    "profile_constraints" ->
      """WITH t AS (SELECT count(*) AS total,
        |  count(CASE WHEN o_custkey IS NULL THEN 1 END) AS v1,
        |  count(CASE WHEN o_orderkey IS NOT NULL THEN 1 END)
        |    - count(DISTINCT o_orderkey) AS v2,
        |  count(CASE WHEN o_totalprice < 10000.0
        |             OR o_totalprice > 200000.0 THEN 1 END) AS v3,
        |  count(CASE WHEN o_orderpriority IS NOT NULL AND NOT
        |    regexp_matches(o_orderpriority, '^[1-3]-') THEN 1 END) AS v4,
        |  count(CASE WHEN o_orderstatus IS NOT NULL AND
        |    o_orderstatus NOT IN ('F', 'O') THEN 1 END) AS v5,
        |  greatest(1000000 - count(*), 0) AS v6
        |  FROM orders),
        |u AS (
        |  SELECT 1 AS check_no, 'not_null' AS check_name,
        |    'o_custkey' AS target, v1 AS violations, total FROM t
        |  UNION ALL SELECT 2, 'unique', 'o_orderkey', v2, total FROM t
        |  UNION ALL SELECT 3, 'in_range', 'o_totalprice', v3, total FROM t
        |  UNION ALL SELECT 4, 'matches', 'o_orderpriority', v4, total FROM t
        |  UNION ALL SELECT 5, 'in_set', 'o_orderstatus', v5, total FROM t
        |  UNION ALL SELECT 6, 'min_rows', '*', v6, total FROM t)
        |SELECT CAST(check_no AS BIGINT) AS check_no, check_name, target,
        |  CAST(violations AS BIGINT) AS violations,
        |  CAST(total AS BIGINT) AS total_rows,
        |  CAST((CAST(violations AS HUGEINT) * 1000000)
        |    // greatest(total, 1) AS BIGINT) AS violation_ppm,
        |  violations = 0 AS passed
        |FROM u ORDER BY check_no""".stripMargin,

    // replays ExtQueries.sketchKmvRollup as the DIRECT per-lang
    // sketch: the Spark side computes per-(lang, source) sketches and
    // MERGES them per lang, so hash equality against this direct
    // replay is a driver-checked proof of the rollup algebra
    // (k-min-of-k-mins = k-min-of-union) — the property the HLL
    // rollup twin can only bound, not prove
    "sketch_kmv_rollup" ->
      s"""WITH tw AS (SELECT lang, string_split(text, ' ') AS t
         |            FROM documents),
         |sh AS (SELECT lang, t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS w
         |       FROM tw, unnest(range(len(t) - 2)) AS u(i)),
         |dt AS (SELECT DISTINCT lang, w FROM sh),
         |h AS (SELECT DISTINCT lang, md5(w) AS h FROM dt),
         |r AS (SELECT lang, h,
         |        row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
         |      FROM h),
         |sk AS (SELECT lang, h, rn FROM r WHERE rn <= 64),
         |s AS (SELECT lang, count(*) AS n_kept,
         |        max(CASE WHEN rn = 64 THEN h END) AS kth
         |      FROM sk GROUP BY 1),
         |e AS (SELECT lang, count(*) AS exact_shingles FROM dt GROUP BY 1)
         |SELECT e.lang, e.exact_shingles, s.n_kept,
         |  CASE WHEN s.n_kept < 64 THEN s.n_kept
         |  ELSE CAST((CAST(63 AS HUGEINT) * 1152921504606846976)
         |    // greatest(${nibbleValue("s.kth", 15)}, 64) AS BIGINT)
         |  END AS est
         |FROM e JOIN s USING (lang) ORDER BY lang""".stripMargin,

    // the sketch_cms pattern for the HLL++ estimate: the query outputs
    // the exact distinct count (replayed here) plus est_ok, the
    // documented-error invariant — constant TRUE in SQL, real sketch
    // computation on the Spark side
    "approx_distinct" ->
      """SELECT lang, count(DISTINCT source) AS exact_sources,
        |  count(*) AS n, TRUE AS est_ok
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // same pattern for the merged per-(lang,source) HLL rollup: exact
    // distinct docs per lang replayed; est_ok is the lgK=12 bound
    "hll_partitioned" ->
      """SELECT lang, count(DISTINCT doc_id) AS exact_docs,
        |  count(*) AS "rows", TRUE AS est_ok
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // same pattern for GK rank error: group totals replayed; the rank
    // invariants are constant TRUE in SQL, checked for real against
    // the orders scan on the Spark side
    "percentile_sketch" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  TRUE AS rank50_ok, TRUE AS rank90_ok
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // hybrid retrieval: the bm25 pipeline (same CTEs as text_bm25, top
    // 50), the cosine pipeline (same shape as embed_topk, query vec 0,
    // top 50), ranks fused with 1/(60+rank); double division forced —
    // DuckDB's bare 1.0 is DECIMAL and divides under different rounding
    "hybrid_rrf" ->
      s"""WITH tokw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
         |dl AS (SELECT doc_id, count(*) AS len FROM tokw GROUP BY doc_id),
         |sc AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(len) AS avg_len FROM dl),
         |tf AS (SELECT doc_id, w, count(*) AS tf FROM tokw
         |       WHERE w IN ('fast', 'join', 'table') GROUP BY doc_id, w),
         |dfq AS (SELECT w, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY w),
         |term AS (SELECT tf.doc_id,
         |    ln((sc.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1) * tf.tf * 2.2 /
         |      (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.len / sc.avg_len)) AS s
         |  FROM tf JOIN dfq USING (w) JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN sc),
         |bm AS (SELECT doc_id, round(sum(s), 4) AS bm25 FROM term GROUP BY doc_id),
         |tr AS (SELECT doc_id, r_t FROM (
         |    SELECT doc_id, CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS r_t
         |    FROM bm) WHERE r_t <= 50),
         |$embCte,
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         |scored AS (SELECT e.vec_id AS doc_id,
         |    round(list_dot_product(qv, v) /
         |      (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 5) AS cos
         |  FROM e CROSS JOIN q WHERE e.vec_id <> 0),
         |vr AS (SELECT doc_id, r_v FROM (
         |    SELECT doc_id, CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS BIGINT) AS r_v
         |    FROM scored) WHERE r_v <= 50)
         |SELECT coalesce(tr.doc_id, vr.doc_id) AS doc_id, r_t, r_v,
         |  round(coalesce(1.0::DOUBLE / (60 + r_t), 0) +
         |        coalesce(1.0::DOUBLE / (60 + r_v), 0), 6) AS rrf
         |FROM tr FULL OUTER JOIN vr ON tr.doc_id = vr.doc_id
         |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,

    "text_simhash" -> simhashSql,

    "dedup_simhash_pairs" -> simhashPairsSql,

    "dedup_exact" ->
      """SELECT md5(lower(text)) AS fp, min(doc_id) AS keep_doc_id, count(*) AS n_copies
        |FROM documents GROUP BY fp ORDER BY fp""".stripMargin,

    // replays TextOps.incrementalDedup over the simulated delta:
    // batch = doc_id ≡ 7 (mod 10), corpus = the rest; verdict per the
    // (corpus hit, first-in-batch) precedence
    "dedup_incremental" ->
      """WITH batch AS (SELECT doc_id, md5(lower(text)) AS fp
        |    FROM documents WHERE doc_id % 10 = 7),
        |corpus AS (SELECT DISTINCT md5(lower(text)) AS fp
        |    FROM documents WHERE doc_id % 10 <> 7),
        |r AS (SELECT b.doc_id, b.fp, (c.fp IS NOT NULL) AS hit,
        |    row_number() OVER (PARTITION BY b.fp ORDER BY b.doc_id) AS rn
        |  FROM batch b LEFT JOIN corpus c USING (fp))
        |SELECT doc_id, fp,
        |  CASE WHEN hit THEN 'dup_of_corpus'
        |       WHEN rn > 1 THEN 'dup_in_batch'
        |       ELSE 'new' END AS verdict
        |FROM r ORDER BY doc_id""".stripMargin,

    // replays TextOps.incrementalNearDup over the dedup_incremental
    // delta split: bands are a pure per-doc function, so one bands CTE
    // over all documents splits into batch (doc_id ≡ 7 mod 10) and
    // corpus sides; corpus-collision precedence over in-batch; batch
    // docs too short to shingle surface as explicit no_signature rows
    "dedup_incremental_near" -> incrementalNearSql,

    // the persisted band index serves the SAME verdicts (deterministic
    // bands, same corpus — spec-pinned), so the replay is shared
    "dedup_incremental_indexed" -> incrementalNearSql,

    // replays the VERIFIED incremental near-dup (minJaccard = 0.5):
    // band collisions are candidates; a pair may support a verdict only
    // if its exact shingle Jaccard clears the threshold — the same
    // ratio + 4-dp rounding as the dedup_jaccard_pairs oracle
    "dedup_incremental_verified" -> incrementalVerifiedSql,

    // the shingle-store index serves the SAME verified verdicts
    // (deterministic bands + exact Jaccard over the same shingle sets
    // — spec-pinned), so the replay is shared
    "dedup_incremental_verified_indexed" -> incrementalVerifiedSql,

    "dedup_minhash_bands" ->
      s"""WITH $tokCte, $shCte, $minhashCte, $bandsCte
         |SELECT doc_id, band, bk FROM bands ORDER BY doc_id, band""".stripMargin,

    "dedup_minhash_pairs" ->
      s"""WITH $tokCte, $shCte, $minhashCte, $bandsCte, $cpCte
         |SELECT a, b FROM cp ORDER BY a, b""".stripMargin,

    // replays TextOps.splitLeakage: the candidate-pair CTE chain joined
    // with corpus_split's md5-bucket assignment (seed graftsplit) on
    // both pair sides, cross-split rows only
    "split_leakage" ->
      s"""WITH $tokCte, $shCte, $minhashCte, $bandsCte, $cpCte,
         |spl AS (SELECT doc_id,
         |  CASE WHEN ${nibbleValue(
              "md5('graftsplit' || CAST(doc_id AS VARCHAR))", 4)} % 100 < 80
         |       THEN 'train'
         |       WHEN ${nibbleValue(
              "md5('graftsplit' || CAST(doc_id AS VARCHAR))", 4)} % 100 < 90
         |       THEN 'val' ELSE 'test' END AS split
         |  FROM documents)
         |SELECT cp.a, cp.b, sa.split AS split_a, sb.split AS split_b
         |FROM cp
         |JOIN spl sa ON cp.a = sa.doc_id
         |JOIN spl sb ON cp.b = sb.doc_id
         |WHERE sa.split <> sb.split
         |ORDER BY cp.a, cp.b""".stripMargin,

    // replays TextOps.minhashJaccardEstimate: candidate pairs from the
    // band join, then the 8-hash agreement fraction
    "dedup_minhash_estimate" -> {
      val agree = (0 until TextOpsConsts.seeds)
        .map(i => s"(CASE WHEN x.h$i = y.h$i THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH $tokCte, $shCte, $minhashCte, $bandsCte, $cpCte
         |SELECT a, b,
         |  CAST((CAST(($agree) AS BIGINT) * 10000) // ${TextOpsConsts.seeds}
         |    AS BIGINT) AS est_jaccard_x10k
         |FROM cp JOIN mh x ON cp.a = x.doc_id JOIN mh y ON cp.b = y.doc_id
         |ORDER BY a, b""".stripMargin
    },

    // replays ExtQueries.textLangMismatch: the trained trigram guess vs
    // the label, disagreement rate per source; a NULL label counts in
    // the denominator as a non-mismatch (CASE → 0), matching the Spark
    // side's coalesce
    "text_lang_mismatch" ->
      s"""WITH $langIdCte
         |SELECT d.source, count(*) AS n_docs,
         |  CAST((sum(CASE WHEN g.lang_guess <> d.lang THEN 1 ELSE 0 END)
         |    * 10000) // count(*) AS BIGINT) AS mismatch_rate_x10k
         |FROM documents d JOIN guess g USING (doc_id)
         |GROUP BY d.source ORDER BY d.source""".stripMargin,

    // replays TextOps.cosinePairs: DF-capped index, per-shingle weight
    // idf² = ln(N/df)², per-doc norms, pair dot via the same self-join
    "dedup_cosine_pairs" ->
      s"""WITH $tokCte, $shCte,
         |shf AS (SELECT doc_id, s FROM (
         |          SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df
         |          FROM sh)
         |        WHERE df <= least((SELECT count(*) FROM documents) * 0.1, 10000)),
         |wts AS (SELECT s, pow(ln(CAST((SELECT count(*) FROM documents) AS DOUBLE)
         |          / df), 2) AS w2
         |        FROM (SELECT s, count(*) AS df FROM shf GROUP BY s)),
         |sw AS (SELECT doc_id, shf.s, w2 FROM shf JOIN wts USING (s)),
         |norms AS (SELECT doc_id, sum(w2) AS n2 FROM sw GROUP BY doc_id),
         |pairs AS (SELECT x.doc_id AS a, y.doc_id AS b, sum(x.w2) AS dot
         |          FROM sw x JOIN sw y ON x.s = y.s AND x.doc_id < y.doc_id
         |          GROUP BY 1, 2)
         |SELECT a, b, round(dot / sqrt(na.n2 * nb.n2), 4) AS cos
         |FROM pairs JOIN norms na ON a = na.doc_id JOIN norms nb ON b = nb.doc_id
         |WHERE round(dot / sqrt(na.n2 * nb.n2), 4) >= 0.5
         |ORDER BY a, b""".stripMargin,

    // replays ExtQueries.dedupCanonical: the recursive-CTE closure of
    // the candidate graph joined to the quality score, best-quality
    // member (doc_id tiebreak) kept per cluster
    "dedup_canonical" ->
      s"""WITH RECURSIVE $tokCte, $shCte, $minhashCte, $bandsCte,
         |$cpCte,
         |edges AS (SELECT a AS src, b AS dst FROM cp UNION SELECT b, a FROM cp),
         |reach(id, r) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, rr.r FROM edges e JOIN reach rr ON e.dst = rr.id),
         |cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
         |$qualityCte,
         |j AS (SELECT cl.cluster_id, cl.doc_id, qs.quality_score,
         |        row_number() OVER (PARTITION BY cl.cluster_id
         |          ORDER BY qs.quality_score DESC, cl.doc_id) AS rn
         |      FROM cl JOIN qs USING (doc_id))
         |SELECT cluster_id, count(*) AS n_members,
         |  max(CASE WHEN rn = 1 THEN doc_id END) AS keep_doc_id,
         |  max(CASE WHEN rn = 1 THEN quality_score END) AS keep_quality
         |FROM j GROUP BY cluster_id ORDER BY cluster_id""".stripMargin,

    // shf replays TextOps.jaccardPairs' stop-shingle DF cap: shingles in
    // more than 10% of the corpus leave the index before sizes AND join
    "dedup_jaccard_pairs" ->
      s"""WITH $tokCte, $shCte,
         |shf AS (SELECT doc_id, s FROM (
         |          SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df
         |          FROM sh)
         |        WHERE df <= least((SELECT count(*) FROM documents) * 0.1, 10000)),
         |sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id),
         |pairs AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS common
         |          FROM shf x JOIN shf y ON x.s = y.s AND x.doc_id < y.doc_id
         |          GROUP BY 1, 2)
         |SELECT a, b, CAST((common * 10000) // (sa.n + sb.n - common) AS BIGINT)
         |    AS jaccard_x10k
         |FROM pairs JOIN sizes sa ON a = sa.doc_id JOIN sizes sb ON b = sb.doc_id
         |WHERE (common * 10000) // (sa.n + sb.n - common) >= 5000
         |ORDER BY a, b""".stripMargin,

    // replays TextOps.qualityScore via the shared logistic CTE; keep
    // thresholds the already-rounded score exactly as the Spark side
    "text_quality_score" ->
      s"""WITH $qualityCte
         |SELECT doc_id, quality_score,
         |  CAST(quality_score >= 0.5 AS INT) AS keep
         |FROM qs ORDER BY doc_id""".stripMargin,

    // replays ExtQueries.corpusSnapshotDiff: md5 content hash per
    // side, full-outer join on id, unchanged rows dropped
    // per-column digest scheme: hash = md5(concat of per-column md5s)
    // — with one non-null column that is md5(md5(text))
    "corpus_snapshot_diff" ->
      """WITH o AS (SELECT doc_id, md5(COALESCE(md5(text), 'null'))
        |         AS old_hash FROM documents),
        |n0 AS (SELECT doc_id,
        |         CASE WHEN doc_id % 10 = 3 THEN text || ' v2'
        |              ELSE text END AS text
        |       FROM documents WHERE doc_id % 10 <> 7
        |       UNION ALL
        |       SELECT doc_id + 1000000 AS doc_id, text
        |       FROM documents WHERE doc_id % 10 = 1),
        |n AS (SELECT doc_id, md5(COALESCE(md5(text), 'null'))
        |        AS new_hash FROM n0)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id, o.old_hash,
        |  n.new_hash,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.old_hash <> n.new_hash THEN 'changed' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        |WHERE (o.doc_id IS NULL OR n.doc_id IS NULL OR
        |       o.old_hash <> n.new_hash)
        |ORDER BY doc_id""".stripMargin,

    // replays CorpusOps.curriculumOrder over the quality-score
    // artifact: absolute score band (no rank), md5 in-band shuffle —
    // the hash check covers the entire training presentation order
    "corpus_curriculum" ->
      s"""WITH $qualityCte
         |SELECT doc_id, quality_score AS score,
         |  CAST(least(floor(quality_score * 10), 9) AS INT) AS qband,
         |  md5('graftcur' || CAST(doc_id AS VARCHAR)) AS skey
         |FROM qs ORDER BY qband DESC, skey""".stripMargin,

    // replays TextOps.containmentPairs: same pair-stats CTEs as jaccard,
    // ratio = common / min(|A|, |B|)
    "dedup_containment" ->
      s"""WITH $tokCte, $shCte,
         |shf AS (SELECT doc_id, s FROM (
         |          SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df
         |          FROM sh)
         |        WHERE df <= least((SELECT count(*) FROM documents) * 0.1, 10000)),
         |sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id),
         |pairs AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS common
         |          FROM shf x JOIN shf y ON x.s = y.s AND x.doc_id < y.doc_id
         |          GROUP BY 1, 2)
         |SELECT a, b, CAST((common * 10000) // least(sa.n, sb.n) AS BIGINT)
         |    AS containment_x10k
         |FROM pairs JOIN sizes sa ON a = sa.doc_id JOIN sizes sb ON b = sb.doc_id
         |WHERE (common * 10000) // least(sa.n, sb.n) >= 8000
         |ORDER BY a, b""".stripMargin,

    // replays ExtQueries.dedupSharedIndex: the SAME pair-stats CTEs as
    // dedup_jaccard_pairs / dedup_containment, read twice — the oracle
    // face of the shared-index cost model (one index, two projections)
    "dedup_shared_index" ->
      s"""WITH $tokCte, $shCte,
         |shf AS (SELECT doc_id, s FROM (
         |          SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df
         |          FROM sh)
         |        WHERE df <= least((SELECT count(*) FROM documents) * 0.1, 10000)),
         |sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id),
         |pairs AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS common
         |          FROM shf x JOIN shf y ON x.s = y.s AND x.doc_id < y.doc_id
         |          GROUP BY 1, 2)
         |SELECT kind, a, b, score_x10k FROM (
         |  SELECT 'jaccard' AS kind, a, b,
         |    CAST((common * 10000) // (sa.n + sb.n - common) AS BIGINT)
         |      AS score_x10k
         |  FROM pairs JOIN sizes sa ON a = sa.doc_id JOIN sizes sb ON b = sb.doc_id
         |  WHERE (common * 10000) // (sa.n + sb.n - common) >= 5000
         |  UNION ALL
         |  SELECT 'containment' AS kind, a, b,
         |    CAST((common * 10000) // least(sa.n, sb.n) AS BIGINT) AS score_x10k
         |  FROM pairs JOIN sizes sa ON a = sa.doc_id JOIN sizes sb ON b = sb.doc_id
         |  WHERE (common * 10000) // least(sa.n, sb.n) >= 8000)
         |ORDER BY kind, a, b""".stripMargin,

    // replays TextOps.sourceKl: KL(P_source || P_corpus) over unigrams
    "text_kl_sources" ->
      s"""WITH tokw AS (SELECT source, unnest(string_split(text, ' ')) AS w
         |              FROM documents),
         |sc AS (SELECT source, w, count(*) AS cs FROM tokw GROUP BY 1, 2),
         |wc AS (SELECT w, count(*) AS c FROM tokw GROUP BY 1),
         |st AS (SELECT source, count(*) AS ns FROM tokw GROUP BY 1),
         |tt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tokw)
         |SELECT source,
         |  round(sum((cs / CAST(ns AS DOUBLE)) *
         |    ln((cs / CAST(ns AS DOUBLE)) / (c / n))), 4) AS kl_vs_corpus,
         |  CAST(max(ns) AS BIGINT) AS n_tokens
         |FROM sc JOIN wc USING (w) JOIN st USING (source) CROSS JOIN tt
         |GROUP BY source ORDER BY source""".stripMargin,

    // replays CorpusOps.rendezvousRoute for BOTH shard lists: the
    // winner is the string max of md5('rv10:'||shard||':'||id) ||
    // shard (md5 hex is exactly 32 chars, so substring(33) recovers
    // the shard; lexicographic order compares the hash first, the
    // shard name as the 2^-128 tiebreak — identical in both engines)
    "corpus_rendezvous" ->
      """WITH s8(shard) AS (VALUES ('s00'),('s01'),('s02'),('s03'),
        |                          ('s04'),('s05'),('s06'),('s07')),
        |s9(shard) AS (VALUES ('s00'),('s01'),('s02'),('s03'),('s04'),
        |                     ('s05'),('s06'),('s07'),('s08')),
        |k8 AS (
        |  SELECT d.doc_id,
        |         substring(max(md5('rv10:' || s.shard || ':' ||
        |           CAST(d.doc_id AS VARCHAR)) || s.shard), 33) AS shard8
        |  FROM documents d CROSS JOIN s8 s GROUP BY d.doc_id
        |),
        |k9 AS (
        |  SELECT d.doc_id,
        |         substring(max(md5('rv10:' || s.shard || ':' ||
        |           CAST(d.doc_id AS VARCHAR)) || s.shard), 33) AS shard9
        |  FROM documents d CROSS JOIN s9 s GROUP BY d.doc_id
        |)
        |SELECT shard8 AS shard,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN shard9 <> shard8 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_moved,
        |       md5(coalesce(string_agg(CAST(doc_id AS VARCHAR), ','
        |         ORDER BY doc_id), '')) AS ids_digest,
        |       md5(coalesce(string_agg(CASE WHEN shard9 <> shard8
        |         THEN CAST(doc_id AS VARCHAR) END, ','
        |         ORDER BY doc_id), '')) AS moved_digest
        |FROM k8 JOIN k9 USING (doc_id)
        |GROUP BY shard8 ORDER BY shard8""".stripMargin,

    // replays CorpusOps.rendezvousRouteHierarchical as the relational
    // two-step: the group contest in the ':g' domain, then the shard
    // contest restricted (join) to the matched group in the ':s'
    // domain — a hash match proves the operator's lazily-dispatched
    // CASE form identical, document for document
    "corpus_rendezvous_hier" ->
      """WITH g(grp) AS (VALUES ('g0'),('g1'),('g2'),('g3')),
        |sh(grp, shard) AS (VALUES
        |  ('g0','s00'),('g0','s01'),('g0','s02'),('g0','s03'),
        |  ('g1','s04'),('g1','s05'),('g1','s06'),('g1','s07'),
        |  ('g2','s08'),('g2','s09'),('g2','s10'),('g2','s11'),
        |  ('g3','s12'),('g3','s13'),('g3','s14'),('g3','s15')),
        |kg AS (
        |  SELECT d.doc_id,
        |         substring(max(md5('rvh:g:' || g.grp || ':' ||
        |           CAST(d.doc_id AS VARCHAR)) || g.grp), 33) AS grp
        |  FROM documents d CROSS JOIN g GROUP BY d.doc_id
        |),
        |ks AS (
        |  SELECT kg.doc_id,
        |         substring(max(md5('rvh:s:' || sh.shard || ':' ||
        |           CAST(kg.doc_id AS VARCHAR)) || sh.shard), 33) AS shard
        |  FROM kg JOIN sh ON sh.grp = kg.grp GROUP BY kg.doc_id
        |)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        |       md5(coalesce(string_agg(CAST(doc_id AS VARCHAR), ','
        |         ORDER BY doc_id), '')) AS ids_digest
        |FROM ks GROUP BY 1 ORDER BY 1""".stripMargin,

    // replays CorpusOps.rendezvousRouteWeighted: the same md5 || name
    // string-max contest over the INTEGER-REPLICATED virtual entries
    // (weight 1/2/5 -> 8 virtual shards), winner's real shard
    // recovered by stripping at the first '#'
    "corpus_rendezvous_weighted" ->
      """WITH v(vshard) AS (VALUES ('a#0'),('b#0'),('b#1'),('c#0'),
        |                          ('c#1'),('c#2'),('c#3'),('c#4')),
        |k AS (
        |  SELECT d.doc_id,
        |         substring(max(md5('rvw:' || v.vshard || ':' ||
        |           CAST(d.doc_id AS VARCHAR)) || v.vshard), 33) AS vw
        |  FROM documents d CROSS JOIN v GROUP BY d.doc_id
        |)
        |SELECT split_part(vw, '#', 1) AS shard,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       md5(coalesce(string_agg(CAST(doc_id AS VARCHAR), ','
        |         ORDER BY doc_id), '')) AS ids_digest
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,

    // replays WebOps.urlParts over the synthesized URL column — every
    // canonicalization step as portable string algebra (see urlCtes)
    "url_canon" ->
      s"""WITH $urlCtes
         |SELECT doc_id, url, canon_url, host, domain
         |FROM wd ORDER BY doc_id""".stripMargin,

    // IDN normalization (WebOps.withIdnHost): the host construction
    // replays the gate's doc_id arithmetic, but the xn-- encodings
    // are PINNED ABSOLUTE LITERALS — RFC 3492 is not expressible in
    // SQL, so hash-green checks the engine's encoder against the
    // published punycode forms (bücher→bcher-kva, пример→e1afmkfd,
    // рф→p1ai, 例え→r8jz45g) rather than replaying it. straße pins
    // the documented IDNA2008-style deviation (ß kept → strae-oqa,
    // where IDNA2003 would fold to strasse); IP literals and
    // already-encoded input pass through byte-identically.
    "url_idn" ->
      s"""WITH $idnCtes
         |SELECT doc_id, host, host_idn,
         |       'https://' || host_idn || '/p' || doc_id AS canon_url_idn,
         |       domain_idn
         |FROM idn ORDER BY doc_id""".stripMargin,

    // IDN × blocklist composition (blocklistFilterBy over the
    // renamed IDN decoration): one rule spelled xn--bcher-kva blocks
    // BOTH the Unicode and the already-encoded spelling; the host
    // rule drops the Cyrillic-TLD subdomains; the raw-IP domain rule
    // drops exactly the /24's .2 address
    "url_blocklist_idn" ->
      s"""WITH $idnCtes
         |SELECT doc_id,
         |       'https://' || host_idn || '/p' || doc_id AS canon_url,
         |       domain_idn AS domain
         |FROM idn
         |WHERE domain_idn <> 'xn--bcher-kva.example'
         |  AND domain_idn <> '198.51.2.9'
         |  AND host_idn <> 'xn--e1afmkfd.xn--p1ai'
         |  AND NOT ends_with(host_idn, '.xn--e1afmkfd.xn--p1ai')
         |ORDER BY doc_id""".stripMargin,

    // robots.txt parse (RobotsOps.parseRobots): the shared CTE chain
    // (robotsCtes) replays the full RFC 9309 line grammar and group
    // assembly over the IDENTICAL fixture bytes (rendered via sqlStr)
    "robots_rules" ->
      s"""WITH $robotsCtes
         |SELECT host, kind, pattern FROM rrules
         |ORDER BY host, kind, pattern""".stripMargin,

    // robots decision (RobotsOps.decisionBy): candidate match via a
    // LIKE ... ESCAPE translation of the same patterns (escape
    // %/_/!, then *→%, trailing-$ anchor → no implicit suffix
    // wildcard) — the independent relational formulation the codegen
    // glob kernel is pinned against. Winner = longest pattern, allow
    // breaking ties, pattern text as the deterministic tail — the
    // exact struct-max order the operator aggregates with.
    "robots_filter" ->
      s"""WITH $robotsCtes,
         |$robotsUrlCtes,
         |rm AS (
         |  SELECT u.doc_id, r.kind, r.pattern,
         |         length(r.pattern) AS len
         |  FROM rurls u JOIN rrules r ON u.host = r.host
         |  WHERE u.pq LIKE
         |    (replace(replace(replace(replace(
         |       CASE WHEN right(r.pattern, 1) = '$$'
         |         THEN substr(r.pattern, 1, length(r.pattern) - 1)
         |         ELSE r.pattern END,
         |       '!', '!!'), '%', '!%'), '_', '!_'), '*', '%')
         |     || CASE WHEN right(r.pattern, 1) = '$$' THEN ''
         |             ELSE '%' END)
         |    ESCAPE '!'),
         |rw AS (
         |  SELECT doc_id, kind, pattern, len,
         |         row_number() OVER (PARTITION BY doc_id
         |           ORDER BY len DESC, (kind = 'allow') DESC,
         |                    pattern DESC) AS rn
         |  FROM rm)
         |SELECT u.doc_id, 'https://' || u.host || u.pq AS canon_url,
         |       (s.doc_id IS NULL OR s.kind = 'allow') AS allowed,
         |       s.kind AS win_kind, s.pattern AS win_pattern,
         |       CAST(s.len AS INTEGER) AS win_len
         |FROM rurls u
         |LEFT JOIN (SELECT * FROM rw WHERE rn = 1) s USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // sitemap declarations (RobotsOps.parseSitemaps): every
    // 'sitemap:' line regardless of group position — reads the
    // pre-whitelist line level (rl1) of the shared chain
    "robots_sitemaps" ->
      s"""WITH $robotsCtes
         |SELECT DISTINCT host,
         |       trim(substr(l, strpos(l, ':') + 1)) AS sitemap
         |FROM rl1
         |WHERE strpos(l, ':') > 0
         |  AND lower(trim(split_part(l, ':', 1))) = 'sitemap'
         |  AND length(trim(substr(l, strpos(l, ':') + 1))) > 0
         |ORDER BY host, sitemap""".stripMargin,

    // crawl delays (RobotsOps.parseCrawlDelay): crawl-delay lines
    // (unknown to the §2 grammar, so absent from the group chain)
    // attach to the group of the nearest preceding significant line
    // via a last-non-null scan, keep only agent-bound groups, drop
    // non-numeric values (TRY_CAST ≡ Spark's null-on-bad cast), min
    // across groups
    "robots_delays" ->
      s"""WITH $robotsDelayCtes
         |SELECT host, crawl_delay FROM rdelays ORDER BY host""".stripMargin,

    // politeness schedule (RobotsOps.crawlSchedule): per-host
    // row_number over the portable md5 priority × the published
    // delays (default 1.0 where a host has none) — the oracle
    // replays every URL's rank and second offset
    "robots_schedule" ->
      s"""WITH $robotsDelayCtes,
         |$robotsUrlCtes,
         |surls AS (SELECT doc_id, host FROM rurls),
         |sched AS (
         |  SELECT u.doc_id, u.host,
         |         coalesce(d.crawl_delay, 1.0) AS crawl_delay,
         |         row_number() OVER (PARTITION BY u.host
         |           ORDER BY md5('rsch:' || CAST(u.doc_id AS VARCHAR)),
         |                    CAST(u.doc_id AS VARCHAR)) AS rn
         |  FROM surls u LEFT JOIN rdelays d ON u.host = d.host)
         |SELECT doc_id, host, crawl_delay,
         |       CAST(rn AS INTEGER) AS rn,
         |       (rn - 1) * crawl_delay AS offset_s
         |FROM sched ORDER BY doc_id""".stripMargin,

    // sitemap <loc> extraction (RobotsOps.parseSitemapXml): the
    // same lazy-dotall regex, whitespace captured OUT by the \s*
    // groups, entity decode with &amp; LAST, body-level kind
    "sitemap_parse" ->
      s"""WITH $sitemapCtes
         |SELECT host, kind, loc FROM slocs
         |ORDER BY host, kind, loc""".stripMargin,

    // composed frontier (RobotsOps.frontierFromSitemaps): sitemap
    // locs -> canonical chain -> robots decision (same LIKE
    // translation as robots_filter) -> schedule over the published
    // delays. Every stage replayed. The canon replay here is the
    // SHORTCUT form — scheme case-folded, authority terminated at
    // /?# like the product, (?s) so control chars can't empty the
    // match target, query-only paths get the canonical leading '/'
    // — valid ONLY over the fixture's shape domain: lowercase
    // hosts, no userinfo/port/fragment/%-escape/tracking-param
    // features (those live in url_canon's full algebra replay; a
    // fixture extension using them must extend this CTE too)
    "frontier_pipeline" ->
      s"""WITH $robotsDelayCtes,
         |$sitemapCtes,
         |furl AS (
         |  SELECT DISTINCT loc AS url,
         |         lower(regexp_extract(loc,
         |           '^(?i)https?://([^/?#]*)', 1)) AS host,
         |         CASE WHEN regexp_extract(loc,
         |             '(?s)^(?i)https?://[^/?#]*(.*)${"$"}', 1) = ''
         |           THEN '/'
         |           WHEN substr(regexp_extract(loc,
         |             '(?s)^(?i)https?://[^/?#]*(.*)${"$"}', 1), 1, 1)
         |             = '/'
         |           THEN regexp_extract(loc,
         |             '(?s)^(?i)https?://[^/?#]*(.*)${"$"}', 1)
         |           ELSE '/' || regexp_extract(loc,
         |             '(?s)^(?i)https?://[^/?#]*(.*)${"$"}', 1)
         |         END AS pq
         |  FROM slocs
         |  WHERE kind = 'urlset'
         |    AND regexp_matches(loc, '^(?i)https?://')),
         |frm AS (
         |  SELECT u.url, r.kind, r.pattern, length(r.pattern) AS len
         |  FROM furl u JOIN rrules r ON u.host = r.host
         |  WHERE u.pq LIKE
         |    (replace(replace(replace(replace(
         |       CASE WHEN right(r.pattern, 1) = '$$'
         |         THEN substr(r.pattern, 1, length(r.pattern) - 1)
         |         ELSE r.pattern END,
         |       '!', '!!'), '%', '!%'), '_', '!_'), '*', '%')
         |     || CASE WHEN right(r.pattern, 1) = '$$' THEN ''
         |             ELSE '%' END)
         |    ESCAPE '!'),
         |frw AS (
         |  SELECT url, kind,
         |         row_number() OVER (PARTITION BY url
         |           ORDER BY len DESC, (kind = 'allow') DESC,
         |                    pattern DESC) AS rn
         |  FROM frm),
         |fkept AS (
         |  SELECT u.url, u.host FROM furl u
         |  LEFT JOIN (SELECT * FROM frw WHERE rn = 1) s USING (url)
         |  WHERE s.url IS NULL OR s.kind = 'allow'),
         |fsched AS (
         |  SELECT k.url, k.host,
         |         coalesce(d.crawl_delay, 1.0) AS crawl_delay,
         |         row_number() OVER (PARTITION BY k.host
         |           ORDER BY md5('fp:' || k.url), k.url) AS rn
         |  FROM fkept k LEFT JOIN rdelays d ON k.host = d.host)
         |SELECT url, host, crawl_delay, CAST(rn AS INTEGER) AS rn,
         |       (rn - 1) * crawl_delay AS offset_s
         |FROM fsched ORDER BY url""".stripMargin,

    // replays WebOps.domainQuota (5 per registrable domain) as the
    // per-domain window over the same md5 priority, string-id
    // tiebreak — the TopKStrIdAgg bounded-partial ≡ window proof
    "domain_quota" ->
      s"""WITH $urlCtes,
         |kq AS (SELECT doc_id, domain,
         |         md5('dqg:' || CAST(doc_id AS VARCHAR)) AS pri
         |       FROM wd),
         |rq AS (SELECT doc_id, domain,
         |         row_number() OVER (PARTITION BY domain
         |           ORDER BY pri, CAST(doc_id AS VARCHAR)) AS rn
         |       FROM kq)
         |SELECT doc_id, domain, CAST(rn AS BIGINT) AS rn
         |FROM rq WHERE rn <= 5 ORDER BY doc_id""".stripMargin,

    // replays WebOps.blocklistFilter over the shared url chain: the
    // VALUES rule table carries the CANONICAL pattern forms the
    // operator must normalize the gate's messy author forms into
    // (r4's userinfo/trailing-dot/port-strip included)
    "url_blocklist" ->
      s"""WITH $urlCtes,
         |brules(rule_id, kind, pat, phost) AS (VALUES
         |  ('r1', 'domain', 'example0.com', NULL),
         |  ('r2', 'domain', 'site2.co.uk', NULL),
         |  ('r3', 'prefix', 'https://blog.host1.org/Articles/',
         |   'blog.host1.org'),
         |  ('r4', 'prefix', 'http://cdn.data3.com.au/Articles/',
         |   'cdn.data3.com.au'),
         |  ('r5', 'domain', 'never-matches.net', NULL),
         |  ('r6', 'domain', '198.51.2.7', NULL),
         |  ('r7', 'host', 'blog.host1.org', NULL),
         |  ('r8', 'host', 'example3.com', NULL),
         |  ('r9', 'host', '[2001:db8::5]', NULL),
         |  ('r10', 'host', '2.7', NULL)),
         |blocked AS (SELECT DISTINCT doc_id FROM wd JOIN brules r
         |  ON (r.kind = 'domain' AND wd.domain = r.pat)
         |  OR (r.kind = 'host' AND (wd.host = r.pat
         |      OR (NOT starts_with(wd.host, '[')
         |          AND NOT regexp_matches(wd.host,
         |            '^[0-9]+(\\.[0-9]+){3}$$')
         |          AND ends_with(wd.host, '.' || r.pat))))
         |  OR (r.kind = 'prefix' AND wd.host = r.phost
         |      AND starts_with(wd.canon_url, r.pat)))
         |SELECT doc_id, canon_url, domain FROM wd
         |WHERE doc_id NOT IN (SELECT doc_id FROM blocked)
         |ORDER BY doc_id""".stripMargin,

    // replays WebOps.blocklistHits: per-rule block counts over the
    // same match, zero-hit rules kept via the left join
    "url_blocklist_hits" ->
      s"""WITH $urlCtes,
         |brules(rule_id, kind, pattern, pat, phost) AS (VALUES
         |  ('r1', 'domain', 'Example0.COM', 'example0.com', NULL),
         |  ('r2', 'domain', 'site2.co.uk', 'site2.co.uk', NULL),
         |  ('r3', 'prefix', 'HTTPS://Blog.Host1.ORG/Articles/',
         |   'https://blog.host1.org/Articles/', 'blog.host1.org'),
         |  ('r4', 'prefix', 'HTTP://u@CDN.Data3.COM.AU.:80/Articles/',
         |   'http://cdn.data3.com.au/Articles/', 'cdn.data3.com.au'),
         |  ('r5', 'domain', 'never-matches.net', 'never-matches.net',
         |   NULL),
         |  ('r6', 'domain', '198.51.2.7', '198.51.2.7', NULL),
         |  ('r7', 'host', 'Blog.Host1.ORG.', 'blog.host1.org', NULL),
         |  ('r8', 'host', 'example3.com', 'example3.com', NULL),
         |  ('r9', 'host', '[2001:DB8::5]', '[2001:db8::5]', NULL),
         |  ('r10', 'host', '2.7', '2.7', NULL)),
         |m AS (SELECT r.rule_id, count(*) AS n FROM wd JOIN brules r
         |  ON (r.kind = 'domain' AND wd.domain = r.pat)
         |  OR (r.kind = 'host' AND (wd.host = r.pat
         |      OR (NOT starts_with(wd.host, '[')
         |          AND NOT regexp_matches(wd.host,
         |            '^[0-9]+(\\.[0-9]+){3}$$')
         |          AND ends_with(wd.host, '.' || r.pat))))
         |  OR (r.kind = 'prefix' AND wd.host = r.phost
         |      AND starts_with(wd.canon_url, r.pat))
         |  GROUP BY r.rule_id)
         |SELECT b.rule_id, b.kind, b.pattern,
         |  CAST(coalesce(m.n, 0) AS BIGINT) AS n_hits
         |FROM brules b LEFT JOIN m USING (rule_id)
         |ORDER BY rule_id""".stripMargin,

    // replays WebOps.withRegistrableDomainPsl: the frozen rule
    // snapshot as a VALUES table, the publicsuffix.org
    // prevailing-rule decision re-derived per host (see pslCtes)
    "domain_psl" ->
      s"""WITH $pslCtes
         |SELECT doc_id, host, domain_psl
         |FROM pd ORDER BY doc_id""".stripMargin,

    // replays withRegistrableDomainPsl over the REAL-snapshot excerpt
    // (geo wildcards + city exceptions, 5-label S3 rules at the depth
    // cap, bare-wildcard ccTLDs, punycode TLDs) — same pslDecision
    // CTEs as domain_psl, different frozen rule table
    "domain_psl_full" ->
      s"""WITH $pslFullCtes
         |SELECT doc_id, host, domain_psl
         |FROM pd ORDER BY doc_id""".stripMargin,

    // replays WebOps.domainQuotaBy (3 per PSL domain) as the
    // per-domain window over the same md5 priority — blogspot
    // subdomains rank in SEPARATE partitions now
    "domain_quota_psl" ->
      s"""WITH $pslCtes,
         |pkq AS (SELECT doc_id, domain_psl AS domain,
         |          md5('dqp:' || CAST(doc_id AS VARCHAR)) AS pri
         |        FROM pd),
         |prq AS (SELECT doc_id, domain,
         |          row_number() OVER (PARTITION BY domain
         |            ORDER BY pri, CAST(doc_id AS VARCHAR)) AS rn
         |        FROM pkq)
         |SELECT doc_id, domain, CAST(rn AS BIGINT) AS rn
         |FROM prq WHERE rn <= 3 ORDER BY doc_id""".stripMargin,

    // replays WebOps.stripHtml step-for-step: the same HTML shell
    // built around the text, then comments/script/style dropped
    // ('g'+dotall/ci options = Spark's inline (?is) + replace-all
    // default), tags -> space, the six entities decoded (&amp; LAST),
    // whitespace collapsed
    "html_strip" ->
      """WITH h AS (SELECT doc_id,
        |  '<!DOCTYPE html><html><head><style>body{color:red}</style>' ||
        |  (CASE WHEN doc_id % 3 = 0
        |     THEN '<script type="text/javascript">var x = 1 < 2;</script>'
        |     ELSE '' END) ||
        |  '</head><body><!-- id ' || CAST(doc_id AS VARCHAR) ||
        |  ' --><h1>Doc &#39;' || CAST(doc_id AS VARCHAR) ||
        |  '&#39;</h1><p>' ||
        |  (CASE WHEN doc_id % 5 = 0
        |     THEN regexp_replace(text, ' ', '&nbsp;', 'g') ELSE text END) ||
        |  '</p>' ||
        |  (CASE WHEN doc_id % 4 = 1
        |     THEN '<div class="x">&lt;tag&gt; &amp;amp; more</div>'
        |     ELSE '' END) ||
        |  '</body></html>' AS html FROM documents),
        |s1 AS (SELECT doc_id,
        |  regexp_replace(html, '<!--.*?-->', ' ', 'gs') AS t FROM h),
        |s2 AS (SELECT doc_id, regexp_replace(t,
        |  '<script\b[^>]*>.*?</script>', ' ', 'gis') AS t FROM s1),
        |s3 AS (SELECT doc_id, regexp_replace(t,
        |  '<style\b[^>]*>.*?</style>', ' ', 'gis') AS t FROM s2),
        |s4 AS (SELECT doc_id,
        |  regexp_replace(t, '<[^>]+>', ' ', 'g') AS t FROM s3),
        |s5 AS (SELECT doc_id,
        |  replace(replace(replace(replace(replace(replace(t,
        |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |    '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&') AS t FROM s4)
        |SELECT doc_id,
        |  trim(regexp_replace(t, '\s+', ' ', 'g')) AS text_clean,
        |  CAST(length(trim(regexp_replace(t, '\s+', ' ', 'g')))
        |    AS BIGINT) AS clean_chars
        |FROM s5 ORDER BY doc_id""".stripMargin,

    // the exact-SCANNER leg runs against the SAME regex replay: on
    // the well-formed fixture the quote-state scanner must be
    // byte-identical to the regex pipeline (its divergences exist
    // only on malformed shapes the fixture deliberately excludes;
    // those are spec-pinned, a scanner being un-replayable in SQL)
    "html_strip_scan" ->
      """WITH h AS (SELECT doc_id,
        |  '<!DOCTYPE html><html><head><style>body{color:red}</style>' ||
        |  (CASE WHEN doc_id % 3 = 0
        |     THEN '<script type="text/javascript">var x = 1 < 2;</script>'
        |     ELSE '' END) ||
        |  '</head><body><!-- id ' || CAST(doc_id AS VARCHAR) ||
        |  ' --><h1>Doc &#39;' || CAST(doc_id AS VARCHAR) ||
        |  '&#39;</h1><p>' ||
        |  (CASE WHEN doc_id % 5 = 0
        |     THEN regexp_replace(text, ' ', '&nbsp;', 'g') ELSE text END) ||
        |  '</p>' ||
        |  (CASE WHEN doc_id % 4 = 1
        |     THEN '<div class="x">&lt;tag&gt; &amp;amp; more</div>'
        |     ELSE '' END) ||
        |  '</body></html>' AS html FROM documents),
        |s1 AS (SELECT doc_id,
        |  regexp_replace(html, '<!--.*?-->', ' ', 'gs') AS t FROM h),
        |s2 AS (SELECT doc_id, regexp_replace(t,
        |  '<script\b[^>]*>.*?</script>', ' ', 'gis') AS t FROM s1),
        |s3 AS (SELECT doc_id, regexp_replace(t,
        |  '<style\b[^>]*>.*?</style>', ' ', 'gis') AS t FROM s2),
        |s4 AS (SELECT doc_id,
        |  regexp_replace(t, '<[^>]+>', ' ', 'g') AS t FROM s3),
        |s5 AS (SELECT doc_id,
        |  replace(replace(replace(replace(replace(replace(t,
        |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |    '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&') AS t FROM s4)
        |SELECT doc_id,
        |  trim(regexp_replace(t, '\s+', ' ', 'g')) AS text_clean,
        |  CAST(length(trim(regexp_replace(t, '\s+', ' ', 'g')))
        |    AS BIGINT) AS clean_chars
        |FROM s5 ORDER BY doc_id""".stripMargin,

    // replays WebOps.domainStats over the shared url CTEs; sum(BIGINT)
    // is HUGEINT in DuckDB -> cast back for schema parity
    "domain_stats" ->
      s"""WITH $urlCtes
         |SELECT domain, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM wd JOIN documents USING (doc_id)
         |GROUP BY domain ORDER BY domain""".stripMargin,

    // replays dedupUrl: the decorated 250-page core (a second url
    // construction; only canonicalization-invariant decorations
    // vary) pushed through the ONE shared canonicalization chain
    // (canonChain), then the keep-min group-by
    "dedup_url" ->
      s"""WITH u2 AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTPS' END) ||
        |  '://' ||
        |  (CASE WHEN doc_id % 2 = 0 THEN 'Example' ELSE 'EXAMPLE' END) ||
        |  CAST((doc_id % 250) % 5 AS VARCHAR) || '.com' ||
        |  (CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END) ||
        |  '/p/' || CAST(doc_id % 250 AS VARCHAR) ||
        |  (CASE WHEN doc_id % 4 = 0 THEN '?utm_x=1&a=1' ELSE '?a=1' END) ||
        |  (CASE WHEN doc_id % 5 = 0 THEN '#top' ELSE '' END)
        |  AS url FROM documents),
        |${canonChain(src = "u2", p = "v")}
        |SELECT canon_url, min(doc_id) AS keep_doc_id,
        |  count(*) AS n_dups
        |FROM vd GROUP BY canon_url ORDER BY canon_url""".stripMargin,

    // replays WebOps.firstOccurrenceByCanonUrl as the
    // per-canonical-URL window over the same md5 priority — the
    // min_by ≡ window equivalence the streaming URL dedup rests on
    "url_dedup_first" ->
      s"""WITH u3 AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTPS' END) ||
        |  '://' ||
        |  (CASE WHEN doc_id % 2 = 0 THEN 'Example' ELSE 'EXAMPLE' END) ||
        |  CAST((doc_id % 250) % 5 AS VARCHAR) || '.com' ||
        |  (CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END) ||
        |  '/p/' || CAST(doc_id % 250 AS VARCHAR) ||
        |  (CASE WHEN doc_id % 4 = 0 THEN '?utm_x=1&a=1' ELSE '?a=1' END) ||
        |  (CASE WHEN doc_id % 5 = 0 THEN '#top' ELSE '' END)
        |  AS url FROM documents),
        |${canonChain(src = "u3", p = "w3")}
        |, fk AS (SELECT doc_id, canon_url,
        |    md5('udf:' || CAST(doc_id AS VARCHAR)) AS pri FROM w3d),
        |fr AS (SELECT doc_id, canon_url,
        |    row_number() OVER (PARTITION BY canon_url
        |      ORDER BY pri, CAST(doc_id AS VARCHAR)) AS rn FROM fk)
        |SELECT doc_id, canon_url FROM fr WHERE rn = 1
        |ORDER BY canon_url""".stripMargin,

    // replays WebOps.domainTokenQuota as the PURE per-domain window
    // (the operator's bounded pre-prune is plan-side only): charge =
    // greatest(ceil(len/4), 50), greedy prefix by (md5 pri, id) while
    // the running total fits 900
    "domain_token_quota" ->
      s"""WITH $urlCtes,
         |tq AS (SELECT wd.doc_id, domain,
         |         greatest(CAST(ceil(length(text) / 4.0) AS BIGINT),
         |           50) AS charged,
         |         md5('dtq:' || CAST(wd.doc_id AS VARCHAR)) AS pri
         |       FROM wd JOIN documents USING (doc_id)),
         |cq AS (SELECT doc_id, domain, charged,
         |         CAST(sum(charged) OVER (PARTITION BY domain
         |           ORDER BY pri, CAST(doc_id AS VARCHAR)
         |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_charged
         |       FROM tq)
         |SELECT doc_id, domain, charged, cum_charged
         |FROM cq WHERE cum_charged <= 900 ORDER BY doc_id""".stripMargin,

    // replays CorpusOps.mixtureWeights (alpha = 0.5, budget 1e6);
    // sum(BIGINT) is HUGEINT in DuckDB -> cast back for schema parity
    "corpus_mixture" ->
      """WITH per AS (SELECT source, count(*) AS n_docs,
        |    CAST(sum(CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT)
        |      AS est_tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(est_tokens) AS DOUBLE) AS total FROM per),
        |pa AS (SELECT per.*, pow(est_tokens / total, 0.5) AS pa
        |       FROM per CROSS JOIN tot),
        |z AS (SELECT sum(pa) AS z FROM pa)
        |SELECT source, n_docs, est_tokens,
        |  round(pa / z, 6) AS mix_weight,
        |  CAST(floor(pa / z * 1000000) AS BIGINT) AS alloc_tokens
        |FROM pa CROSS JOIN z ORDER BY source""".stripMargin,

    // replays CorpusOps.epochSchedule over mixtureWeights' own
    // allocation: the mixture CTE chain verbatim → per-source epochs →
    // per-doc floor + hash16-coin fractional repeat
    "corpus_epochs" ->
      s"""WITH per AS (SELECT source,
         |    CAST(sum(CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT)
         |      AS est_tokens
         |  FROM documents GROUP BY source),
         |tot AS (SELECT CAST(sum(est_tokens) AS DOUBLE) AS total FROM per),
         |pa AS (SELECT per.*, pow(est_tokens / total, 0.5) AS pa
         |       FROM per CROSS JOIN tot),
         |z AS (SELECT sum(pa) AS z FROM pa),
         |alloc AS (SELECT source,
         |    CAST(floor(pa / z * 1000000) AS BIGINT) AS alloc_tokens
         |  FROM pa CROSS JOIN z),
         |dt AS (SELECT doc_id, source,
         |    CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens
         |  FROM documents),
         |ep AS (SELECT alloc.source,
         |    alloc_tokens / CAST(per.est_tokens AS DOUBLE) AS epochs,
         |    CAST((CAST(alloc_tokens AS HUGEINT) * 1000000)
         |      // per.est_tokens AS BIGINT) AS epochs_x1m
         |  FROM alloc JOIN per ON alloc.source = per.source)
         |SELECT dt.doc_id, dt.source, dt.est_tokens,
         |  ep.epochs_x1m AS epochs_x1m,
         |  CAST(floor(ep.epochs) +
         |    CASE WHEN ${nibbleValue(
                   "md5('graftep' || CAST(dt.doc_id AS VARCHAR))", 4)}
         |      < (ep.epochs - floor(ep.epochs)) * 65536
         |    THEN 1 ELSE 0 END AS BIGINT) AS repeats
         |FROM dt JOIN ep ON dt.source = ep.source
         |ORDER BY dt.doc_id""".stripMargin,

    // replays CorpusOps.samplePerGroup (k = 20 per lang): md5-of-id
    // hash order with id tiebreak
    "sample_per_group" ->
      """SELECT doc_id, lang, rn FROM (
        |  SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn
        |  FROM documents)
        |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin,

    // replays CorpusOps.shuffleOrder's permutation key — md5 agrees
    // byte-for-byte across engines, so the hash check covers the whole
    // training-order permutation
    "corpus_shuffle" ->
      """SELECT doc_id,
        |  md5('graft' || CAST(doc_id AS VARCHAR)) AS skey
        |FROM documents ORDER BY skey""".stripMargin,

    // replays CorpusOps.splitAssign (seed graftsplit, 80/10/10): first
    // four md5 nibbles mod 100 via the strpos hex trick
    "corpus_split" ->
      """WITH h AS (SELECT doc_id, source,
        |    md5('graftsplit' || CAST(doc_id AS VARCHAR)) AS m FROM documents),
        |v AS (SELECT doc_id, source,
        |  CAST(((strpos('0123456789abcdef', substring(m, 1, 1)) - 1) * 4096 +
        |        (strpos('0123456789abcdef', substring(m, 2, 1)) - 1) * 256 +
        |        (strpos('0123456789abcdef', substring(m, 3, 1)) - 1) * 16 +
        |        (strpos('0123456789abcdef', substring(m, 4, 1)) - 1)) % 100
        |    AS BIGINT) AS bucket
        |  FROM h)
        |SELECT doc_id, source, bucket,
        |  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM v ORDER BY doc_id""".stripMargin,

    // replays ExtQueries.corpusAssemble: quality stats gate, exact-dedup
    // survivor semi-join, embedding norm attach (vec_id = doc_id)
    "corpus_assemble" ->
      s"""WITH st AS (SELECT doc_id, lang, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    CAST((CAST(len(list_distinct(string_split(text, ' ')))
         |      AS BIGINT) * 10000) // len(string_split(text, ' '))
         |      AS BIGINT) AS distinct_ratio_x10k
         |  FROM documents),
         |keep AS (SELECT min(doc_id) AS doc_id FROM documents
         |         GROUP BY md5(lower(text))),
         |en AS (SELECT vec_id AS doc_id,
         |    round(sqrt(list_dot_product(embedding::DOUBLE[],
         |      embedding::DOUBLE[])), 4) AS emb_norm
         |  FROM embeddings)
         |SELECT st.doc_id, lang, source, n_tokens, distinct_ratio_x10k,
         |  emb_norm
         |FROM st
         |JOIN keep ON st.doc_id = keep.doc_id
         |JOIN en ON st.doc_id = en.doc_id
         |WHERE n_tokens >= 20 AND n_tokens <= 120
         |  AND distinct_ratio_x10k >= 3000
         |ORDER BY st.doc_id""".stripMargin,

    // star contraction computes the same closure — one oracle, two
    // algorithms (the driver replays this SQL for both queries)
    "dedup_clusters_star" -> dedupClustersSql,

    // replays ExtQueries.corpusPipeline: closure + per-cluster quality
    // argmax survivors unioned with unclustered docs, quality gate at
    // 0.5, md5-bucket split — the capstone composes the closure,
    // quality and split CTEs verbatim
    "corpus_pipeline" ->
      s"""WITH RECURSIVE $tokCte, $shCte, $minhashCte, $bandsCte,
         |$cpCte,
         |edges AS (SELECT a AS src, b AS dst FROM cp UNION SELECT b, a FROM cp),
         |reach(id, r) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, rr.r FROM edges e JOIN reach rr ON e.dst = rr.id),
         |cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
         |$qualityCte,
         |j AS (SELECT cl.doc_id,
         |        row_number() OVER (PARTITION BY cl.cluster_id
         |          ORDER BY qs.quality_score DESC, cl.doc_id) AS rn
         |      FROM cl JOIN qs USING (doc_id)),
         |surv AS (SELECT doc_id FROM j WHERE rn = 1
         |         UNION ALL
         |         SELECT d.doc_id FROM documents d
         |         LEFT JOIN cl ON d.doc_id = cl.doc_id
         |         WHERE cl.doc_id IS NULL),
         |sh2 AS (SELECT doc_id, source,
         |    md5('graftsplit' || CAST(doc_id AS VARCHAR)) AS m FROM documents),
         |sv AS (SELECT doc_id, source,
         |  CAST(((strpos('0123456789abcdef', substring(m, 1, 1)) - 1) * 4096 +
         |        (strpos('0123456789abcdef', substring(m, 2, 1)) - 1) * 256 +
         |        (strpos('0123456789abcdef', substring(m, 3, 1)) - 1) * 16 +
         |        (strpos('0123456789abcdef', substring(m, 4, 1)) - 1)) % 100
         |    AS BIGINT) AS bucket
         |  FROM sh2)
         |SELECT sv.doc_id, sv.source,
         |  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val'
         |       ELSE 'test' END AS split,
         |  qs.quality_score
         |FROM sv JOIN surv USING (doc_id) JOIN qs USING (doc_id)
         |WHERE qs.quality_score >= 0.5
         |ORDER BY sv.doc_id""".stripMargin,

    // replays ExtQueries.dedupRate: the cluster closure left-joined to
    // documents, removed = clustered member that is not the min-id
    // keeper; sums cast back from DuckDB's HUGEINT
    "dedup_rate" ->
      s"""WITH RECURSIVE $tokCte, $shCte, $minhashCte, $bandsCte,
         |$cpCte,
         |edges AS (SELECT a AS src, b AS dst FROM cp UNION SELECT b, a FROM cp),
         |reach(id, r) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, rr.r FROM edges e JOIN reach rr ON e.dst = rr.id),
         |cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id)
         |SELECT d.source, count(*) AS n_docs,
         |  count(cl.cluster_id) AS n_clustered,
         |  CAST(coalesce(sum(CASE WHEN cl.cluster_id IS NOT NULL
         |      AND d.doc_id <> cl.cluster_id THEN 1 ELSE 0 END), 0) AS BIGINT)
         |    AS n_removed,
         |  CAST((coalesce(sum(CASE WHEN cl.cluster_id IS NOT NULL
         |      AND d.doc_id <> cl.cluster_id THEN 1 ELSE 0 END), 0)
         |    * 10000) // count(*) AS BIGINT) AS dup_rate_x10k
         |FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
         |GROUP BY d.source ORDER BY d.source""".stripMargin,

    // transitive closure of the minhash candidate pairs via recursive
    // CTE (min reachable id = Spark's min-label-propagation fixpoint)
    "dedup_clusters" -> dedupClustersSql,

    // replays TextOps.repetition: dup token/bigram fractions are
    // list-side; the top-token share is unnest + two-level aggregation
    "text_repetition" ->
      s"""WITH $tokCte,
         |tk AS (SELECT doc_id, t FROM tok WHERE len(t) >= 2),
         |tw AS (SELECT doc_id, unnest(t) AS w FROM tk),
         |cnt AS (SELECT doc_id, w, count(*) AS c FROM tw GROUP BY 1, 2),
         |top AS (SELECT doc_id, CAST((max(c) * 10000) // sum(c) AS BIGINT)
         |          AS top_token_frac_x10k FROM cnt GROUP BY 1),
         |ar AS (SELECT doc_id, t,
         |         list_transform(range(len(t) - 1), i -> t[i+1] || ' ' || t[i+2]) AS bg
         |       FROM tk)
         |SELECT ar.doc_id AS doc_id,
         |  CAST((CAST(len(t) - len(list_distinct(t)) AS BIGINT) * 10000)
         |    // len(t) AS BIGINT) AS dup_token_frac_x10k,
         |  CAST((CAST(len(bg) - len(list_distinct(bg)) AS BIGINT) * 10000)
         |    // len(bg) AS BIGINT) AS dup_bigram_frac_x10k,
         |  top_token_frac_x10k
         |FROM ar JOIN top ON ar.doc_id = top.doc_id ORDER BY ar.doc_id""".stripMargin,

    // replays TextOps.tfidfKeywords: scores rounded BEFORE ranking so
    // the rank tiebreak (score desc, token asc) is identical
    "text_tfidf" ->
      s"""WITH $tokCte2,
         |tf AS (SELECT doc_id, w, count(*) AS tf FROM tokw GROUP BY 1, 2),
         |dfw AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
         |nd AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents)
         |SELECT doc_id, w, score, rn FROM (
         |  SELECT doc_id, w, round(tf * ln(n_docs / df), 4) AS score,
         |    CAST(row_number() OVER (PARTITION BY doc_id
         |      ORDER BY round(tf * ln(n_docs / df), 4) DESC, w) AS BIGINT) AS rn
         |  FROM tf JOIN dfw USING (w) CROSS JOIN nd)
         |WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,

    // replays TextOps.paragraphDedup: 10-token segments, global
    // first-occurrence (by doc_id, seg_no) per segment hash survives;
    // string_agg ignores the NULLs the dropped segments leave, and the
    // all-dropped case fingerprints the empty string like concat_ws
    "dedup_paragraph" ->
      s"""WITH $tokCte,
         |seg AS (SELECT doc_id, CAST(i AS INT) AS seg_no,
         |          array_to_string(list_slice(t, i * 10 + 1, i * 10 + 10), ' ') AS seg
         |        FROM tok, unnest(range((len(t) - 1) // 10 + 1)) AS u(i)),
         |k AS (SELECT doc_id, seg_no, seg,
         |        row_number() OVER (PARTITION BY md5(seg)
         |          ORDER BY doc_id, seg_no) = 1 AS kept
         |      FROM seg)
         |SELECT doc_id, count(*) AS n_segs,
         |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  md5(coalesce(string_agg(CASE WHEN kept THEN seg END, ' '
         |    ORDER BY seg_no), '')) AS kept_fp
         |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // replays TextOps.boilerplateRemove: segments in >= 2 distinct docs
    // dropped EVERYWHERE (first copy included); exact fixed-point
    // fraction; clean_fp reassembles survivors in seg_no order
    "text_boilerplate" -> boilerplateSql,

    // index-served strip over a two-batch incremental build is
    // value-identical to the direct operator (delta counts converge)
    "text_boilerplate_indexed" -> boilerplateSql,

    // replays TextOps.substringDedup: stride-1 20-token window hashes,
    // hashes spanning >= 2 docs are duplicated spans, coverage is the
    // distinct-index union of their [pos, pos+20) ranges
    "dedup_substring" ->
      s"""WITH $tokCte,
         |win AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
         |          CAST(i AS BIGINT) AS pos,
         |          md5(array_to_string(list_slice(t, i + 1, i + 20), ' ')) AS h
         |        FROM tok, unnest(range(len(t) - 19)) AS u(i)
         |        WHERE len(t) >= 20),
         |duph AS (SELECT h FROM win GROUP BY h
         |         HAVING count(DISTINCT doc_id) >= 2),
         |cov AS (SELECT doc_id, n_tokens, pos, pos + o AS idx
         |        FROM win JOIN duph USING (h), unnest(range(20)) AS v(o))
         |SELECT doc_id, max(n_tokens) AS n_tokens,
         |  count(DISTINCT pos) AS n_dup_windows,
         |  count(DISTINCT idx) AS dup_tokens,
         |  CAST((count(DISTINCT idx) * 10000) // max(n_tokens) AS BIGINT)
         |    AS dup_token_frac_x10k
         |FROM cov GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // replays CorpusOps.stratifiedSample: first four md5 nibbles of the
    // id string via the strpos hex trick = Spark's conv(substring(...))
    // replays CorpusOps.weightedSample over the clamped quality score:
    // u = (first-8-md5-nibbles + 1) / 2^32, priority = w / u (division
    // of IEEE-identical doubles — no libm call in the selection path),
    // pr6 = floor(q * 1e6), top-25 by (pr6 DESC, doc_id)
    "sample_weighted" ->
      s"""WITH $qualityCte,
         |w AS (SELECT doc_id, greatest(quality_score, 0.0001::DOUBLE) AS w
         |      FROM qs),
         |h AS (SELECT doc_id, w, md5('s5' || CAST(doc_id AS VARCHAR)) AS m
         |      FROM w),
         |q AS (SELECT doc_id,
         |    w / ((CAST(${nibbleValue("m", 8)} AS BIGINT) + 1) / 4294967296.0)
         |      AS q
         |  FROM h)
         |SELECT doc_id, CAST(floor(q * 1e6) AS BIGINT) AS pr6
         |FROM q ORDER BY pr6 DESC, doc_id LIMIT 25""".stripMargin,

    "sample_stratified" ->
      """WITH h AS (SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS m
        |           FROM documents),
        |v AS (SELECT doc_id, lang,
        |  CAST((strpos('0123456789abcdef', substring(m, 1, 1)) - 1) * 4096 +
        |       (strpos('0123456789abcdef', substring(m, 2, 1)) - 1) * 256 +
        |       (strpos('0123456789abcdef', substring(m, 3, 1)) - 1) * 16 +
        |       (strpos('0123456789abcdef', substring(m, 4, 1)) - 1) AS BIGINT) AS h16
        |  FROM h)
        |SELECT doc_id, lang, h16 FROM v
        |WHERE h16 < (CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.25
        |             ELSE 0.1 END) * 65536
        |ORDER BY doc_id""".stripMargin,

    // replays the GROUPED reservoir as a per-lang window over the RAW
    // table: bottom-40 by (md5 priority, id) per language — the gate
    // built it write(evens) -> extend(odds) through the bounded
    // TopKStrAgg ranking, so a hash match proves that ranking exact
    // AND the per-group merge lemma end-to-end
    "sample_reservoir_groups" ->
      """WITH keyed AS (
        |  SELECT doc_id, lang, n_chars,
        |         md5('rsg:' || CAST(doc_id AS VARCHAR)) AS k
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, lang, n_chars,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY k, doc_id) AS rn
        |  FROM keyed
        |)
        |SELECT doc_id, lang, n_chars FROM r WHERE rn <= 40
        |ORDER BY doc_id""".stripMargin,

    // the string-id grouped reservoir: same per-lang window replay
    // with the corpus key projected to the string 'd' || lpad(id) —
    // priority md5('rsgs:' || sid), tiebreak the sid's string order
    // (the TopKStrIdAgg contract)
    "sample_reservoir_groups_str" ->
      """WITH base AS (
        |  SELECT 'd' || lpad(CAST(doc_id AS VARCHAR), 4, '0') AS sid,
        |         lang, n_chars
        |  FROM documents
        |), keyed AS (
        |  SELECT sid, lang, n_chars, md5('rsgs:' || sid) AS k FROM base
        |), r AS (
        |  SELECT sid, lang, n_chars,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY k, sid) AS rn
        |  FROM keyed
        |)
        |SELECT sid, lang, n_chars FROM r WHERE rn <= 40
        |ORDER BY sid""".stripMargin,

    // replays ReservoirStore's one priority definition over the RAW
    // table: hex md5('rs10:' || id) compared as a string, bottom-200
    // by (priority, id) — the gate built the sample write(evens) →
    // extend(odds), so a hash match proves the merge lemma
    // (bottomK(A ∪ B) = bottomK(bottomK(A) ∪ bottomK(B)))
    // end-to-end, payload included
    "sample_reservoir_store" ->
      """WITH keyed AS (
        |  SELECT doc_id, lang, n_chars,
        |         md5('rs10:' || CAST(doc_id AS VARCHAR)) AS k
        |  FROM documents
        |), pick AS (
        |  SELECT doc_id, lang, n_chars FROM keyed
        |  ORDER BY k, doc_id LIMIT 200
        |)
        |SELECT doc_id, lang, n_chars FROM pick ORDER BY doc_id""".stripMargin,

    // replays CorpusOps.packSequences (budget 2048); sum(BIGINT) is
    // HUGEINT in DuckDB → cast back for schema parity
    "pack_sequences" ->
      """WITH d AS (SELECT doc_id, lang,
        |    CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens FROM documents),
        |c AS (SELECT *, sum(est_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM d)
        |SELECT lang, CAST(floor((cum - est_tokens) / 2048.0) AS BIGINT) AS bin_id,
        |  count(*) AS n_docs, CAST(sum(est_tokens) AS BIGINT) AS bin_tokens
        |FROM c GROUP BY lang, bin_id ORDER BY lang, bin_id""".stripMargin,

    // replays TextOps.normalize over the decorated fixture with
    // DuckDB's OWN nfc_normalize (utf8proc) against Spark's JDK-based
    // kernel — the suffix is built from chr() codepoints so the
    // decomposed sequences are unambiguous in the SQL text; the
    // contract order is trim ∘ collapse-ws ∘ lower ∘ NFC
    "text_normalize" ->
      """WITH d AS (SELECT doc_id,
        |  text || '  CafE' || chr(769) || chr(9) || 'nai' || chr(776)
        |       || 've  A' || chr(778) || 'rhuS ' AS text
        |  FROM documents)
        |SELECT doc_id,
        |  trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'))
        |    AS norm_text,
        |  md5(trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g')))
        |    AS norm_fp
        |FROM d ORDER BY doc_id""".stripMargin,

    // replays CorpusOps.packShards: GLOBAL exclusive cumsum in doc_id
    // order, shard = integral division of exact longs — the two-phase
    // distributed scan must equal the one-window SQL definition
    "corpus_pack_shards" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens FROM documents),
        |c AS (SELECT doc_id, est_tokens,
        |    CAST(sum(est_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - est_tokens AS BIGINT) AS start_token FROM d)
        |SELECT doc_id, est_tokens, start_token,
        |  start_token // 2048 AS shard_id
        |FROM c ORDER BY doc_id""".stripMargin,

    // ── ANN family via exported trained artifacts ──────────────────
    // The k-means trainings are not SQL; their OUTPUT (codebooks,
    // centroids, assignment, codes — bounded deterministic tables,
    // exported by the gate queries via OracleArtifacts) is, and every
    // downstream step (encode argmin, cell probe, ADC LUT scoring,
    // ranking) replays here independently.

    // replays VectorOps.pqEncode against the exported codebooks: per
    // (vector, sub-space) argmin over squared distances with the
    // first-index tiebreak, digest + rmse exactly as the Spark side
    "embed_pq" ->
      s"""WITH $embCte,
         |cb AS (SELECT s, ci, c FROM read_parquet('${OracleArtifacts.pathFor("pq_codebooks")}/*.parquet')),
         |d AS (SELECT e.vec_id, cb.s, cb.ci,
         |        list_sum(list_transform(range(1, len(cb.c) + 1),
         |          i -> (cb.c[i] - e.v[cb.s * len(cb.c) + i]) * (cb.c[i] - e.v[cb.s * len(cb.c) + i]))) AS d2
         |      FROM e CROSS JOIN cb),
         |best AS (SELECT vec_id, s, ci, d2,
         |           row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, ci) AS arn
         |         FROM d),
         |codes AS (SELECT vec_id, s, ci, d2 FROM best WHERE arn = 1),
         |dims AS (SELECT len(v) AS dim FROM e LIMIT 1)
         |SELECT vec_id,
         |  md5(string_agg(ci::VARCHAR, '-' ORDER BY s)) AS codes_digest,
         |  round(sqrt(sum(d2) / (SELECT dim FROM dims)), 5) AS recon_rmse
         |FROM codes GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    // replays VectorOps.pqTopK: the encode above + per-query inner-product
    // LUTs + asymmetric-cosine scoring + ranking
    "embed_pq_topk" ->
      s"""WITH $embCte,
         |cb AS (SELECT s, ci, c FROM read_parquet('${OracleArtifacts.pathFor("pq_codebooks")}/*.parquet')),
         |d AS (SELECT e.vec_id, cb.s, cb.ci,
         |        list_sum(list_transform(range(1, len(cb.c) + 1),
         |          i -> (cb.c[i] - e.v[cb.s * len(cb.c) + i]) * (cb.c[i] - e.v[cb.s * len(cb.c) + i]))) AS d2
         |      FROM e CROSS JOIN cb),
         |best AS (SELECT vec_id, s, ci, d2,
         |           row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, ci) AS arn
         |         FROM d),
         |codes AS (SELECT vec_id, s, ci FROM best WHERE arn = 1),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN (0, 1, 2, 3, 4)),
         |iplut AS (SELECT q.qid, cb.s, cb.ci,
         |            list_sum(list_transform(range(1, len(cb.c) + 1),
         |              i -> cb.c[i] * q.qv[cb.s * len(cb.c) + i])) AS ip
         |          FROM q CROSS JOIN cb),
         |nlut AS (SELECT s, ci, list_sum(list_transform(c, x -> x * x)) AS n2 FROM cb),
         |qn AS (SELECT qid, sqrt(list_dot_product(qv, qv)) AS qnorm FROM q),
         |sc AS (SELECT i.qid, c2.vec_id, sum(i.ip) AS ipsum, sum(n.n2) AS rnorm2
         |       FROM codes c2
         |         JOIN iplut i ON i.s = c2.s AND i.ci = c2.ci
         |         JOIN nlut n ON n.s = c2.s AND n.ci = c2.ci
         |       WHERE c2.vec_id <> i.qid
         |       GROUP BY 1, 2),
         |ranked AS (SELECT sc.qid, sc.vec_id,
         |    round(sc.ipsum / greatest(qn.qnorm * sqrt(sc.rnorm2), 1e-12), 5) AS adc_cos
         |  FROM sc JOIN qn ON qn.qid = sc.qid),
         |rr AS (SELECT qid, vec_id, adc_cos,
         |         row_number() OVER (PARTITION BY qid ORDER BY adc_cos DESC, vec_id) AS rn
         |       FROM ranked)
         |SELECT qid, vec_id, adc_cos, rn FROM rr WHERE rn <= 10 ORDER BY qid, rn""".stripMargin,

    // replays VectorOps.ivfTopK from the exported trained state: probe
    // the nprobe nearest cells per query (cosine vs centroid, cell-id
    // tiebreak), exact cosine rank within probed cells only
    "embed_ivf_topk" ->
      s"""WITH $embCte,
         |cent AS (SELECT cell, c FROM read_parquet('${OracleArtifacts.pathFor("ivf_centroids")}/*.parquet')),
         |asg AS (SELECT vec_id, cell FROM read_parquet('${OracleArtifacts.pathFor("ivf_assign")}/*.parquet')),
         |meta AS (SELECT nprobe FROM read_parquet('${OracleArtifacts.pathFor("ivf_meta")}/*.parquet')),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN (0, 1, 2, 3, 4)),
         |pc AS (SELECT qid, cell FROM (
         |         SELECT q.qid, cent.cell,
         |           row_number() OVER (PARTITION BY q.qid ORDER BY
         |             list_dot_product(q.qv, cent.c) /
         |               greatest(sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(cent.c, cent.c)), 1e-12) DESC,
         |             cent.cell) AS crn
         |         FROM q CROSS JOIN cent)
         |       WHERE crn <= (SELECT nprobe FROM meta)),
         |scored AS (SELECT pc.qid, a.vec_id,
         |    round(list_dot_product(qe.qv, e.v) /
         |      (sqrt(list_dot_product(qe.qv, qe.qv)) * sqrt(list_dot_product(e.v, e.v))), 5) AS cos
         |  FROM pc JOIN asg a ON a.cell = pc.cell AND a.vec_id <> pc.qid
         |       JOIN e ON e.vec_id = a.vec_id
         |       JOIN q qe ON qe.qid = pc.qid),
         |rr AS (SELECT qid, vec_id, cos,
         |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
         |       FROM scored)
         |SELECT qid, vec_id, cos, rn FROM rr WHERE rn <= 10 ORDER BY qid, rn""".stripMargin,

    // replays VectorOps.ivfPqSearch from the exported index: driver-side
    // probe (cosine vs centroid with the 1e-12 floor), residual ADC LUTs
    // (iplut per query, per-cell reconstruction-norm LUT, qc = q·centroid),
    // scoring over the exported CODE table — the search scan itself
    "embed_ivf_pq_topk" -> ivfPqSearchSql,

    // the persisted-index search is spec-pinned identical to the
    // in-memory model (same seeds, same trained state — VectorIndexSpec),
    // so one replay serves both gates
    "embed_index_search" -> ivfPqSearchSql,

    // ADC candidates re-ranked by exact cosine — the refine stage
    "embed_ivf_pq_rerank" -> ivfPqRerankSql,

    // refine served from the persisted index's own vectors/ store —
    // value-identical search (spec-pinned), same replay
    "embed_index_rerank" -> ivfPqRerankSql,

    "embed_topk" ->
      s"""WITH $embCte,
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN (0, 1, 2, 3, 4)),
         |scored AS (SELECT qid, e.vec_id,
         |  round(list_dot_product(qv, v) /
         |    (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 5) AS cos
         |  FROM e JOIN q ON e.vec_id <> qid),
         |ranked AS (SELECT qid, vec_id, cos,
         |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
         |  FROM scored)
         |SELECT qid, vec_id, cos, rn FROM ranked WHERE rn <= 10 ORDER BY qid, rn""".stripMargin,

    // replays VectorOps.kmeans end-to-end: all three Lloyd rounds
    // (init by vec_id, bit-identical argmin, 6-dp re-pinned means,
    // carry-forward), final assignment with d2 rounded to 5
    "embed_kmeans" ->
      s"""WITH $embCte,
         |${kmeansCte(8, 3)}
         |SELECT vec_id, cell, round(d2, 5) AS d2 FROM af ORDER BY vec_id""".stripMargin,

    // replays VectorOps.clusterSampleAssigned over the same Lloyd
    // replay: per-cell rank by (hash32('cs1' || vec_id) ASC, vec_id)
    // — the WINDOW form; agreement proves the TopKAgg bounded-partial
    // ranking exact
    "embed_cluster_sample" ->
      s"""WITH $embCte,
         |${kmeansCte(8, 3)},
         |pri AS (SELECT vec_id, cell,
         |    md5('cs1' || CAST(vec_id AS VARCHAR)) AS m FROM af),
         |rk AS (SELECT vec_id, cell,
         |    row_number() OVER (PARTITION BY cell
         |      ORDER BY CAST(${nibbleValue("m", 8)} AS BIGINT), vec_id) AS rk
         |  FROM pri)
         |SELECT vec_id, cell, rk FROM rk WHERE rk <= 20 ORDER BY cell, rk""".stripMargin,

    // replays VectorOps.clusterDrift end-to-end: Lloyd trained on the
    // EVEN-vec_id half (the e CTE below shadows the full-corpus one),
    // both halves assigned under the trained centroids, then the exact
    // integer TV — sum casts guard DuckDB's HUGEINT promotion
    "embed_cluster_drift" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
         |  FROM embeddings WHERE vec_id % 2 = 0),
         |eb AS (SELECT vec_id, embedding::DOUBLE[] AS v
         |  FROM embeddings WHERE vec_id % 2 = 1),
         |${kmeansCte(8, 3)},
         |ab AS (SELECT vec_id, cell FROM (
         |    SELECT b.vec_id, p.cell,
         |      row_number() OVER (PARTITION BY b.vec_id
         |        ORDER BY list_dot_product(b.v, b.v)
         |          - 2 * list_dot_product(b.v, p.c)
         |          + list_dot_product(p.c, p.c), p.cell) AS rn
         |    FROM eb b CROSS JOIN c3 p) WHERE rn = 1),
         |ra AS (SELECT cell, count(*) AS ca FROM af GROUP BY 1),
         |rb AS (SELECT cell, count(*) AS cb FROM ab GROUP BY 1),
         |j AS (SELECT coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
         |  FROM ra FULL OUTER JOIN rb USING (cell)),
         |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
         |  CAST(sum(cb) AS BIGINT) AS nb FROM j),
         |s AS (SELECT CAST(sum(abs(ca * nb - cb * na)) AS BIGINT) AS sm
         |  FROM j CROSS JOIN t)
         |SELECT na AS n_ref, nb AS n_batch,
         |  CAST(sm * 1000000 // (2 * na * nb) AS BIGINT) AS tv_ppm
         |FROM s CROSS JOIN t""".stripMargin,

    // replays VectorOps.sq8TopK: the quantize() contract (per-vector
    // symmetric scale, floor rounding), then the asymmetric score
    // scale * list_dot_product(full-precision query, codes), ranked
    // (score desc, vec_id). Same double arithmetic both engines.
    "embed_sq8_topk" -> sq8TopkSql,

    // the persisted-store twin serves the IDENTICAL search (int8 bytes
    // + the ByteDot kernel ≡ the inline double-code fold, spec-pinned)
    // — same replay
    "embed_sq8_index" -> sq8TopkSql,

    // the ATTRIBUTE-FILTERED scan: the same SQ8 replay with the
    // candidate CTE restricted to label = 2 BEFORE ranking — the
    // filtered search must equal the brute-force top-k of the
    // filtered corpus, k filled
    "embed_filtered_topk" ->
      s"""WITH $embCte,
         |c AS (SELECT c0.vec_id, scale,
         |        list_transform(v, x -> floor(x / scale + 0.5)) AS codes
         |      FROM (SELECT vec_id, v,
         |              greatest(list_max(list_transform(v, x -> abs(x)))
         |                / 127.0, 1e-12) AS scale
         |            FROM e) c0
         |      JOIN embeddings l ON c0.vec_id = l.vec_id
         |      WHERE l.label = 2),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN (0, 1, 2, 3, 4)),
         |scored AS (SELECT qid, c.vec_id,
         |  round(scale * list_dot_product(qv, codes), 5) AS sq8_score
         |  FROM c JOIN q ON c.vec_id <> qid),
         |ranked AS (SELECT qid, vec_id, sq8_score,
         |  row_number() OVER (PARTITION BY qid ORDER BY sq8_score DESC, vec_id) AS rn
         |  FROM scored)
         |SELECT qid, vec_id, sq8_score, rn FROM ranked WHERE rn <= 10
         |ORDER BY qid, rn""".stripMargin,

    // replays VectorOps.knnClassify over the embed_topk neighbour CTEs:
    // label attach + majority vote, ties (votes desc, label asc)
    "embed_knn_classify" ->
      s"""WITH $embCte,
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN (0, 1, 2, 3, 4)),
         |scored AS (SELECT qid, e.vec_id,
         |  round(list_dot_product(qv, v) /
         |    (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 5) AS cos
         |  FROM e JOIN q ON e.vec_id <> qid),
         |ranked AS (SELECT qid, vec_id, cos,
         |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
         |  FROM scored),
         |votes AS (SELECT qid, l.label, count(*) AS votes
         |  FROM ranked JOIN embeddings l ON ranked.vec_id = l.vec_id
         |  WHERE rn <= 10 AND l.label IS NOT NULL GROUP BY 1, 2),
         |best AS (SELECT qid, label, votes,
         |  row_number() OVER (PARTITION BY qid ORDER BY votes DESC, label) AS vr
         |  FROM votes)
         |SELECT qid, label AS pred_label, CAST(votes AS BIGINT) AS votes
         |FROM best WHERE vr = 1 ORDER BY qid""".stripMargin,

    // replays VectorOps.centroidAudit: per-label centroid (components
    // rounded to 6 BEFORE the dot product — the cross-engine
    // reproducibility pin), member cosine rounded to 5, dispersion agg
    "embed_outliers" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
        |    FROM embeddings WHERE label IS NOT NULL),
        |dims AS (SELECT label, generate_subscripts(v, 1) AS pos, unnest(v) AS x
        |    FROM e),
        |cd AS (SELECT label, pos, round(avg(x), 6) AS cv
        |    FROM dims GROUP BY 1, 2),
        |cent AS (SELECT label, list(cv ORDER BY pos) AS c FROM cd GROUP BY 1),
        |cos AS (SELECT e.label,
        |    round(list_dot_product(v, c) /
        |      (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(c, c))), 5) AS cos
        |  FROM e JOIN cent USING (label))
        |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
        |  round(avg(cos), 4) AS mean_cos, min(cos) AS min_cos,
        |  CAST(sum(CASE WHEN cos < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
        |FROM cos GROUP BY label ORDER BY label""".stripMargin,

    // replays VectorOps.quantize: floor-based int8 codes (round() has
    // half-even/half-up splits across engines; floor(x+0.5) does not)
    "embed_quantize" ->
      s"""WITH $embCte,
         |s AS (SELECT vec_id, v,
         |        greatest(list_max(list_transform(v, x -> abs(x))) / 127.0,
         |                 1e-12) AS scale
         |      FROM e)
         |SELECT vec_id, round(scale, 6) AS q_scale,
         |  CAST(list_sum(list_transform(v, x -> floor(x / scale + 0.5)))
         |    AS BIGINT) AS code_sum,
         |  round(sqrt(list_sum(list_transform(v,
         |    x -> pow(x - floor(x / scale + 0.5) * scale, 2))) / len(v)), 5)
         |    AS rmse
         |FROM s ORDER BY vec_id""".stripMargin,

    // replays VectorOps.randomProject: the SAME seeded ±1 matrix
    // (VectorOps.projSigns — one definition, both engines) embedded as
    // literals, components summed left-to-right in i exactly as the
    // Spark expression folds
    "embed_project" -> {
      val signs = graft.operators.VectorOps.projSigns(64, 16)
      val comps = (0 until 16).map { j =>
        (0 until 64).map(i => s"v[${i + 1}] * ${signs(i)(j)}.0")
          .mkString("(", " + ", ") / sqrt(16.0::DOUBLE)")
      }.mkString("[", ",\n      ", "]")
      s"""WITH $embCte,
         |p AS (SELECT vec_id, $comps AS proj FROM e)
         |SELECT vec_id, round(list_sum(proj), 4) AS proj_sum,
         |  round(sqrt(list_sum(list_transform(proj, x -> x * x))), 4) AS proj_norm
         |FROM p ORDER BY vec_id""".stripMargin
    },

    "embed_lsh_buckets" ->
      s"""WITH $embCte
         |SELECT ${bucketExpr("e")} AS bucket, count(*) AS n
         |FROM e GROUP BY bucket ORDER BY bucket""".stripMargin,

    "multimodal_meta" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  sha256(text) AS sha256,
        |  'application/x-fake-' ||
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS mime
        |FROM documents ORDER BY media_id""".stripMargin,

    // replays MultimodalOps.patternChannel relationally: the Spark side
    // must reproduce these sums through a real PNG encode → decode
    // round-trip, the oracle never touches a pixel
    "multimodal_decode" ->
      """WITH px AS (SELECT doc_id AS media_id,
        |    CAST(xx.i AS BIGINT) AS x, CAST(yy.i AS BIGINT) AS y
        |  FROM documents, unnest(range(8)) AS xx(i), unnest(range(8)) AS yy(i))
        |SELECT media_id, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
        |  -- floored mod (((v%256)+256)%256), matching patternChannel's
        |  -- floorMod: SQL % truncates toward zero, which diverges on
        |  -- negative media_ids — both sides of the pixel contract must
        |  -- be total over all of BIGINT
        |  CAST(sum(((media_id * 31 + x * 7 + y * 13) % 256 + 256) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum(((media_id * 17 + x * 11 + y * 3) % 256 + 256) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum(((media_id * 29 + x * 5 + y * 19) % 256 + 256) % 256) AS BIGINT) AS sum_b
        |FROM px GROUP BY media_id ORDER BY media_id""".stripMargin,

    // both containers' decoded pixel sums from their closed forms:
    // even ids = the 8x8 PNG pattern, odd ids = the 16x16 JPEG whose
    // flat gray blocks make the lossy codec exact (jpegBlockGray
    // scaladoc) — 64 pixels per block at channel-0's linear form, all
    // three channels equal (gray). Container labels replay the
    // build parity; Spark detects them from magic bytes.
    "multimodal_jpeg" ->
      """WITH png AS (
        |  SELECT doc_id AS media_id,
        |    CAST(xx.i AS BIGINT) AS x, CAST(yy.i AS BIGINT) AS y
        |  FROM documents, unnest(range(8)) AS xx(i), unnest(range(8)) AS yy(i)
        |  WHERE doc_id % 2 = 0
        |), png_sums AS (
        |  SELECT media_id, 'png' AS container,
        |    CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
        |    CAST(sum(((media_id * 31 + x * 7 + y * 13) % 256 + 256) % 256) AS BIGINT) AS sum_r,
        |    CAST(sum(((media_id * 17 + x * 11 + y * 3) % 256 + 256) % 256) AS BIGINT) AS sum_g,
        |    CAST(sum(((media_id * 29 + x * 5 + y * 19) % 256 + 256) % 256) AS BIGINT) AS sum_b
        |  FROM png GROUP BY media_id
        |), jb AS (
        |  SELECT doc_id AS media_id,
        |    CAST(bxx.i AS BIGINT) AS bx, CAST(byy.i AS BIGINT) AS byy
        |  FROM documents, unnest(range(2)) AS bxx(i), unnest(range(2)) AS byy(i)
        |  WHERE doc_id % 2 = 1
        |), jpeg_sums AS (
        |  SELECT media_id, 'jpeg' AS container,
        |    CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
        |    CAST(sum(64 * (((media_id * 31 + bx * 7 + byy * 13) % 256 + 256) % 256)) AS BIGINT) AS sum_r,
        |    CAST(sum(64 * (((media_id * 31 + bx * 7 + byy * 13) % 256 + 256) % 256)) AS BIGINT) AS sum_g,
        |    CAST(sum(64 * (((media_id * 31 + bx * 7 + byy * 13) % 256 + 256) % 256)) AS BIGINT) AS sum_b
        |  FROM jb GROUP BY media_id
        |)
        |SELECT * FROM png_sums
        |UNION ALL SELECT * FROM jpeg_sums
        |ORDER BY media_id""".stripMargin,

    // replays imageDHash over originals + perturbed clones from the
    // pixel formula alone: brightness = r+g+b (exact ints), bit (y,x)
    // = gray(x,y) > gray(x+1,y) on the 8x8 raster (strips = single
    // pixels at gridW=7/gridH=8), packed little-endian into 56 bits.
    // Clone pixels are base pattern + the (0,0) red bump — closed form
    "multimodal_dhash" ->
      s"""WITH $dhashCte
         |SELECT media_id, dhash FROM dh ORDER BY media_id""".stripMargin,

    // all pairs with hamming <= 4 — equivalent to the Spark side's
    // banded join by pigeonhole (bands = maxHamming + 1 is exhaustive,
    // not approximate), cheap at oracle scale
    "multimodal_neardup" ->
      s"""WITH $dhashCte
         |SELECT x.media_id AS a, y.media_id AS b,
         |  CAST(bit_count(xor(x.dhash, y.dhash)) AS INT) AS hamming
         |FROM dh x JOIN dh y ON x.media_id < y.media_id
         |WHERE bit_count(xor(x.dhash, y.dhash)) <= 4
         |ORDER BY a, b""".stripMargin,

    // index-served classify over the persisted banded buckets is
    // value-identical to the direct all-pairs filter
    "multimodal_neardup_indexed" ->
      s"""WITH $dhashCte
         |SELECT x.media_id AS a, y.media_id AS b,
         |  CAST(bit_count(xor(x.dhash, y.dhash)) AS INT) AS hamming
         |FROM dh x JOIN dh y ON x.media_id < y.media_id
         |WHERE bit_count(xor(x.dhash, y.dhash)) <= 4
         |ORDER BY a, b""".stripMargin,

    "multimodal_frames" ->
      """WITH m AS (SELECT doc_id AS media_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS len
        |  FROM documents WHERE doc_id % 3 = 2)
        |SELECT media_id, CAST(i AS INT) AS frame_no,
        |  CAST(floor((i + 1) * len / 4.0) AS BIGINT)
        |    - CAST(floor(i * len / 4.0) AS BIGINT) AS frame_bytes
        |FROM m, unnest(range(4)) AS u(i)
        |ORDER BY media_id, frame_no""".stripMargin,

    // replays MultimodalOps.audioFeatures from the audioSample formula
    // alone (((id*31 + i*7919) % 65536) - 32768, nonneg ids so % is
    // floorMod): the Spark side must reproduce every window's energy /
    // zero-crossings / peak through a real WAV encode → RIFF container
    // → decode round trip; the oracle never touches a byte
    "multimodal_audio" ->
      """WITH ids AS (SELECT doc_id AS media_id FROM documents
        |             WHERE doc_id % 3 = 1),
        |s AS (SELECT media_id, CAST(i AS BIGINT) AS i,
        |        CAST(((media_id * 31 + i * 7919) % 65536) - 32768 AS INT) AS v
        |      FROM ids, unnest(range(256)) AS u(i)),
        |w AS (SELECT media_id, CAST(i // 64 AS INT) AS win_no, i, v,
        |        lag(v) OVER (PARTITION BY media_id, i // 64 ORDER BY i) AS pv
        |      FROM s)
        |SELECT media_id, win_no,
        |  CAST(sum(CAST(v AS BIGINT) * v) AS BIGINT) AS sum_sq,
        |  CAST(sum(CASE WHEN pv IS NOT NULL AND ((v >= 0) <> (pv >= 0))
        |           THEN 1 ELSE 0 END) AS BIGINT) AS zero_cross,
        |  CAST(max(abs(v)) AS INT) AS peak
        |FROM w GROUP BY media_id, win_no
        |ORDER BY media_id, win_no""".stripMargin,

    // replays MultimodalOps.audioFingerprint over originals + gain
    // clones from the waveform formula alone — the Spark side must
    // reproduce every contour bit through decode → scale → re-encode
    // → decode
    "multimodal_afp" ->
      s"""WITH $afpCte
         |SELECT media_id, afp FROM af ORDER BY media_id""".stripMargin,

    // all pairs with hamming <= 4 — equivalent to the banded join by
    // pigeonhole, cheap at oracle scale
    "multimodal_audio_neardup" ->
      s"""WITH $afpCte
         |SELECT x.media_id AS a, y.media_id AS b,
         |  CAST(bit_count(xor(x.afp, y.afp)) AS INT) AS hamming
         |FROM af x JOIN af y ON x.media_id < y.media_id
         |WHERE bit_count(xor(x.afp, y.afp)) <= 4
         |ORDER BY a, b""".stripMargin,

    // index-served audio classify — same value-identity argument
    "multimodal_audio_neardup_indexed" ->
      s"""WITH $afpCte
         |SELECT x.media_id AS a, y.media_id AS b,
         |  CAST(bit_count(xor(x.afp, y.afp)) AS INT) AS hamming
         |FROM af x JOIN af y ON x.media_id < y.media_id
         |WHERE bit_count(xor(x.afp, y.afp)) <= 4
         |ORDER BY a, b""".stripMargin,

    // replays MultimodalOps.frameDHashes from the videoChannel formula
    // alone — the Spark side demuxes the container and decodes every
    // frame; the oracle never touches a byte
    "multimodal_video_dhash" ->
      s"""WITH $videoDhashCte
         |SELECT media_id, frame_no, dhash FROM vdh
         |ORDER BY media_id, frame_no""".stripMargin,

    // adjacent-frame hamming >= 10 flags exactly the planted hard cut
    // (in-scene jitter moves <= 4 bits)
    "multimodal_scene_changes" ->
      s"""WITH $videoDhashCte,
         |lg AS (SELECT media_id, frame_no, dhash,
         |         lag(dhash) OVER (PARTITION BY media_id
         |           ORDER BY frame_no) AS prev
         |       FROM vdh)
         |SELECT media_id, frame_no AS cut_frame,
         |  CAST(bit_count(xor(dhash, prev)) AS INT) AS hamming
         |FROM lg
         |WHERE prev IS NOT NULL AND bit_count(xor(dhash, prev)) >= 10
         |ORDER BY media_id, cut_frame""".stripMargin,

    // replays CorpusOps.chunkDocuments (64-token windows, stride 48)
    "corpus_chunks" ->
      s"""WITH $tokCte,
         |ch AS (SELECT doc_id, CAST(i AS INT) AS chunk_no,
         |         array_to_string(list_slice(t, i * 48 + 1, i * 48 + 64), ' ')
         |           AS chunk
         |       FROM tok, unnest(range(greatest(0,
         |         CAST(ceil((len(t) - 64) / 48.0) AS BIGINT)) + 1)) AS u(i))
         |SELECT doc_id, chunk_no,
         |  CAST(len(string_split(chunk, ' ')) AS BIGINT) AS n_chunk_tokens,
         |  md5(chunk) AS chunk_fp
         |FROM ch ORDER BY doc_id, chunk_no""".stripMargin,

    // semantic dedup: the embed_neardup_pairs candidate graph closed by
    // recursive CTE (= the star-contraction fixpoint)
    "dedup_semantic_clusters" ->
      s"""WITH RECURSIVE $embCte,
         |eb AS (SELECT e.*, count(*) OVER (PARTITION BY ${bucketExpr("e")}) AS bn
         |       FROM e),
         |cp AS (SELECT x.vec_id AS a, y.vec_id AS b
         |       FROM eb x JOIN eb y
         |         ON ${bucketExpr("x")} = ${bucketExpr("y")} AND x.vec_id < y.vec_id
         |       WHERE x.bn <= 4096 AND y.bn <= 4096
         |         AND round($cosExpr, 4) >= 0.4),
         |edges AS (SELECT a AS src, b AS dst FROM cp UNION SELECT b, a FROM cp),
         |reach(id, r) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e2.src, rr.r FROM edges e2 JOIN reach rr ON e2.dst = rr.id)
         |SELECT id AS vec_id, min(r) AS cluster_id FROM reach GROUP BY id
         |ORDER BY vec_id""".stripMargin,

    // eligible-bucket CTE replays VectorOps.nearDupPairs' hot-bucket cap
    // (default maxBucketRows = 4096): buckets above the cap contribute
    // no pairs. The test corpus never nears it, but the oracle must
    // mirror the operator's DEFAULT semantics, not a lucky subset.
    "embed_neardup_pairs" ->
      s"""WITH $embCte,
         |eb AS (SELECT e.*, count(*) OVER (PARTITION BY ${bucketExpr("e")}) AS bn
         |       FROM e)
         |SELECT x.vec_id AS a, y.vec_id AS b, round($cosExpr, 4) AS cos
         |FROM eb x JOIN eb y
         |  ON ${bucketExpr("x")} = ${bucketExpr("y")} AND x.vec_id < y.vec_id
         |WHERE x.bn <= 4096 AND y.bn <= 4096
         |  AND round($cosExpr, 4) >= 0.4
         |ORDER BY a, b""".stripMargin,

    // replays LayoutOps.zorderLayout over events (user_id, epoch-us
    // time; bits = 8, cellBits = 8): exact integer grid coordinates
    // then the bit-interleaved Morton key — all BIGINT arithmetic, so
    // the hash check covers every row's file-cell assignment
    "layout_zorder" ->
      s"""WITH $zLayoutCtes
         |SELECT event_id, zb_user_id, zb_tsm, zkey, zkey >> 8 AS zcell
         |FROM zk ORDER BY event_id""".stripMargin,

    // replays LayoutOps.hilbertLayout: the same grid bucketing as the
    // z-order CTEs, then the Hilbert xy2d loop as a RECURSIVE CTE —
    // one iteration per level s = 128..1, carrying (x, y, d): the
    // quadrant accumulate d += s²·(3·rx XOR ry) off the CURRENT x/y,
    // then the rotate/flip producing the next level's coordinates.
    // Rows finish at s = 0; the hash pins the custom Expression's
    // codegen kernel symbol-for-symbol
    "layout_hilbert" ->
      s"""WITH RECURSIVE $zLayoutCtes,
         |hr(event_id, x, y, d, s) AS (
         |  SELECT event_id, zb_user_id, zb_tsm,
         |         CAST(0 AS BIGINT), CAST(128 AS BIGINT) FROM zk
         |  UNION ALL
         |  SELECT event_id,
         |    CASE WHEN (y & s) = 0 THEN
         |      CASE WHEN (x & s) > 0 THEN s - 1 - y ELSE y END
         |    ELSE x END,
         |    CASE WHEN (y & s) = 0 THEN
         |      CASE WHEN (x & s) > 0 THEN s - 1 - x ELSE x END
         |    ELSE y END,
         |    d + s * s * xor(
         |      CASE WHEN (x & s) > 0 THEN CAST(3 AS BIGINT)
         |           ELSE CAST(0 AS BIGINT) END,
         |      CASE WHEN (y & s) > 0 THEN CAST(1 AS BIGINT)
         |           ELSE CAST(0 AS BIGINT) END),
         |    s // 2
         |  FROM hr WHERE s > 0
         |),
         |hk AS (SELECT event_id, d AS hkey FROM hr WHERE s = 0)
         |SELECT zk.event_id, zb_user_id, zb_tsm, hkey,
         |       hkey >> 8 AS hcell
         |FROM zk JOIN hk USING (event_id) ORDER BY event_id""".stripMargin,

    // the n-D (Butz/Skilling) curve at n = 3, bits = 4 — the unrolled
    // relational replay (see hilbert3dSql's scaladoc)
    "layout_hilbert_3d" -> s"WITH $hilbert3dSql",

    // the persisted hilbert layout's box read — full lifecycle
    // (write + append under frozen bounds, clamp-mode enumeration,
    // partition pruning) must equal the same plain full-scan filter
    "layout_store_hilbert" ->
      """SELECT event_id, user_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS tsm
        |FROM events
        |WHERE user_id BETWEEN 30 AND 59
        |  AND epoch_us(CAST(ts AS TIMESTAMP))
        |      BETWEEN 1704672000000000 AND 1705276799999999
        |ORDER BY event_id""".stripMargin,

    // the 3-D store twin: the same plain full-scan soundness oracle
    // with the third (event_id mod 1000) dimension's predicate
    "layout_store_hilbert_3d" ->
      """SELECT event_id, user_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS tsm,
        |  event_id % 1000 AS evk
        |FROM events
        |WHERE user_id BETWEEN 30 AND 59
        |  AND epoch_us(CAST(ts AS TIMESTAMP))
        |      BETWEEN 1704672000000000 AND 1705276799999999
        |  AND event_id % 1000 BETWEEN 100 AND 700
        |ORDER BY event_id""".stripMargin,

    // the hilbert-pruned box read must equal the plain full-scan
    // filter — the soundness contract of the physical layout (same
    // posture as layout_indexed_box; the pruning is plan-side only)
    "layout_hilbert_box" ->
      """SELECT event_id, user_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS tsm
        |FROM events
        |WHERE user_id BETWEEN 30 AND 59
        |  AND epoch_us(CAST(ts AS TIMESTAMP))
        |      BETWEEN 1704672000000000 AND 1705276799999999
        |ORDER BY event_id""".stripMargin,

    // replays ExtQueries.layoutSkipping: per-cell occupancy +
    // per-dimension min/max over the same z-grid, and the min/max
    // pruning decision for the fixed query box (user 30-59 ×
    // 2024-01-08..15)
    "layout_skipping" ->
      s"""WITH $zLayoutCtes
         |SELECT zkey >> 8 AS zcell, count(*) AS cnt,
         |  min(user_id) AS min_user_id, max(user_id) AS max_user_id,
         |  min(tsm) AS min_tsm, max(tsm) AS max_tsm,
         |  CAST((min(user_id) <= 59 AND max(user_id) >= 30 AND
         |        min(tsm) <= 1705276799999999 AND
         |        max(tsm) >= 1704672000000000) AS INT) AS hit
         |FROM zk GROUP BY 1 ORDER BY zcell""".stripMargin,

    // replays QualityClassifier.score from the exported weights table
    // ALONE: token → first-3-md5-nibble bucket → L1-normalized counts
    // → broadcast-weight dot product → margin/σ/label. Training stays
    // driver-side (deterministic GD) — the artifact IS the contract,
    // exactly the PQ-codebook oracle posture.
    "text_quality_classifier" ->
      s"""WITH w AS (SELECT bucket, weight FROM
         |       read_parquet('${OracleArtifacts.pathFor("qc_weights")}/*.parquet')),
         |tok AS (SELECT doc_id,
         |        CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
         |        unnest(string_split(text, ' ')) AS t FROM documents),
         |ft AS (SELECT doc_id, n,
         |       ${nibbleValue("md5(t)", qcNibbles)} AS bucket
         |       FROM tok),
         |fx AS (SELECT doc_id, bucket, count(*) / any_value(n) AS x
         |       FROM ft GROUP BY doc_id, bucket
         |       UNION ALL
         |       SELECT doc_id, $qcDim AS bucket,
         |         ln(len(string_split(text, ' '))) / 5 AS x FROM documents
         |       UNION ALL
         |       SELECT doc_id, ${qcDim + 1} AS bucket,
         |         len(list_distinct(string_split(text, ' '))) /
         |           CAST(len(string_split(text, ' ')) AS DOUBLE) AS x
         |       FROM documents
         |       UNION ALL
         |       SELECT doc_id, ${qcDim + 2} AS bucket,
         |         CASE WHEN length(text) = 0 THEN 0.0 ELSE
         |           length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) /
         |             CAST(length(text) AS DOUBLE) END AS x
         |       FROM documents),
         |z AS (SELECT fx.doc_id,
         |        sum(fx.x * w.weight) +
         |        (SELECT weight FROM w WHERE bucket = -1) AS zz
         |      FROM fx JOIN w ON fx.bucket = w.bucket
         |      GROUP BY fx.doc_id)
         |SELECT doc_id, round(zz, 4) AS margin,
         |  round(1.0 / (1.0 + exp(-zz)), 4) AS prob,
         |  CAST(round(zz, 4) >= 0 AS INT) AS pred
         |FROM z ORDER BY doc_id""".stripMargin,

    // replays LayoutStore.driftStats over the drift fixture: frozen
    // bounds = min/max of the PRE-cutoff subset, stored rows = the
    // whole table (the post-cutoff rows were appended under those
    // bounds), per-dimension out-of-bounds counts with the fixed-point
    // share — all exact integer arithmetic, nothing layout-internal
    "layout_drift" ->
      """WITH dims AS (SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS tsm FROM events),
        |b AS (SELECT min(user_id) AS min_u, max(user_id) AS max_u,
        |        min(tsm) AS min_t, max(tsm) AS max_t
        |      FROM dims WHERE tsm < 1705795200000000),
        |per AS (
        |  SELECT 'tsm' AS dim,
        |    CAST(d.tsm < b.min_t AS BIGINT) AS below,
        |    CAST(d.tsm > b.max_t AS BIGINT) AS above
        |  FROM dims d, b
        |  UNION ALL
        |  SELECT 'user_id' AS dim,
        |    CAST(d.user_id < b.min_u AS BIGINT),
        |    CAST(d.user_id > b.max_u AS BIGINT)
        |  FROM dims d, b)
        |SELECT dim, count(*) AS total_rows,
        |  CAST(sum(below) AS BIGINT) AS below_min,
        |  CAST(sum(above) AS BIGINT) AS above_max,
        |  CAST((CAST(sum(below) + sum(above) AS HUGEINT) * 1000000)
        |       // count(*) AS BIGINT) AS clamp_ppm
        |FROM per GROUP BY dim ORDER BY dim""".stripMargin,

    // the indexed box read must equal a plain full-scan filter — the
    // layout store's soundness contract, checked against SQL that
    // knows nothing about the layout
    "layout_indexed_box" ->
      """SELECT event_id, user_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS tsm
        |FROM events
        |WHERE user_id BETWEEN 30 AND 59
        |  AND epoch_us(CAST(ts AS TIMESTAMP))
        |      BETWEEN 1704672000000000 AND 1705276799999999
        |ORDER BY event_id""".stripMargin,

    // the co-located join served from the bucketed store must equal
    // the plain SQL join over the raw tables — the layout changes the
    // plan (zero exchanges, plan-pinned in BucketStoreSpec), never
    // the answer
    "join_bucketed" ->
      """SELECT o_orderpriority, count(*) AS line_count,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    * 10000 AS BIGINT) AS revenue_x10k
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // bucket-pruned point lookups ≡ the same IN-list over the raw
    // table (the pruned read's soundness contract)
    "bucket_pruned_lookup" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
        |FROM orders WHERE o_orderkey IN (7, 411, 1234)
        |ORDER BY o_orderkey""".stripMargin,

    // replays HistoryOps.scd2(events≠purchase, user_id, ts,
    // [event_type], tie=event_id): change-collapse via lag, version /
    // valid_to over the same (valid_from, event_id) order — every
    // interval bound is a raw timestamp, every version a row_number,
    // so the hash check carries no float anywhere
    "scd2_history" -> scd2HistorySql,

    // the store-served dimension (incremental write+extend over the
    // ts-cutoff split, closures + frontier folded back at read)
    // shares the direct gate's oracle VERBATIM: the hash check IS the
    // proof that the append-only storage reconstruction equals the
    // one-shot construction
    "scd2_store_history" -> scd2HistorySql,

    // right-to-be-forgotten THROUGH the store: purge(user_id % 7 = 3)
    // then compact — the served frame must equal the direct build
    // over a world where those keys never existed; the oracle is the
    // scd2 replay with exactly that restriction
    "scd2_purge_history" -> scd2PurgeHistorySql,

    // the store-served materialized rollup must equal the one-shot
    // GROUP BY over the raw fact table: decimal(38,4) measures are
    // exact fixed-point, so the incremental write+extend merge is
    // provable measure-for-measure
    "agg_store_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |       date_trunc('month', l_shipdate) AS ship_month,
        |       count(*) AS cnt,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4)))
        |            * 10000 AS BIGINT) AS sum_x10k,
        |       CAST(min(CAST(l_extendedprice AS DECIMAL(38,4)))
        |            * 10000 AS BIGINT) AS min_x10k,
        |       CAST(max(CAST(l_extendedprice AS DECIMAL(38,4)))
        |            * 10000 AS BIGINT) AS max_x10k
        |FROM lineitem
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // the coarser grain re-aggregated from stored partials must equal
    // the same GROUP BY over raw facts — the mergeable-measure (MV
    // rewrite) contract
    "agg_store_coarse" ->
      """SELECT l_returnflag, count(*) AS cnt,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4)))
        |            * 10000 AS BIGINT) AS sum_x10k,
        |       CAST(min(CAST(l_extendedprice AS DECIMAL(38,4)))
        |            * 10000 AS BIGINT) AS min_x10k,
        |       CAST(max(CAST(l_extendedprice AS DECIMAL(38,4)))
        |            * 10000 AS BIGINT) AS max_x10k
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // replays HistogramStore's binning symbol-for-symbol (escape bins
    // -2/-1/60 routed BEFORE the division — DuckDB // floors where
    // Spark DIV truncates, so negatives never reach either), then the
    // integer quantile ranks: ceil(q·n) over the finite bins as exact
    // rational arithmetic, first bin whose cumulative count reaches
    // the target. Every output column cast BIGINT (sum() is HUGEINT).
    "hist_store_quantiles" ->
      """WITH b AS (
        |  SELECT CASE WHEN n_chars IS NULL THEN -2
        |              WHEN n_chars < 0 THEN -1
        |              WHEN n_chars >= 600 THEN 60
        |              ELSE n_chars * 60 // 600 END AS bin
        |  FROM documents
        |), binned AS (
        |  SELECT bin, count(*) AS cnt FROM b WHERE bin <> -2 GROUP BY 1
        |), cum AS (
        |  SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum_cnt,
        |         (SELECT sum(cnt) FROM binned) AS n
        |  FROM binned
        |), qs(q_num, q_den) AS (
        |  VALUES (1, 4), (1, 2), (3, 4), (9, 10), (99, 100)
        |)
        |SELECT CAST(q_num * 1000000 // q_den AS BIGINT) AS q_ppm,
        |       CAST(min(bin) AS BIGINT) AS bin,
        |       CAST(CASE WHEN min(bin) BETWEEN 0 AND 59
        |            THEN min(bin) * 600 // 60 END AS BIGINT) AS bin_lo,
        |       CAST(CASE WHEN min(bin) BETWEEN 0 AND 59
        |            THEN (min(bin) + 1) * 600 // 60 END AS BIGINT) AS bin_hi
        |FROM qs JOIN cum
        |  ON cum.cum_cnt >= greatest(1, (q_num * n + q_den - 1) // q_den)
        |GROUP BY q_num, q_den
        |ORDER BY q_ppm""".stripMargin,

    // replays the REBINNED histogram from the RAW table at the coarse
    // geometry: the gate built it from the 60-bin table alone, so a
    // hash match proves bin12(v) = bin60(v) DIV 5 value-for-value.
    // sum() is HUGEINT -> cast BIGINT; the null bin's measures stay
    // NULL (sum/min/max over an all-null group)
    "hist_store_rebin" ->
      """WITH b AS (
        |  SELECT CASE WHEN n_chars IS NULL THEN -2
        |              WHEN n_chars < 0 THEN -1
        |              WHEN n_chars >= 600 THEN 12
        |              ELSE n_chars * 12 // 600 END AS bin,
        |         n_chars
        |  FROM documents
        |)
        |SELECT CAST(bin AS BIGINT) AS bin,
        |       CAST(CASE WHEN bin BETWEEN 0 AND 11
        |            THEN bin * 600 // 12 END AS BIGINT) AS bin_lo,
        |       CAST(CASE WHEN bin BETWEEN 0 AND 11
        |            THEN (bin + 1) * 600 // 12 END AS BIGINT) AS bin_hi,
        |       CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_v,
        |       CAST(min(n_chars) AS BIGINT) AS min_v,
        |       CAST(max(n_chars) AS BIGINT) AS max_v
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,

    // replays HistogramStore.drift's exact integer total-variation:
    // same binning, full-outer zero-filled join of the two
    // distributions, Σ|ca·nb − cb·na|·10⁶ // (2·na·nb) in HUGEINT
    // (Spark computes the identical rational in DECIMAL(38,0)) —
    // every output column cast BIGINT
    "hist_store_drift" ->
      """WITH base AS (
        |  SELECT CASE WHEN n_chars IS NULL THEN -2
        |              WHEN n_chars < 0 THEN -1
        |              WHEN n_chars >= 600 THEN 60
        |              ELSE n_chars * 60 // 600 END AS bin, lang
        |  FROM documents
        |), a AS (
        |  SELECT bin, count(*) AS ca FROM base WHERE lang = 'en' GROUP BY 1
        |), bb AS (
        |  SELECT bin, count(*) AS cb FROM base WHERE lang <> 'en' GROUP BY 1
        |), j AS (
        |  SELECT COALESCE(a.bin, bb.bin) AS bin,
        |         COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
        |  FROM a FULL OUTER JOIN bb ON a.bin = bb.bin
        |), t AS (
        |  SELECT CAST(sum(ca) AS HUGEINT) AS na,
        |         CAST(sum(cb) AS HUGEINT) AS nb FROM j
        |)
        |SELECT CAST(t.na AS BIGINT) AS n_a, CAST(t.nb AS BIGINT) AS n_b,
        |       CAST(sum(abs(CAST(ca AS HUGEINT) * t.nb
        |                    - CAST(cb AS HUGEINT) * t.na)) * 1000000
        |            // (2 * t.na * t.nb) AS BIGINT) AS tv_ppm
        |FROM j, t GROUP BY t.na, t.nb""".stripMargin,

    // the monitoring face of hist_store_drift: same binning, same
    // exact-integer TV, reference side = en store, current side = the
    // RAW non-en batch — output under (n_ref, n_batch, tv_ppm)
    "hist_batch_drift" ->
      """WITH base AS (
        |  SELECT CASE WHEN n_chars IS NULL THEN -2
        |              WHEN n_chars < 0 THEN -1
        |              WHEN n_chars >= 600 THEN 60
        |              ELSE n_chars * 60 // 600 END AS bin, lang
        |  FROM documents
        |), a AS (
        |  SELECT bin, count(*) AS ca FROM base WHERE lang = 'en' GROUP BY 1
        |), bb AS (
        |  SELECT bin, count(*) AS cb FROM base WHERE lang <> 'en' GROUP BY 1
        |), j AS (
        |  SELECT COALESCE(a.bin, bb.bin) AS bin,
        |         COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
        |  FROM a FULL OUTER JOIN bb ON a.bin = bb.bin
        |), t AS (
        |  SELECT CAST(sum(ca) AS HUGEINT) AS na,
        |         CAST(sum(cb) AS HUGEINT) AS nb FROM j
        |)
        |SELECT CAST(t.na AS BIGINT) AS n_ref, CAST(t.nb AS BIGINT) AS n_batch,
        |       CAST(sum(abs(CAST(ca AS HUGEINT) * t.nb
        |                    - CAST(cb AS HUGEINT) * t.na)) * 1000000
        |            // (2 * t.na * t.nb) AS BIGINT) AS tv_ppm
        |FROM j, t GROUP BY t.na, t.nb""".stripMargin,

    // replays HistogramStore.resampleToMatch end to end: the binning,
    // the exact-integer per-bin keep weights min(1, refShare/curShare)
    // in ppm, and the md5-uniform threshold h·10⁶ < w_ppm·2³² — all
    // HUGEINT intermediates (Spark uses DECIMAL(38,0)), BIGINT out.
    // n_r is DELIBERATELY the reference mass over the bins the
    // current corpus occupies (the matchWeights left join), not the
    // reference grand total — the renormalised-to-achievable-support
    // contract the operator's scaladoc states; this replay shares the
    // semantics, it does not merely mirror the arithmetic
    "hist_match_resample" ->
      s"""WITH base AS (
        |  SELECT doc_id, lang,
        |         CASE WHEN n_chars IS NULL THEN -2
        |              WHEN n_chars < 0 THEN -1
        |              WHEN n_chars >= 600 THEN 60
        |              ELSE n_chars * 60 // 600 END AS bin
        |  FROM documents
        |), r AS (
        |  SELECT bin, count(*) AS cr FROM base WHERE lang = 'en' GROUP BY 1
        |), c AS (
        |  SELECT bin, count(*) AS cc FROM base WHERE lang <> 'en' GROUP BY 1
        |), j AS (
        |  SELECT c.bin, cc, COALESCE(cr, 0) AS cr
        |  FROM c LEFT JOIN r ON c.bin = r.bin
        |), t AS (
        |  SELECT CAST(sum(cc) AS HUGEINT) AS nc,
        |         CAST(sum(cr) AS HUGEINT) AS nr FROM j
        |), w AS (
        |  SELECT bin,
        |         least(1000000, CAST(cr AS HUGEINT) * t.nc * 1000000
        |           // greatest(CAST(cc AS HUGEINT) * t.nr, 1)) AS w_ppm
        |  FROM j, t
        |), h AS (
        |  SELECT b.doc_id, w.w_ppm,
        |         md5('hm9' || CAST(b.doc_id AS VARCHAR)) AS m
        |  FROM base b LEFT JOIN w ON b.bin = w.bin
        |  WHERE b.lang <> 'en'
        |)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id FROM h
        |WHERE w_ppm IS NULL
        |   OR CAST(${nibbleValue("m", 8)} AS BIGINT) * 1000000
        |      < w_ppm * 4294967296
        |ORDER BY doc_id""".stripMargin,

    // replays GraphOps.triangleCounts under the SAME degree
    // orientation (direct each edge toward the larger (degree, id);
    // wedges ordered the same way; close with the oriented third
    // edge) over the co-purchase part graph — every triangle found
    // once, pure integers end to end
    "graph_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
        |            FROM lineitem),
        |e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |      FROM li a JOIN li b USING (l_orderkey)
        |      WHERE a.l_partkey < b.l_partkey),
        |deg AS (SELECT node, count(*) AS degree FROM
        |        (SELECT u AS node FROM e
        |         UNION ALL SELECT v FROM e) GROUP BY 1),
        |o AS (SELECT CASE WHEN lt THEN u ELSE v END AS src,
        |             CASE WHEN lt THEN v ELSE u END AS dst,
        |             CASE WHEN lt THEN dv ELSE du END AS ddst
        |      FROM (SELECT e.u, e.v, du.degree AS du, dv.degree AS dv,
        |              (du.degree < dv.degree OR
        |               (du.degree = dv.degree AND e.u < e.v)) AS lt
        |            FROM e JOIN deg du ON e.u = du.node
        |                   JOIN deg dv ON e.v = dv.node)),
        |tri AS (SELECT o1.src, o1.dst AS b, o2.dst AS c
        |        FROM o o1 JOIN o o2 ON o1.src = o2.src
        |        JOIN o o3 ON o3.src = o1.dst AND o3.dst = o2.dst
        |        WHERE o1.ddst < o2.ddst OR
        |              (o1.ddst = o2.ddst AND o1.dst < o2.dst)),
        |pn AS (SELECT node, count(*) AS triangles FROM
        |       (SELECT src AS node FROM tri
        |        UNION ALL SELECT b FROM tri
        |        UNION ALL SELECT c FROM tri) GROUP BY 1),
        |tot AS (SELECT count(*) AS total_triangles FROM tri)
        |SELECT d.node AS part, d.degree,
        |       COALESCE(pn.triangles, 0) AS triangles,
        |       tot.total_triangles
        |FROM deg d LEFT JOIN pn ON d.node = pn.node CROSS JOIN tot
        |ORDER BY triangles DESC, part LIMIT 20""".stripMargin,

    // the point-in-time lookup: each purchase left-joins the single
    // dimension version whose half-open interval contains its ts
    "scd2_pit_join" ->
      """WITH ev AS (
        |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
        |         event_type FROM events),
        |ordered AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         lag(event_type) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM ev WHERE event_type <> 'purchase'),
        |starts AS (
        |  SELECT user_id, event_id, event_type, ts AS valid_from
        |  FROM ordered WHERE prev IS NULL OR prev <> event_type),
        |dim AS (
        |  SELECT user_id,
        |         CAST(row_number() OVER w AS INT) AS version,
        |         event_type AS state_type, valid_from,
        |         lead(valid_from) OVER w AS valid_to
        |  FROM starts
        |  WINDOW w AS (PARTITION BY user_id
        |               ORDER BY valid_from, event_id))
        |SELECT p.event_id, p.user_id, p.ts,
        |       d.version, d.state_type, d.valid_from
        |FROM (SELECT event_id, user_id, ts FROM ev
        |      WHERE event_type = 'purchase') p
        |LEFT JOIN dim d
        |  ON p.user_id = d.user_id AND d.valid_from <= p.ts
        |     AND (d.valid_to IS NULL OR p.ts < d.valid_to)
        |ORDER BY p.event_id""".stripMargin,

    // replays ProfileOps.keyProfile(lineitem, l_suppkey, 20): exact
    // per-key counts, top-20 by (count desc, key asc), share/skew/salt
    // arithmetic against the one-row summary. Ratios are FIXED-POINT
    // longs — `(num * 10^n) // den` over exact HUGEINT integers (the
    // Spark side uses DECIMAL(38,0) `div`) — because two engines
    // rounding the same binary double can disagree by an ulp at a .5
    // boundary, while integral division of exact integers cannot.
    "skew_profile" ->
      """WITH c AS (SELECT l_suppkey, count(*) AS cnt
        |           FROM lineitem GROUP BY 1),
        |s AS (SELECT sum(cnt) AS total, count(*) AS keys FROM c),
        |t AS (SELECT l_suppkey, cnt FROM c
        |      ORDER BY cnt DESC, l_suppkey LIMIT 20)
        |SELECT row_number() OVER (ORDER BY cnt DESC, l_suppkey) AS rank,
        |  l_suppkey, cnt,
        |  CAST((CAST(cnt AS HUGEINT) * 1000000) // total AS BIGINT)
        |    AS share_ppm,
        |  CAST((CAST(cnt AS HUGEINT) * keys * 10000) // total AS BIGINT)
        |    AS skew_x10k,
        |  CAST((CAST(cnt AS HUGEINT) * keys + total - 1) // total AS BIGINT)
        |    AS salt_factor
        |FROM t CROSS JOIN s ORDER BY rank""".stripMargin,

    // replays ProfileOps.keySummary(events, user_id): one-row
    // distribution summary incl. the top-10 concentration share.
    // Same fixed-point protocol as skew_profile.
    "skew_summary" ->
      """WITH c AS (SELECT user_id, count(*) AS cnt
        |           FROM events GROUP BY 1),
        |t10 AS (SELECT sum(cnt) AS top10 FROM
        |        (SELECT cnt FROM c ORDER BY cnt DESC, user_id LIMIT 10)),
        |s AS (SELECT sum(cnt) AS total_rows, count(*) AS distinct_keys,
        |             max(cnt) AS max_cnt, min(cnt) AS min_cnt FROM c)
        |SELECT CAST(total_rows AS BIGINT) AS total_rows,
        |  distinct_keys, max_cnt, min_cnt,
        |  CAST((CAST(total_rows AS HUGEINT) * 10000) // distinct_keys
        |    AS BIGINT) AS avg_cnt_x10k,
        |  CAST((CAST(max_cnt AS HUGEINT) * distinct_keys * 10000)
        |    // total_rows AS BIGINT) AS skew_factor_x10k,
        |  CAST((CAST(top10 AS HUGEINT) * 1000000) // total_rows AS BIGINT)
        |    AS top10_share_ppm
        |FROM s CROSS JOIN t10""".stripMargin,

    // replays ExtQueries.sketchKmvDistinct END-TO-END — including the
    // ESTIMATOR, not just an exact audit side: the KMV sketch is a
    // deterministic function of the input set given the hash (k
    // lexicographically-smallest md5 strings; both engines
    // binary-collate ASCII hex identically), and the estimate is exact
    // integer arithmetic ((k−1)·2^60 // v60(kth), fixed-point
    // protocol), so the whole row hash-checks — the first sketch gate
    // whose estimate itself is oracle-replayed.
    "sketch_kmv_distinct" ->
      s"""WITH tw AS (SELECT source, string_split(text, ' ') AS t
         |            FROM documents),
         |sh AS (SELECT source, t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS w
         |       FROM tw, unnest(range(len(t) - 2)) AS u(i)),
         |dt AS (SELECT DISTINCT source, w FROM sh),
         |h AS (SELECT DISTINCT source, md5(w) AS h FROM dt),
         |r AS (SELECT source, h,
         |        row_number() OVER (PARTITION BY source ORDER BY h) AS rn
         |      FROM h),
         |sk AS (SELECT source, h, rn FROM r WHERE rn <= 64),
         |s AS (SELECT source, count(*) AS n_kept,
         |        max(CASE WHEN rn = 64 THEN h END) AS kth
         |      FROM sk GROUP BY 1),
         |e AS (SELECT source, count(*) AS exact_shingles FROM dt GROUP BY 1),
         |j AS (SELECT e.source, e.exact_shingles, s.n_kept,
         |        CASE WHEN s.n_kept < 64 THEN s.n_kept
         |        ELSE CAST((CAST(63 AS HUGEINT) * 1152921504606846976)
         |          // greatest(${nibbleValue("s.kth", 15)}, 64) AS BIGINT)
         |        END AS est
         |      FROM e JOIN s USING (source))
         |SELECT source, exact_shingles, n_kept, est,
         |  CAST((CAST(abs(est - exact_shingles) AS HUGEINT) * 1000000)
         |    // exact_shingles AS BIGINT) AS err_ppm
         |FROM j ORDER BY source""".stripMargin,

    // replays ExtQueries.sketchKmvOverlap: pairwise source vocabulary
    // overlap in sketch space (union k-list, theta-window intersection,
    // fixed-point Jaccard / intersection estimates) PLUS the exact
    // distinct-set sides. Deterministic end-to-end, same protocol as
    // sketch_kmv_distinct.
    "sketch_kmv_overlap" -> kmvOverlapSql,

    // the store-served twin (SketchStore built write(doc_id even) +
    // extend(doc_id odd)) shares the oracle VERBATIM: k-min merge is
    // exact (k-min-of-k-mins = k-min-of-union), so the split-built
    // store must reproduce the one-shot sketch bit-for-bit — the
    // hash check IS the merge-algebra proof
    "sketch_kmv_indexed" -> kmvOverlapSql,
  )

  /** Replays ExtQueries.graphPagerank END-TO-END: all five PageRank
    * iterations unrolled as CTEs over the symmetrised user↔event-type
    * graph, every step the same exact integer arithmetic as the Spark
    * operator (scale = 10^12 units, floor division for per-edge
    * contributions and the 85/100 damping) — link analysis as a
    * hash-checkable gate, possible only because the operator is
    * fixed-point, not floating-point.
    */
  private lazy val pagerankSql = {
    def iter(k: Int): String =
      s"""r$k AS (SELECT n.id,
         |  (SELECT b FROM p) + (85 * COALESCE(s.m, 0)) // 100 AS r
         |  FROM n LEFT JOIN (
         |    SELECT e.dst AS id, sum(rp.r // deg.d) AS m
         |    FROM e JOIN r${k - 1} rp ON rp.id = e.src
         |           JOIN deg ON deg.src = e.src
         |    GROUP BY 1) s ON s.id = n.id)""".stripMargin
    s"""WITH e AS (
       |  SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS src,
       |         'e:' || event_type AS dst FROM events
       |  UNION
       |  SELECT DISTINCT 'e:' || event_type AS src,
       |         'u:' || CAST(user_id AS VARCHAR) AS dst FROM events),
       |n AS (SELECT DISTINCT src AS id FROM e
       |      UNION SELECT DISTINCT dst FROM e),
       |deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
       |p AS (SELECT 1000000000000 // count(*) AS r0,
       |        ((1000000000000 // count(*)) * 15) // 100 AS b FROM n),
       |r0 AS (SELECT id, (SELECT r0 FROM p) AS r FROM n),
       |${(1 to 5).map(iter).mkString(",\n")}
       |SELECT id, CAST(r AS BIGINT) AS rank FROM r5 ORDER BY id""".stripMargin
  }

  /** Replays ExtQueries.graphLabelProp END-TO-END: all three
    * synchronous label-propagation rounds unrolled as CTEs over the
    * co-purchase graph — per round, integer vote counts, argmax by
    * `(votes desc, label asc)` (row_number here ≡ the Spark side's
    * `max(struct(votes, -label))` aggregate: both realise the same
    * total order), seed clamp + previous-label carry via COALESCE.
    * Hash-exact for the pagerank reason: every value is an integer
    * and every tie is broken by a total order.
    */
  private lazy val kcoreSql = {
    def round(i: Int): String =
      s"""d$i AS (SELECT id, count(*) AS deg FROM (
         |    SELECT lo AS id FROM ec${i - 1}
         |    UNION ALL SELECT hi AS id FROM ec${i - 1}) GROUP BY 1),
         |n$i AS (SELECT id FROM d$i WHERE deg >= 80),
         |ec$i AS (SELECT lo, hi FROM ec${i - 1}
         |  WHERE lo IN (SELECT id FROM n$i)
         |    AND hi IN (SELECT id FROM n$i))""".stripMargin
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |ec0 AS (SELECT DISTINCT a.l_partkey AS lo, b.l_partkey AS hi
       |       FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
       |        AND a.l_partkey < b.l_partkey),
       |${(1 to 3).map(round).mkString(",\n")}
       |SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
       |    SELECT lo AS id FROM ec3 UNION ALL SELECT hi AS id FROM ec3)
       |GROUP BY id ORDER BY id""".stripMargin
  }

  private lazy val labelPropSql = {
    def iter(k: Int): String =
      s"""v$k AS (SELECT e.dst AS id, l.label, count(*) AS c
         |  FROM e JOIN l${k - 1} l ON l.id = e.src GROUP BY 1, 2),
         |a$k AS (SELECT id, label FROM (
         |    SELECT id, label, row_number() OVER (PARTITION BY id
         |      ORDER BY c DESC, label ASC) AS rn FROM v$k)
         |  WHERE rn = 1),
         |l$k AS (SELECT nn.id,
         |    COALESCE(s.seed_label, a.label, p.label) AS label
         |  FROM nn LEFT JOIN s ON s.id = nn.id
         |    LEFT JOIN a$k a ON a.id = nn.id
         |    LEFT JOIN l${k - 1} p ON p.id = nn.id
         |  WHERE COALESCE(s.seed_label, a.label, p.label) IS NOT NULL)"""
        .stripMargin
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |e0 AS (SELECT a.l_partkey AS src, b.l_partkey AS dst
       |       FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
       |        AND a.l_partkey < b.l_partkey),
       |e AS (SELECT DISTINCT src, dst FROM
       |      (SELECT src, dst FROM e0
       |       UNION ALL SELECT dst, src FROM e0)),
       |s AS (SELECT p_partkey AS id,
       |        CAST(substr(p_brand, 7) AS BIGINT) AS seed_label
       |      FROM part WHERE p_partkey % 5 = 0),
       |nn AS (SELECT DISTINCT src AS id FROM e
       |       UNION SELECT id FROM s),
       |l0 AS (SELECT id, seed_label AS label FROM s),
       |${(1 to 3).map(iter).mkString(",\n")}
       |SELECT id, CAST(label AS BIGINT) AS label FROM l3
       |ORDER BY id""".stripMargin
  }

  /** Replays HistoryOps.scd2(events≠purchase, user_id, ts,
    * [event_type], tie=event_id): change-collapse via lag, version /
    * valid_to over the same (valid_from, event_id) order, plus the
    * per-key pre-collapse last_changed frontier — every value a raw
    * timestamp or integer, nothing floating. Shared by the direct
    * gate and the HistoryStore-served gate.
    */
  private lazy val scd2HistorySql =
    scd2HistoryBodySql + "\nORDER BY user_id, version"

  /** [[scd2HistorySql]] restricted to the keys a purge LEFT BEHIND —
    * the store-purge gate's oracle (the erased keys simply never
    * existed, which is exactly what right-to-be-forgotten promises).
    */
  private lazy val scd2PurgeHistorySql =
    s"""SELECT * FROM ($scd2HistoryBodySql)
       |WHERE user_id % 7 <> 3
       |ORDER BY user_id, version""".stripMargin

  private lazy val scd2HistoryBodySql =
    """WITH ev AS (
      |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
      |         event_type
      |  FROM events WHERE event_type <> 'purchase'),
      |ordered AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         lag(event_type) OVER
      |           (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
      |         max(ts) OVER (PARTITION BY user_id) AS last_changed
      |  FROM ev),
      |starts AS (
      |  SELECT user_id, event_id, event_type, ts AS valid_from,
      |         last_changed
      |  FROM ordered WHERE prev IS NULL OR prev <> event_type)
      |SELECT user_id,
      |       CAST(row_number() OVER w AS INT) AS version,
      |       event_type, valid_from,
      |       lead(valid_from) OVER w AS valid_to,
      |       (lead(valid_from) OVER w) IS NULL AS is_current,
      |       last_changed
      |FROM starts
      |WINDOW w AS (PARTITION BY user_id ORDER BY valid_from, event_id)""".stripMargin

  private lazy val cmsSql =
    s"""WITH $tokCte2
       |SELECT w AS token, count(*) AS exact_n, TRUE AS probe_ok FROM tokw
       |GROUP BY w ORDER BY exact_n DESC, token LIMIT 10""".stripMargin

  private lazy val kmvOverlapSql =
      s"""WITH tw AS (SELECT source, string_split(text, ' ') AS t
         |            FROM documents),
         |sh AS (SELECT source, t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS w
         |       FROM tw, unnest(range(len(t) - 2)) AS u(i)),
         |dt AS (SELECT DISTINCT source, w FROM sh),
         |hh AS (SELECT DISTINCT source, md5(w) AS h FROM dt),
         |r AS (SELECT source, h,
         |        row_number() OVER (PARTITION BY source ORDER BY h) AS rn
         |      FROM hh),
         |sk AS (SELECT source, h FROM r WHERE rn <= 64),
         |srcs AS (SELECT DISTINCT source FROM documents),
         |pairs AS (SELECT a.source AS src_a, b.source AS src_b
         |          FROM srcs a JOIN srcs b ON a.source < b.source),
         |uh AS (SELECT DISTINCT p.src_a, p.src_b, s.h
         |       FROM pairs p JOIN sk s
         |         ON s.source = p.src_a OR s.source = p.src_b),
         |ur AS (SELECT src_a, src_b, h, row_number()
         |         OVER (PARTITION BY src_a, src_b ORDER BY h) AS rn
         |       FROM uh),
         |uk AS (SELECT * FROM ur WHERE rn <= 64),
         |us AS (SELECT src_a, src_b, count(*) AS n_union,
         |         max(CASE WHEN rn = 64 THEN h END) AS kth
         |       FROM uk GROUP BY 1, 2),
         |it AS (SELECT u.src_a, u.src_b, count(*) AS n_inter
         |       FROM uk u
         |       JOIN sk x ON x.source = u.src_a AND x.h = u.h
         |       JOIN sk y ON y.source = u.src_b AND y.h = u.h
         |       GROUP BY 1, 2),
         |ue AS (SELECT us.src_a, us.src_b, us.n_union,
         |         coalesce(it.n_inter, 0) AS n_inter,
         |         CASE WHEN us.n_union < 64 THEN us.n_union
         |         ELSE CAST((CAST(63 AS HUGEINT) * 1152921504606846976)
         |           // greatest(${nibbleValue("us.kth", 15)}, 64) AS BIGINT)
         |         END AS union_est
         |       FROM us LEFT JOIN it
         |         ON it.src_a = us.src_a AND it.src_b = us.src_b),
         |ex AS (SELECT source, count(*) AS ex FROM dt GROUP BY 1),
         |ei AS (SELECT x.source AS src_a, y.source AS src_b,
         |         count(*) AS ex_inter
         |       FROM dt x JOIN dt y
         |         ON x.w = y.w AND x.source < y.source
         |       GROUP BY 1, 2)
         |SELECT ue.src_a, ue.src_b, ue.n_union, ue.n_inter,
         |  CAST((CAST(ue.n_inter AS HUGEINT) * 1000000)
         |    // greatest(ue.n_union, 1) AS BIGINT) AS jaccard_ppm,
         |  ue.union_est,
         |  CAST((CAST(ue.n_inter AS HUGEINT) * ue.union_est)
         |    // greatest(ue.n_union, 1) AS BIGINT) AS inter_est,
         |  ea.ex AS ex_a, eb.ex AS ex_b,
         |  coalesce(ei.ex_inter, 0) AS ex_inter,
         |  CAST((CAST(coalesce(ei.ex_inter, 0) AS HUGEINT) * 1000000)
         |    // (ea.ex + eb.ex - coalesce(ei.ex_inter, 0)) AS BIGINT)
         |    AS exact_jaccard_ppm
         |FROM ue
         |JOIN ex ea ON ea.source = ue.src_a
         |JOIN ex eb ON eb.source = ue.src_b
         |LEFT JOIN ei ON ei.src_a = ue.src_a AND ei.src_b = ue.src_b
         |ORDER BY ue.src_a, ue.src_b""".stripMargin

  /** Shared z-layout CTE chain: normalised events with epoch-us time →
    * global per-dimension bounds → exact integer grid coordinates
    * (width = (range div 256) + 1, matching [[graft.operators
    * .LayoutOps.zorderKey]]'s overflow-free bucketing) → interleaved
    * Morton key (generated bit-shift sum, 8 bits × 2 dims).
    */
  /** Shared dHash replay: pixel grid for originals + perturbed clones
    * (clone = base pattern with the (0,0) red channel bumped +96 mod
    * 256, id-shifted by 10⁶ — `MultimodalOps.perturbClones`'s
    * contract), exact integer brightness, adjacent-pixel comparison
    * bits packed into a 56-bit long. All floored-mod arithmetic, so
    * the replay is total over any id.
    */
  private def dhashCte: String =
    s"""ids AS (
      |  SELECT doc_id AS media_id, doc_id AS base, 0 AS pert FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, doc_id, 1 FROM documents),
      |mpx AS (SELECT media_id, pert,
      |    CAST(xx.i AS BIGINT) AS x, CAST(yy.i AS BIGINT) AS y,
      |    md5(concat(CAST(base AS VARCHAR), ':', CAST(xx.i AS VARCHAR),
      |               ':', CAST(yy.i AS VARCHAR))) AS m
      |  FROM ids, unnest(range(8)) AS xx(i), unnest(range(8)) AS yy(i)),
      |gpx AS (SELECT media_id, x, y,
      |    (CASE WHEN pert = 1 AND x = 0 AND y = 0
      |       THEN (${hexByte("m", 1)} + 96) % 256
      |       ELSE ${hexByte("m", 1)} END)
      |    + ${hexByte("m", 3)} + ${hexByte("m", 5)} AS gray
      |  FROM mpx),
      |dh AS (SELECT a.media_id,
      |    CAST(sum(CASE WHEN a.gray > c.gray
      |         THEN CAST(1 AS BIGINT) << CAST(a.y * 7 + a.x AS INT)
      |         ELSE 0 END) AS BIGINT) AS dhash
      |  FROM gpx a JOIN gpx c
      |    ON a.media_id = c.media_id AND a.y = c.y AND c.x = a.x + 1
      |  WHERE a.x < 7
      |  GROUP BY a.media_id)""".stripMargin

  /** Shared audio-fingerprint replay: [[graft.operators.MultimodalOps
    * .noiseSample]] md5 waveforms for originals + gain-scaled clones
    * (clone sample = floorDiv(v·9, 10), id-shifted by 10⁶ —
    * `gainClones`' contract; floorDiv emulated with exact integer
    * floored-mod arithmetic since DuckDB's `//` truncates), 32
    * sub-window energies, contour bits packed into a 31-bit long.
    */
  private def afpCte: String =
    s"""aids AS (SELECT doc_id AS media_id FROM documents
      |          WHERE doc_id % 3 = 1),
      |sm AS (SELECT media_id, CAST(i AS BIGINT) AS i,
      |         md5(concat('a:', CAST(media_id AS VARCHAR), ':',
      |                    CAST(i AS VARCHAR))) AS m
      |       FROM aids, unnest(range(256)) AS u(i)),
      |s0 AS (SELECT media_id, i,
      |         CAST(${nibbleValue("m", 4)} - 32768 AS INT) AS v
      |       FROM sm),
      |sall AS (SELECT media_id, i, v FROM s0
      |       UNION ALL
      |       SELECT media_id + 1000000, i,
      |         CAST(least(32767, greatest(-32768,
      |           (v * 9 - (((v * 9) % 10) + 10) % 10) // 10)) AS INT)
      |       FROM s0),
      |en AS (SELECT media_id, CAST(i // 8 AS INT) AS k,
      |         sum(CAST(v AS BIGINT) * v) AS e
      |       FROM sall GROUP BY 1, 2),
      |eb AS (SELECT media_id, k, e,
      |         lead(e) OVER (PARTITION BY media_id ORDER BY k) AS ne
      |       FROM en),
      |af AS (SELECT media_id,
      |    CAST(sum(CASE WHEN ne IS NOT NULL AND e > ne
      |         THEN CAST(1 AS BIGINT) << k ELSE 0 END) AS BIGINT) AS afp
      |  FROM eb GROUP BY media_id)""".stripMargin

  /** Shared per-frame dHash replay for the video gates
    * ([[graft.operators.MultimodalOps.videoChannel]]'s contract):
    * scene-keyed md5-noise pixels, the frame-dependent red bump,
    * exact brightness compare bits — the Spark side must reproduce
    * every bit through container demux + per-frame PNG decode.
    */
  private def videoDhashCte: String =
    s"""vids AS (SELECT doc_id AS media_id FROM documents
      |          WHERE doc_id % 3 = 2),
      |vfr AS (SELECT media_id, CAST(ff.f AS INT) AS f,
      |          CASE WHEN ff.f < 5 THEN 0 ELSE 1 END AS scene
      |        FROM vids, unnest(range(8)) AS ff(f)),
      |vpx AS (SELECT media_id, f,
      |    CAST(xx.i AS BIGINT) AS x, CAST(yy.i AS BIGINT) AS y,
      |    md5(concat('v:', CAST(media_id AS VARCHAR), ':',
      |               CAST(scene AS VARCHAR), ':', CAST(xx.i AS VARCHAR),
      |               ':', CAST(yy.i AS VARCHAR))) AS m
      |  FROM vfr, unnest(range(8)) AS xx(i), unnest(range(8)) AS yy(i)),
      |vgp AS (SELECT media_id, f, x, y,
      |    (CASE WHEN x = f % 8 AND y = f // 8
      |       THEN (${hexByte("m", 1)} + 96) % 256
      |       ELSE ${hexByte("m", 1)} END)
      |    + ${hexByte("m", 3)} + ${hexByte("m", 5)} AS gray
      |  FROM vpx),
      |vdh AS (SELECT a.media_id, a.f AS frame_no,
      |    CAST(sum(CASE WHEN a.gray > c.gray
      |         THEN CAST(1 AS BIGINT) << CAST(a.y * 7 + a.x AS INT)
      |         ELSE 0 END) AS BIGINT) AS dhash
      |  FROM vgp a JOIN vgp c
      |    ON a.media_id = c.media_id AND a.f = c.f
      |       AND a.y = c.y AND c.x = a.x + 1
      |  WHERE a.x < 7
      |  GROUP BY a.media_id, a.f)""".stripMargin

  /** The layout_hilbert_3d replay: Skilling's transform at n = 3,
    * bits = 4, fully UNROLLED — each inverse-undo (q, i) step is one
    * CTE layer whose exchange/invert is plain xor/and arithmetic, so
    * the oracle derivation shares NOTHING with the Scala kernel but
    * the published algorithm. Layer semantics (Skilling 2004,
    * AxestoTranspose): for q = M..2, dim i — if x_i has bit q set,
    * invert x0's low bits under p = q−1; else exchange x0/x_i's
    * differing low bits under p. Then Gray-encode across dims
    * (sequential fold), xor the t-fold of x2's high bits, and
    * interleave MSB-first (x0 most significant per level).
    */
  private def hilbert3dSql: String = {
    val bits = 4
    def undoLayer(prev: String, name: String, q: Long, i: Int): String = {
      val p = q - 1
      if (i == 0)
        s"""$name AS (SELECT event_id,
           |  CASE WHEN (x0 & $q) != 0 THEN xor(x0, $p) ELSE x0 END AS x0,
           |  x1, x2 FROM $prev)""".stripMargin
      else {
        val xi = s"x$i"
        val other = (1 to 2).filter(_ != i).map(j => s"x$j").head
        s"""$name AS (SELECT event_id,
           |  CASE WHEN ($xi & $q) != 0 THEN xor(x0, $p)
           |       ELSE xor(x0, xor(x0, $xi) & $p) END AS x0,
           |  CASE WHEN ($xi & $q) != 0 THEN $xi
           |       ELSE xor($xi, xor(x0, $xi) & $p) END AS $xi,
           |  $other FROM $prev)""".stripMargin
      }
    }
    val qs = (1 until bits).map(l => 1L << (bits - l)) // 8, 4, 2
    val undoLayers = {
      var prev = "h0"
      var idx = 0
      val sb = Seq.newBuilder[String]
      qs.foreach { q =>
        (0 to 2).foreach { i =>
          val name = s"u$idx"
          sb += undoLayer(prev, name, q, i)
          prev = name
          idx += 1
        }
      }
      (sb.result(), prev)
    }
    val tExpr = qs.map(q =>
      s"CASE WHEN (x2 & $q) != 0 THEN ${q - 1} ELSE 0 END")
      .reduce((a, b) => s"xor($a, $b)")
    val interleave = (0 until bits).flatMap { l =>
      (0 to 2).map(j =>
        s"(((x$j >> $l) & 1) << ${l * 3 + (2 - j)})")
    }.mkString(" + ")
    s"""ev3 AS (SELECT event_id, user_id,
       |  epoch_us(CAST(ts AS TIMESTAMP)) AS tsm,
       |  event_id % 1000 AS evk FROM events),
       |b3 AS (SELECT min(user_id) AS mnu, max(user_id) AS mxu,
       |  min(tsm) AS mnt, max(tsm) AS mxt,
       |  min(evk) AS mne, max(evk) AS mxe FROM ev3),
       |zk3 AS (SELECT event_id,
       |  (user_id - mnu) // (((mxu - mnu) // ${1 << bits}) + 1) AS zb_user_id,
       |  (tsm - mnt) // (((mxt - mnt) // ${1 << bits}) + 1) AS zb_tsm,
       |  (evk - mne) // (((mxe - mne) // ${1 << bits}) + 1) AS zb_evk
       |  FROM ev3 CROSS JOIN b3),
       |h0 AS (SELECT event_id, zb_user_id AS x0, zb_tsm AS x1,
       |  zb_evk AS x2 FROM zk3),
       |${undoLayers._1.mkString(",\n")},
       |gr AS (SELECT event_id, x0, xor(x1, x0) AS x1,
       |  xor(x2, xor(x1, x0)) AS x2 FROM ${undoLayers._2}),
       |tl AS (SELECT event_id, $tExpr AS t, x0, x1, x2 FROM gr),
       |tx AS (SELECT event_id, xor(x0, t) AS x0, xor(x1, t) AS x1,
       |  xor(x2, t) AS x2 FROM tl),
       |hk3 AS (SELECT event_id, $interleave AS hkey FROM tx)
       |SELECT zk3.event_id, zb_user_id, zb_tsm, zb_evk, hkey
       |FROM zk3 JOIN hk3 USING (event_id) ORDER BY event_id""".stripMargin
  }

  /** Shared url_canon / domain_quota CTE chain: synthesize the same
    * deterministic URL as the gate (doc_id arithmetic), then replay
    * WebOps.canonicalizeUrl STRING-OP-FOR-STRING-OP (split_part ≡
    * substring_index, strpos ≡ instr, list_filter/list_sort ≡
    * filter/array_sort, string_split(x,'@')[-1] ≡
    * substring_index(x,'@',-1), rtrim(x,'.') ≡ rtrim) and the
    * registrable-domain split. Ends in
    * `wd(doc_id, url, canon_url, host, domain)`.
    */
  /** SQL literal for a fixture string carrying control characters —
    * DuckDB's E'' escape-string form, so the oracle receives the
    * IDENTICAL bytes the Scala fixture holds (robots bodies carry
    * `\r\n` line endings the parse must strip).
    */
  private def sqlStr(s: String): String =
    "E'" + s.replace("\\", "\\\\").replace("'", "\\'")
      .replace("\n", "\\n").replace("\r", "\\r") + "'"

  /** Shared robots.txt CTE chain: the fixture bodies rendered
    * verbatim from `ExtQueries.robotsBodies`, the RFC 9309 line
    * grammar (\r strip, comment strip, first-':' key/value split,
    * key whitelist), user-agent GROUP assembly (adjacency over
    * significant lines), and exact-agent-beats-`*` group selection
    * with multi-group union — replays `RobotsOps.parseRobots` for
    * agent 'graftbot'. Ends in `rrules(host, kind, pattern)`.
    */
  /** Shared IDN fixture CTE: the gate's host construction replayed,
    * with the expected `xn--` encodings as PINNED ABSOLUTE LITERALS
    * (RFC 3492 is not SQL-expressible). Ends in
    * `idn(doc_id, host, host_idn, domain_idn)`.
    */
  private def idnCtes: String =
    """idn AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 8 AS INTEGER)
      |      WHEN 0 THEN 'plain' || (doc_id % 5) || '.example.com'
      |      WHEN 1 THEN 'sub' || (doc_id % 5) || '.bücher.example'
      |      WHEN 2 THEN 'w' || (doc_id % 5) || '.пример.рф'
      |      WHEN 3 THEN 'cdn' || (doc_id % 5) || '.例え.jp'
      |      WHEN 4 THEN 'xn--bcher-kva.example'
      |      WHEN 5 THEN 'straße.example'
      |      WHEN 6 THEN '198.51.' || (doc_id % 5) || '.9'
      |      ELSE '[2001:db8::' || (doc_id % 7) || ']'
      |    END AS host,
      |    CASE CAST(doc_id % 8 AS INTEGER)
      |      WHEN 0 THEN 'plain' || (doc_id % 5) || '.example.com'
      |      WHEN 1 THEN 'sub' || (doc_id % 5) || '.xn--bcher-kva.example'
      |      WHEN 2 THEN 'w' || (doc_id % 5) || '.xn--e1afmkfd.xn--p1ai'
      |      WHEN 3 THEN 'cdn' || (doc_id % 5) || '.xn--r8jz45g.jp'
      |      WHEN 4 THEN 'xn--bcher-kva.example'
      |      WHEN 5 THEN 'xn--strae-oqa.example'
      |      WHEN 6 THEN '198.51.' || (doc_id % 5) || '.9'
      |      ELSE '[2001:db8::' || (doc_id % 7) || ']'
      |    END AS host_idn,
      |    CASE CAST(doc_id % 8 AS INTEGER)
      |      WHEN 0 THEN 'example.com'
      |      WHEN 1 THEN 'xn--bcher-kva.example'
      |      WHEN 2 THEN 'xn--e1afmkfd.xn--p1ai'
      |      WHEN 3 THEN 'xn--r8jz45g.jp'
      |      WHEN 4 THEN 'xn--bcher-kva.example'
      |      WHEN 5 THEN 'xn--strae-oqa.example'
      |      WHEN 6 THEN '198.51.' || (doc_id % 5) || '.9'
      |      ELSE '[2001:db8::' || (doc_id % 7) || ']'
      |    END AS domain_idn
      |  FROM documents)""".stripMargin

  /** Shared sitemap CTE: the fixture bodies rendered verbatim from
    * `ExtQueries.sitemapBodies`, the linear comment strip (split on
    * `-->`, text before each piece's `<!--`), the LINEAR
    * split-based `<loc>` extraction (split on `</loc>`, text after
    * each piece's last `<loc>` — same formulation as the operator,
    * chosen over the lazy-dotall regex whose java.util.regex
    * evaluation is quadratic on hostile bodies),
    * whitespace-trimmed, the first-opening-tag index/urlset kind
    * over the cleaned text, and the entity decode with `&amp;`
    * last. Ends in `slocs(host, kind, loc)`.
    */
  private def sitemapCtes: String = {
    val values = ExtQueries.sitemapBodies
      .map { case (h, b) => s"('$h', ${sqlStr(b)})" }
      .mkString(",\n  ")
    s"""sm0(host, body) AS (VALUES
       |  $values),
       |sm AS (SELECT host,
       |    array_to_string(list_transform(string_split(body, '-->'),
       |      p -> split_part(p, '<!--', 1)), '') AS body
       |  FROM sm0),
       |sl0 AS (SELECT host,
       |    CASE WHEN strpos(body, '<sitemapindex') > 0
       |          AND (strpos(body, '<urlset') = 0
       |               OR strpos(body, '<sitemapindex')
       |                  < strpos(body, '<urlset'))
       |         THEN 'index' ELSE 'urlset' END AS kind,
       |    unnest(string_split(body, '</loc>')) AS piece
       |  FROM sm),
       |sl1 AS (SELECT host, kind,
       |    regexp_replace(string_split(piece, '<loc>')[-1],
       |      '^\\s+|\\s+${"$"}', '', 'g') AS raw
       |  FROM sl0 WHERE strpos(piece, '<loc>') > 0),
       |slocs AS (SELECT DISTINCT host, kind,
       |    replace(replace(replace(replace(replace(raw,
       |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
       |      '&apos;', ''''), '&amp;', '&') AS loc
       |  FROM sl1 WHERE length(raw) > 0)""".stripMargin
  }

  /** The robots URL fixture — `docsWithRobotsUrls`'s doc_id
    * arithmetic replayed ONCE for both the decision and the
    * schedule gate (the same hoist-the-shared-fixture pattern as
    * idnCtes: two inline copies would silently desynchronize).
    * Ends in `rurls(doc_id, host, pq)`.
    */
  private def robotsUrlCtes: String =
    """rurls AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 12 <= 3 THEN 'www.example3.com'
      |         WHEN doc_id % 12 = 4 THEN 'news.site1.co.uk'
      |         WHEN doc_id % 12 <= 10 THEN 'blog.host1.org'
      |         ELSE 'cdn.data3.com.au' END AS host,
      |    CASE CAST(doc_id % 12 AS INTEGER)
      |      WHEN 0 THEN '/private/x' || (doc_id % 7)
      |      WHEN 1 THEN '/articles/a' || (doc_id % 7) || '/draft'
      |      WHEN 2 THEN '/articles/a' || (doc_id % 7) || '/draft2'
      |      WHEN 3 THEN '/articles/x' || (doc_id % 7)
      |      WHEN 4 THEN '/anything' || (doc_id % 7)
      |      WHEN 5 THEN '/tmp_a/f' || (doc_id % 7)
      |      WHEN 6 THEN '/tmpXa/f' || (doc_id % 7)
      |      WHEN 7 THEN '/tmp_a/ok'
      |      WHEN 8 THEN '/tmp_a/ok2'
      |      WHEN 9 THEN '/d' || (doc_id % 7) || '.json'
      |      WHEN 10 THEN '/d' || (doc_id % 7) || '.json?x=1'
      |      ELSE '/' || (CASE WHEN doc_id % 7 < 3 THEN 'x'
      |                        WHEN doc_id % 7 < 5 THEN 'y'
      |                        ELSE 'z' END) || '/a' || (doc_id % 7)
      |    END AS pq
      |  FROM documents)""".stripMargin

  private def robotsCtes: String = {
    val values = ExtQueries.robotsBodies
      .map { case (h, b) => s"('$h', ${sqlStr(b)})" }
      .mkString(",\n  ")
    s"""rbodies(host, body) AS (VALUES
       |  $values),
       |rl0 AS (SELECT host,
       |    generate_subscripts(
       |      string_split(replace(body, chr(13), ''), chr(10)), 1) AS ln,
       |    unnest(
       |      string_split(replace(body, chr(13), ''), chr(10))) AS raw
       |  FROM rbodies),
       |rl1 AS (SELECT host, ln,
       |    trim(split_part(raw, '#', 1)) AS l FROM rl0),
       |rsig AS (SELECT host, ln,
       |    lower(trim(split_part(l, ':', 1))) AS k,
       |    trim(substr(l, strpos(l, ':') + 1)) AS v
       |  FROM rl1
       |  WHERE strpos(l, ':') > 0
       |    AND lower(trim(split_part(l, ':', 1)))
       |      IN ('user-agent', 'allow', 'disallow')),
       |rg0 AS (SELECT *, (k = 'user-agent') AS is_ua,
       |    CASE WHEN k = 'user-agent' AND NOT coalesce(
       |        lag(k = 'user-agent')
       |          OVER (PARTITION BY host ORDER BY ln), false)
       |      THEN 1 ELSE 0 END AS new_grp
       |  FROM rsig),
       |rg1 AS (SELECT *,
       |    sum(new_grp) OVER (PARTITION BY host ORDER BY ln) AS gid
       |  FROM rg0),
       |rg2 AS (SELECT *,
       |    max(CASE WHEN is_ua AND lower(v) = 'graftbot'
       |          THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY host, gid) AS grp_exact,
       |    max(CASE WHEN is_ua AND v = '*' THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY host, gid) AS grp_star
       |  FROM rg1),
       |rg3 AS (SELECT *,
       |    max(grp_exact) OVER (PARTITION BY host) AS host_exact
       |  FROM rg2),
       |rrules AS (SELECT DISTINCT host, k AS kind, v AS pattern
       |  FROM rg3
       |  WHERE NOT is_ua AND gid >= 1 AND length(v) > 0
       |    AND (grp_exact = 1
       |      OR (host_exact = 0 AND grp_star = 1)))""".stripMargin
  }

  /** [[robotsCtes]] extended with the crawl-delay resolution for
    * agent 'graftbot' — crawl-delay lines (unknown to the §2
    * grammar) attach to the group of the nearest preceding
    * significant line, agent-bound groups only, min across groups.
    * Values gate on the plain non-negative-decimal regex BEFORE the
    * cast — the shape BOTH engines replay identically (Spark's
    * try_cast and DuckDB's TRY_CAST disagree on 'inf', and a
    * negative published delay must not invert the schedule). Ends
    * in `rdelays(host, crawl_delay)`.
    */
  private def robotsDelayCtes: String =
    s"""$robotsCtes,
       |cdl AS (
       |  SELECT host, ln,
       |         CAST(trim(substr(l, strpos(l, ':') + 1))
       |           AS DOUBLE) AS delay
       |  FROM rl1
       |  WHERE strpos(l, ':') > 0
       |    AND lower(trim(split_part(l, ':', 1))) = 'crawl-delay'
       |    AND regexp_matches(trim(substr(l, strpos(l, ':') + 1)),
       |          '^[0-9]+(\\.[0-9]+)?${"$"}')),
       |marks AS (
       |  SELECT host, ln,
       |         (gid >= 1 AND (grp_exact = 1
       |            OR (host_exact = 0 AND grp_star = 1))) AS app,
       |         NULL::DOUBLE AS delay
       |  FROM rg3),
       |uni AS (
       |  SELECT host, ln, app, delay FROM marks
       |  UNION ALL
       |  SELECT host, ln, NULL::BOOLEAN, delay FROM cdl),
       |asg AS (
       |  SELECT host, delay,
       |         last_value(app IGNORE NULLS) OVER (
       |           PARTITION BY host ORDER BY ln
       |           ROWS UNBOUNDED PRECEDING) AS cur_app
       |  FROM uni),
       |rdelays AS (
       |  SELECT host, min(delay) AS crawl_delay
       |  FROM asg WHERE delay IS NOT NULL AND cur_app
       |  GROUP BY host)""".stripMargin

  private def urlCtes: String = {
    s"""u AS (SELECT doc_id,
       |  (CASE WHEN doc_id % 3 = 0 THEN 'http'
       |        WHEN doc_id % 3 = 1 THEN 'HTTPS' ELSE 'https' END) ||
       |  '://' ||
       |  (CASE WHEN doc_id % 7 = 0 THEN 'u1@'
       |        WHEN doc_id % 7 = 1 THEN 'x:pw@' ELSE '' END) ||
       |  (CASE WHEN doc_id % 6 = 0
       |          THEN 'WWW.Example' || CAST(doc_id % 7 AS VARCHAR) || '.COM'
       |        WHEN doc_id % 6 = 1
       |          THEN 'news.site' || CAST(doc_id % 5 AS VARCHAR) || '.co.uk'
       |        WHEN doc_id % 6 = 2
       |          THEN 'Blog.Host' || CAST(doc_id % 5 AS VARCHAR) || '.org'
       |        WHEN doc_id % 6 = 3
       |          THEN 'cdn.data' || CAST(doc_id % 7 AS VARCHAR) || '.com.au'
       |        WHEN doc_id % 6 = 4
       |          THEN '198.51.' || CAST(doc_id % 5 AS VARCHAR) || '.' ||
       |               CAST(doc_id % 11 AS VARCHAR)
       |        ELSE '[2001:DB8::' || CAST(doc_id % 7 AS VARCHAR) || ']' END) ||
       |  (CASE WHEN doc_id % 11 = 0 THEN '.' ELSE '' END) ||
       |  (CASE WHEN doc_id % 5 = 0 THEN ':80'
       |        WHEN doc_id % 5 = 1 THEN ':443'
       |        WHEN doc_id % 5 = 2 THEN ':8080' ELSE '' END) ||
       |  (CASE WHEN doc_id % 6 = 0 THEN ''
       |        ELSE '/Articles/' ||
       |          (CASE WHEN doc_id % 9 = 0 THEN '%7Eu'
       |                WHEN doc_id % 9 = 1 THEN '%7eu'
       |                WHEN doc_id % 9 = 2 THEN '~u'
       |                WHEN doc_id % 9 = 3 THEN '%2Fx'
       |                WHEN doc_id % 9 = 4 THEN '%2fx'
       |                WHEN doc_id % 9 = 5 THEN '%zz'
       |                WHEN doc_id % 9 = 6 THEN 'p%'
       |                WHEN doc_id % 9 = 7 THEN '%41b'
       |                ELSE 'p' END) || CAST(doc_id AS VARCHAR) END) ||
       |  (CASE WHEN doc_id % 3 = 0
       |          THEN '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR) ||
       |               '&utm_campaign=x'
       |        WHEN doc_id % 3 = 1 THEN '?b=%7e2&a=1&fbclid=XyZ&%75tm_x=9'
       |        ELSE '' END) ||
       |  (CASE WHEN doc_id % 4 = 1 THEN '#Section-2' ELSE '' END)
       |  AS url FROM documents),
       |${canonChain(src = "u", p = "w")}""".stripMargin
  }

  /** Shared domain_psl / domain_quota_psl CTE chain: the same
    * deterministic PSL-exercising hosts as the gate (doc_id
    * arithmetic), the frozen rule snapshot rendered as a VALUES
    * table from the SAME parse ([[graft.operators.WebOps.pslRuleRows]]),
    * and the publicsuffix.org prevailing-rule decision: a rule
    * matches when the host ends with its base; exception beats all,
    * else longest (wildcard counts base+1, only when the host has a
    * label for the '*'), else the implicit `*`; registrable =
    * suffix + one label (exception: the rule base itself), NULL when
    * the host IS a public suffix. Ends in
    * `pd(doc_id, host, domain_psl)`.
    */
  private def pslCtes: String = {
    val ruleVals = graft.operators.WebOps
      .pslRuleRows(graft.operators.WebOps.PslSampleRules)
      .map { case (b, k, l) => s"('$b', '$k', $l)" }.mkString(", ")
    s"""ph AS (SELECT doc_id,
       |  CASE WHEN doc_id % 9 = 7
       |         THEN '198.51.' || CAST(doc_id % 3 AS VARCHAR) || '.' ||
       |              CAST(doc_id % 5 AS VARCHAR)
       |       WHEN doc_id % 9 = 8
       |         THEN '[2001:db8::' || CAST(doc_id % 11 AS VARCHAR) || ']'
       |       WHEN doc_id % 7 = 0
       |         THEN 'user' || CAST(doc_id % 11 AS VARCHAR) || '.blogspot.com'
       |       WHEN doc_id % 7 = 1
       |         THEN 'site' || CAST(doc_id % 11 AS VARCHAR) || '.github.io'
       |       WHEN doc_id % 7 = 2
       |         THEN 'www.news' || CAST(doc_id % 11 AS VARCHAR) || '.co.uk'
       |       WHEN doc_id % 7 = 3
       |         THEN 'x' || CAST(doc_id % 11 AS VARCHAR) || '.w' ||
       |              CAST(doc_id % 3 AS VARCHAR) || '.ck'
       |       WHEN doc_id % 7 = 4
       |         THEN 'sub' || CAST(doc_id % 11 AS VARCHAR) || '.www.ck'
       |       WHEN doc_id % 7 = 5
       |         THEN 'app' || CAST(doc_id % 11 AS VARCHAR) || '.svc' ||
       |              CAST(doc_id % 3 AS VARCHAR) || '.shop' ||
       |              CAST(doc_id % 5 AS VARCHAR) || '.com'
       |       ELSE (CASE WHEN doc_id % 3 = 0 THEN 'blogspot.com'
       |                  WHEN doc_id % 3 = 1 THEN 'co.uk'
       |                  ELSE 'ck' END) END AS host
       |  FROM documents),
       |${pslDecision(graft.operators.WebOps.PslSampleRules)}""".stripMargin
  }

  /** The publicsuffix.org prevailing-rule decision as SQL CTEs over a
    * preceding `ph(doc_id, host)` CTE — ONE copy shared by the
    * sample-snapshot gates ([[pslCtes]]) and the real-snapshot gate
    * (`domain_psl_full`): a rule matches when the host ends with its
    * base; exception beats all, else longest (wildcard counts
    * base+1, only when the host has a label for the '*'), else the
    * implicit `*`; registrable = suffix + one label (exception: the
    * rule base itself), NULL when the host IS a public suffix;
    * IP literals are their own domain. Ends in
    * `pd(doc_id, host, domain_psl)`.
    */
  private def pslDecision(ruleLines: Seq[String]): String = {
    val ruleVals = graft.operators.WebOps.pslRuleRows(ruleLines)
      .map { case (b, k, l) => s"('$b', '$k', $l)" }.mkString(", ")
    s"""prules(base, kind, labels) AS (VALUES $ruleVals),
       |pp AS (SELECT doc_id, host, string_split(host, '.') AS parts,
       |         len(string_split(host, '.')) AS n FROM ph),
       |pm AS (SELECT pp.doc_id,
       |         max(CASE WHEN r.kind = 'x' THEN r.labels END) AS exc_l,
       |         max(CASE WHEN r.kind = 'n' THEN r.labels
       |                  WHEN r.kind = 'w' AND pp.n >= r.labels + 1
       |                    THEN r.labels + 1 END) AS ps_l
       |       FROM pp JOIN prules r
       |         ON pp.n >= r.labels AND array_to_string(
       |              pp.parts[pp.n - r.labels + 1:pp.n], '.') = r.base
       |       GROUP BY pp.doc_id),
       |pd AS (SELECT pp.doc_id, pp.host,
       |         CASE WHEN starts_with(pp.host, '[') THEN pp.host
       |              WHEN regexp_matches(pp.host,
       |                '^[0-9]+(\\.[0-9]+){3}$$') THEN pp.host
       |              WHEN m.exc_l IS NOT NULL THEN array_to_string(
       |                pp.parts[pp.n - m.exc_l + 1:pp.n], '.')
       |              WHEN pp.n > coalesce(m.ps_l, 1) THEN array_to_string(
       |                pp.parts[pp.n - coalesce(m.ps_l, 1):pp.n], '.')
       |              ELSE NULL END AS domain_psl
       |       FROM pp LEFT JOIN pm m USING (doc_id))""".stripMargin
  }

  /** The domain_psl_full CTE chain: the real-snapshot hosts (same
    * doc_id arithmetic as the gate) + the [[pslDecision]] over the
    * frozen [[graft.operators.WebOps.PslRealSnapshot]] rules.
    */
  private def pslFullCtes: String = {
    s"""ph AS (SELECT doc_id,
       |  CASE WHEN doc_id % 11 = 0
       |         THEN 'shop' || CAST(doc_id % 11 AS VARCHAR) || '.foo' ||
       |              CAST(doc_id % 3 AS VARCHAR) || '.kawasaki.jp'
       |       WHEN doc_id % 11 = 1 THEN 'www.city.kawasaki.jp'
       |       WHEN doc_id % 11 = 2 THEN 'city.kawasaki.jp'
       |       WHEN doc_id % 11 = 3
       |         THEN 'b' || CAST(doc_id % 11 AS VARCHAR) ||
       |              '.s3.dualstack.ap-northeast-1.amazonaws.com'
       |       WHEN doc_id % 11 = 4
       |         THEN 's3.dualstack.ap-northeast-1.amazonaws.com'
       |       WHEN doc_id % 11 = 5
       |         THEN 'site' || CAST(doc_id % 11 AS VARCHAR) || '.xn--p1ai'
       |       WHEN doc_id % 11 = 6 THEN 'xn--p1ai'
       |       WHEN doc_id % 11 = 7
       |         THEN 'a' || CAST(doc_id % 3 AS VARCHAR) || '.b' ||
       |              CAST(doc_id % 11 AS VARCHAR) || '.example.zz'
       |       WHEN doc_id % 11 = 8
       |         THEN 'u' || CAST(doc_id % 11 AS VARCHAR) || '.blogspot.co.uk'
       |       WHEN doc_id % 11 = 9
       |         THEN 'y' || CAST(doc_id % 3 AS VARCHAR) || '.x' ||
       |              CAST(doc_id % 11 AS VARCHAR) || '.ck'
       |       ELSE (CASE WHEN doc_id % 2 = 0 THEN 'x5.ck'
       |                  ELSE 'www.ck' END) END AS host
       |  FROM documents),
       |${pslDecision(graft.operators.WebOps.PslRealSnapshot)}""".stripMargin
  }

  /** THE canonicalization replay chain, parameterized by the source
    * CTE (`src(doc_id, url)`) and a CTE-name prefix — ONE copy of the
    * WebOps.canonicalizeUrl / registrableDomain string algebra that
    * every url-family oracle reads (url_canon/domain_quota/
    * domain_stats through [[urlCtes]], dedup_url over its own
    * construction). Ends in `<p>d(doc_id, url, canon_url, host,
    * domain)`. A canonicalizer change edits the operator and THIS
    * string — nowhere else.
    */
  /** Percent-encoding normalization (WebOps.pctNorm, VERDICT r12 #3)
    * as one DuckDB expression over `e`: head segment passes, each
    * '%'-led segment decodes (unreserved hex pair), uppercases its
    * hex (valid but reserved) or restores a literal '%'. The
    * coalesce matters: DuckDB's array_to_string over an EMPTY list is
    * NULL where Spark's array_join is '' — without it every
    * %-free path would go NULL.
    */
  private def pctSql(e: String): String =
    s"string_split($e, '%')[1] || coalesce(array_to_string(" +
      s"list_transform(string_split($e, '%')[2:], x -> " +
      "CASE WHEN regexp_matches(upper(substr(x, 1, 2)), " +
      "'^(2[DE]|3[0-9]|4[1-9A-F]|5[0-9A]|5F|6[1-9A-F]|7[0-9A]|7E)$') " +
      "THEN decode(unhex(upper(substr(x, 1, 2)))) || substr(x, 3) " +
      "WHEN regexp_matches(upper(substr(x, 1, 2)), '^[0-9A-F]{2}$') " +
      "THEN '%' || upper(substr(x, 1, 2)) || substr(x, 3) " +
      "ELSE '%' || x END), ''), '')"

  private def canonChain(src: String, p: String): String = {
    val trackList = graft.operators.WebOps.TrackingParams
      .map(x => s"'$x'").mkString(", ")
    val suffixList = graft.operators.WebOps.MultiLabelSuffixes
      .map(s => s"'$s'").mkString(", ")
    s"""${p}1 AS (SELECT doc_id, url,
       |  lower(split_part(url, '://', 1)) AS scheme,
       |  substr(url, length(split_part(url, '://', 1)) + 4) AS rest
       |  FROM $src),
       |${p}2 AS (SELECT *,
       |       split_part(split_part(split_part(rest, '#', 1), '/', 1),
       |         '?', 1) AS authority,
       |       substr(split_part(rest, '#', 1),
       |         length(split_part(split_part(split_part(rest, '#', 1),
       |           '/', 1), '?', 1)) + 1) AS pathq
       |  FROM ${p}1),
       |${p}2h AS (SELECT *,
       |       string_split(authority, '@')[-1] AS hostport
       |  FROM ${p}2),
       |${p}3 AS (SELECT *,
       |       ${pctSql("split_part(pathq, '?', 1)")} AS path0,
       |       ${pctSql(
             "(CASE WHEN strpos(pathq, '?') > 0 THEN substr(pathq, " +
               "length(split_part(pathq, '?', 1)) + 2) ELSE '' END)")}
       |         AS qstr,
       |       CASE WHEN starts_with(hostport, '[')
       |              AND strpos(hostport, ']') > 0
       |              THEN lower(substr(hostport, 1, strpos(hostport, ']')))
       |            WHEN starts_with(hostport, '[') THEN lower(hostport)
       |            ELSE rtrim(lower(split_part(hostport, ':', 1)), '.')
       |            END AS host,
       |       CASE WHEN starts_with(hostport, '[')
       |              AND strpos(hostport, ']') > 0
       |              THEN (CASE WHEN substr(hostport,
       |                strpos(hostport, ']') + 1, 1) = ':'
       |                THEN substr(hostport, strpos(hostport, ']') + 2)
       |                ELSE '' END)
       |            WHEN starts_with(hostport, '[') THEN ''
       |            WHEN strpos(hostport, ':') > 0
       |              THEN substr(hostport,
       |                length(split_part(hostport, ':', 1)) + 2)
       |            ELSE '' END AS port
       |  FROM ${p}2h),
       |${p}4 AS (SELECT *, array_to_string(list_sort(list_filter(
       |         string_split(qstr, '&'), x -> x <> ''
       |           AND NOT starts_with(split_part(x, '=', 1), 'utm_')
       |           AND split_part(x, '=', 1) NOT IN ($trackList))), '&')
       |         AS canonq
       |  FROM ${p}3),
       |${p}5 AS (SELECT doc_id, url, host,
       |  scheme || '://' || host ||
       |  (CASE WHEN port <> '' AND NOT (scheme = 'http' AND port = '80')
       |        AND NOT (scheme = 'https' AND port = '443')
       |     THEN ':' || port ELSE '' END) ||
       |  (CASE WHEN path0 = '' THEN '/' ELSE path0 END) ||
       |  (CASE WHEN canonq <> '' THEN '?' || canonq ELSE '' END)
       |  AS canon_url,
       |  string_split(host, '.') AS parts
       |  FROM ${p}4),
       |${p}d AS (SELECT doc_id, url, canon_url, host,
       |  CASE WHEN starts_with(host, '[') THEN host
       |       WHEN regexp_matches(host, '^[0-9]+(\\.[0-9]+){3}$$')
       |         THEN host
       |       WHEN len(parts) <= 1 THEN host
       |       WHEN parts[-2] || '.' || parts[-1] IN ($suffixList)
       |            AND len(parts) >= 3
       |         THEN parts[-3] || '.' || parts[-2] || '.' || parts[-1]
       |       WHEN parts[-2] || '.' || parts[-1] IN ($suffixList)
       |         THEN host
       |       ELSE parts[-2] || '.' || parts[-1] END AS domain
       |  FROM ${p}5)""".stripMargin
  }

  private def zLayoutCtes: String = {
    val zkeyExpr = (0 until 8).flatMap { b =>
      Seq("zb_user_id", "zb_tsm").zipWithIndex.map { case (c, i) =>
        s"((($c >> $b) & 1) << ${b * 2 + i})"
      }
    }.mkString(" + ")
    s"""ev AS (SELECT event_id, user_id,
       |         epoch_us(CAST(ts AS TIMESTAMP)) AS tsm FROM events),
       |bounds AS (SELECT min(user_id) AS mnu, max(user_id) AS mxu,
       |                  min(tsm) AS mnt, max(tsm) AS mxt FROM ev),
       |zg AS (SELECT event_id, user_id, tsm,
       |  (user_id - mnu) // (((mxu - mnu) // 256) + 1) AS zb_user_id,
       |  (tsm - mnt) // (((mxt - mnt) // 256) + 1) AS zb_tsm
       |  FROM ev CROSS JOIN bounds),
       |zk AS (SELECT event_id, user_id, tsm, zb_user_id, zb_tsm,
       |  $zkeyExpr AS zkey FROM zg)""".stripMargin
  }
}

/** Constants shared with TextOps (kept here to avoid a val-object cycle). */
private[queries] object TextOpsConsts {
  val seeds = graft.operators.TextOps.MinhashSeeds
  val bands = graft.operators.TextOps.MinhashBands
}
