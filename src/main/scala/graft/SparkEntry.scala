package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.RelationalQueries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator coverage surface (SURVEY §2 + [EXT]);
  * `oracleSql` carries, per query, equivalent SQL the driver runs in
  * DuckDB over the same parquet tables (views named after the tables).
  * Column names and value rounding are aligned on both sides because the
  * driver hash-compares values after sorting columns by name.
  *
  * The `events` table stores TIMESTAMP(NANOS); the Spark side reads it
  * through [[graft.sources.Tables.readTable]] which truncates to
  * microseconds, so every oracle goes through the same truncation
  * (`cast(ts as timestamp)`) before filtering/ordering — otherwise
  * nanosecond-boundary rows would diverge.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q3TopK(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ [EXT]). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg(_, _)),
    "q3_topk" -> (q3TopK(_, _)),
    "join_broadcast" -> (joinBroadcast(_, _)),
    "window_rank" -> (windowRank(_, _)),
    "window_running" -> (windowRunning(_, _)),
    "setops" -> (setOps(_, _)),
    "rollup_agg" -> (rollupAgg(_, _)),
    "cube_agg" -> (cubeAgg(_, _)),
    "scalar_funcs" -> (scalarFuncs(_, _)),
    "json_extract" -> (jsonExtract(_, _)),
    "string_distance" -> (stringDistance(_, _)),
    "events_tumbling" -> (eventsTumbling(_, _)),
    "events_hopping" -> (eventsHopping(_, _)),
    "seq_scan" -> (seqScan(_, _)),
    "ts_scan" -> (tsScan(_, _)),
    "coalesce_scan" -> (coalesceScan(_, _)),
    "cdc_latest" -> (cdcLatest(_, _)),
    "cdc_composite_pk" -> (cdcCompositePk(_, _)),
    "upsert_emulation" -> (upsertEmulation(_, _)),
    "delete_antijoin" -> (deleteAntiJoin(_, _)),
    "semi_join" -> (semiJoin(_, _)),
    "range_join" -> (rangeJoin(_, _)),
    "asof_signup" -> (asofSignup(_, _)),
    "asof_next" -> (asofNext(_, _)),
    "events_funnel" -> (eventsFunnel(_, _)),
    "histogram_agg" -> (histogramAgg(_, _)),
    "salted_join" -> (saltedJoin(_, _)),
    "method_routing" -> (methodRouting(_, _)),
    "distinct_agg" -> (distinctAgg(_, _)),
    "conditional_agg" -> (conditionalAgg(_, _)),
    "events_sessionize" -> (eventsSessionize(_, _)),
    "salted_agg" -> (saltedAgg(_, _)),
    "topk_group_agg" -> (topkGroupAgg(_, _)),
    "percentile_agg" -> (percentileAgg(_, _)),
    "pivot_agg" -> (pivotAgg(_, _)),
    "geomean_agg" -> (geomeanAgg(_, _)),
    "setops_all" -> (setOpsAll(_, _)),
    // [EXT] training-data pipeline operators (SURVEY §7 [EXT])
    "text_stats" -> (graft.queries.ExtQueries.textStats(_, _)),
    "text_quality_filter" -> (graft.queries.ExtQueries.textQualityFilter(_, _)),
    "text_token_counts" -> (graft.queries.ExtQueries.textTokenCounts(_, _)),
    "text_bpe_tokens" -> (graft.queries.ExtQueries.textBpeTokens(_, _)),
    "text_bpe_roundtrip" -> (graft.queries.ExtQueries.textBpeRoundtrip(_, _)),
    "text_bm25" -> (graft.queries.ExtQueries.textBm25(_, _)),
    "text_pii_scrub" -> (graft.queries.ExtQueries.textPiiScrub(_, _)),
    "text_contamination" -> (graft.queries.ExtQueries.textContamination(_, _)),
    "text_decontaminate" -> (graft.queries.ExtQueries.textDecontaminate(_, _)),
    "text_decontaminate_indexed" -> (graft.queries.ExtQueries.textDecontaminateIndexed(_, _)),
    "text_surprisal" -> (graft.queries.ExtQueries.textSurprisal(_, _)),
    "text_bigram_surprisal" -> (graft.queries.ExtQueries.textBigramSurprisal(_, _)),
    "embed_quantize" -> (graft.queries.ExtQueries.embedQuantize(_, _)),
    "embed_project" -> (graft.queries.ExtQueries.embedProject(_, _)),
    "hybrid_rrf" -> (graft.queries.ExtQueries.hybridRrf(_, _)),
    "approx_distinct" -> (graft.queries.ExtQueries.approxDistinct(_, _)),
    "hll_partitioned" -> (graft.queries.ExtQueries.hllPartitioned(_, _)),
    "sketch_kmv_distinct" -> (graft.queries.ExtQueries.sketchKmvDistinct(_, _)),
    "sketch_kmv_overlap" -> (graft.queries.ExtQueries.sketchKmvOverlap(_, _)),
    "sketch_kmv_rollup" -> (graft.queries.ExtQueries.sketchKmvRollup(_, _)),
    "sketch_kmv_indexed" -> (graft.queries.ExtQueries.sketchKmvIndexed(_, _)),
    "percentile_sketch" -> (graft.queries.ExtQueries.percentileSketch(_, _)),
    "frequent_tokens" -> (graft.queries.ExtQueries.frequentTokens(_, _)),
    "sketch_cms" -> (graft.queries.ExtQueries.sketchCms(_, _)),
    "sketch_cms_store" -> (graft.queries.ExtQueries.sketchCmsStore(_, _)),
    "text_novelty_indexed" -> (graft.queries.ExtQueries.textNoveltyIndexed(_, _)),
    "graph_pagerank" -> (graft.queries.ExtQueries.graphPagerank(_, _)),
    "text_langid" -> (graft.queries.ExtQueries.textLangId(_, _)),
    "text_fingerprint" -> (graft.queries.ExtQueries.textFingerprint(_, _)),
    "text_simhash" -> (graft.queries.ExtQueries.textSimhash(_, _)),
    "dedup_exact" -> (graft.queries.ExtQueries.dedupExact(_, _)),
    "dedup_incremental" -> (graft.queries.ExtQueries.dedupIncremental(_, _)),
    "dedup_incremental_near" -> (graft.queries.ExtQueries.dedupIncrementalNear(_, _)),
    "dedup_incremental_verified" -> (graft.queries.ExtQueries.dedupIncrementalVerified(_, _)),
    "dedup_incremental_indexed" -> (graft.queries.ExtQueries.dedupIncrementalIndexed(_, _)),
    "dedup_incremental_verified_indexed" -> (graft.queries.ExtQueries.dedupIncrementalVerifiedIndexed(_, _)),
    "dedup_minhash_bands" -> (graft.queries.ExtQueries.dedupMinhashBands(_, _)),
    "dedup_minhash_pairs" -> (graft.queries.ExtQueries.dedupMinhashPairs(_, _)),
    "dedup_minhash_estimate" -> (graft.queries.ExtQueries.dedupMinhashEstimate(_, _)),
    "text_lang_mismatch" -> (graft.queries.ExtQueries.textLangMismatch(_, _)),
    "dedup_jaccard_pairs" -> (graft.queries.ExtQueries.dedupJaccardPairs(_, _)),
    "dedup_cosine_pairs" -> (graft.queries.ExtQueries.dedupCosinePairs(_, _)),
    "dedup_canonical" -> (graft.queries.ExtQueries.dedupCanonical(_, _)),
    "dedup_clusters" -> (graft.queries.ExtQueries.dedupClusters(_, _)),
    "dedup_clusters_star" -> (graft.queries.ExtQueries.dedupClustersStar(_, _)),
    "dedup_rate" -> (graft.queries.ExtQueries.dedupRate(_, _)),
    "text_repetition" -> (graft.queries.ExtQueries.textRepetition(_, _)),
    "text_tfidf" -> (graft.queries.ExtQueries.textTfidf(_, _)),
    "dedup_paragraph" -> (graft.queries.ExtQueries.dedupParagraph(_, _)),
    "dedup_substring" -> (graft.queries.ExtQueries.dedupSubstring(_, _)),
    "dedup_containment" -> (graft.queries.ExtQueries.dedupContainment(_, _)),
    "dedup_shared_index" -> (graft.queries.ExtQueries.dedupSharedIndex(_, _)),
    "text_kl_sources" -> (graft.queries.ExtQueries.textKlSources(_, _)),
    "corpus_shuffle" -> (graft.queries.ExtQueries.corpusShuffle(_, _)),
    "corpus_split" -> (graft.queries.ExtQueries.corpusSplit(_, _)),
    "corpus_pipeline" -> (graft.queries.ExtQueries.corpusPipeline(_, _)),
    "corpus_mixture" -> (graft.queries.ExtQueries.corpusMixture(_, _)),
    "url_canon" -> (graft.queries.ExtQueries.urlCanon(_, _)),
    "url_idn" -> (graft.queries.ExtQueries.urlIdn(_, _)),
    "robots_rules" -> (graft.queries.ExtQueries.robotsRules(_, _)),
    "robots_filter" -> (graft.queries.ExtQueries.robotsFilterGate(_, _)),
    "robots_sitemaps" -> (graft.queries.ExtQueries.robotsSitemaps(_, _)),
    "robots_delays" -> (graft.queries.ExtQueries.robotsDelays(_, _)),
    "robots_schedule" -> (graft.queries.ExtQueries.robotsSchedule(_, _)),
    "sitemap_parse" -> (graft.queries.ExtQueries.sitemapParse(_, _)),
    "frontier_pipeline" ->
      (graft.queries.ExtQueries.frontierPipeline(_, _)),
    "url_blocklist_idn" ->
      (graft.queries.ExtQueries.urlBlocklistIdn(_, _)),
    "domain_quota" -> (graft.queries.ExtQueries.domainQuotaGate(_, _)),
    "domain_psl" -> (graft.queries.ExtQueries.domainPsl(_, _)),
    "domain_psl_full" -> (graft.queries.ExtQueries.domainPslFull(_, _)),
    "url_blocklist" -> (graft.queries.ExtQueries.urlBlocklist(_, _)),
    "url_blocklist_hits" ->
      (graft.queries.ExtQueries.urlBlocklistHits(_, _)),
    "domain_quota_psl" -> (graft.queries.ExtQueries.domainQuotaPsl(_, _)),
    "domain_stats" -> (graft.queries.ExtQueries.domainStatsGate(_, _)),
    "dedup_url" -> (graft.queries.ExtQueries.dedupUrl(_, _)),
    "url_dedup_first" -> (graft.queries.ExtQueries.urlDedupFirst(_, _)),
    "html_strip" -> (graft.queries.ExtQueries.htmlStrip(_, _)),
    "html_strip_scan" -> (graft.queries.ExtQueries.htmlStripScan(_, _)),
    "domain_token_quota" -> (graft.queries.ExtQueries.domainTokenQuotaGate(_, _)),
    "corpus_rendezvous" -> (graft.queries.ExtQueries.corpusRendezvous(_, _)),
    "corpus_rendezvous_hier" -> (graft.queries.ExtQueries.corpusRendezvousHier(_, _)),
    "corpus_rendezvous_weighted" -> (graft.queries.ExtQueries.corpusRendezvousWeighted(_, _)),
    "sample_per_group" -> (graft.queries.ExtQueries.samplePerGroup(_, _)),
    "corpus_assemble" -> (graft.queries.ExtQueries.corpusAssemble(_, _)),
    "corpus_chunks" -> (graft.queries.ExtQueries.corpusChunks(_, _)),
    "dedup_semantic_clusters" -> (graft.queries.ExtQueries.dedupSemanticClusters(_, _)),
    "text_quality_score" -> (graft.queries.ExtQueries.textQualityScore(_, _)),
    "events_anomaly" -> (eventsAnomaly(_, _)),
    "events_retention" -> (eventsRetention(_, _)),
    "sample_reservoir_groups" -> (graft.queries.ExtQueries.sampleReservoirGroups(_, _)),
    "sample_reservoir_groups_str" -> (graft.queries.ExtQueries.sampleReservoirGroupsStr(_, _)),
    "sample_reservoir_store" -> (graft.queries.ExtQueries.sampleReservoirStore(_, _)),
    "sample_stratified" -> (graft.queries.ExtQueries.sampleStratified(_, _)),
    "sample_weighted" -> (graft.queries.ExtQueries.sampleWeighted(_, _)),
    "pack_sequences" -> (graft.queries.ExtQueries.packSequences(_, _)),
    "corpus_pack_shards" -> (graft.queries.ExtQueries.corpusPackShards(_, _)),
    "text_normalize" -> (graft.queries.ExtQueries.textNormalize(_, _)),
    "text_boilerplate" -> (graft.queries.ExtQueries.textBoilerplate(_, _)),
    "text_boilerplate_indexed" -> (graft.queries.ExtQueries.textBoilerplateIndexed(_, _)),
    "text_bpe_indexed" -> (graft.queries.ExtQueries.textBpeIndexed(_, _)),
    "text_bpe_coverage" -> (graft.queries.ExtQueries.textBpeCoverage(_, _)),
    "text_lm_surprisal" -> (graft.queries.ExtQueries.textLmSurprisal(_, _)),
    "text_lm_oov" -> (graft.queries.ExtQueries.textLmOov(_, _)),
    "text_dsir_select" -> (graft.queries.ExtQueries.textDsirSelect(_, _)),
    "dedup_simhash_pairs" -> (graft.queries.ExtQueries.dedupSimhashPairs(_, _)),
    "embed_topk" -> (graft.queries.ExtQueries.embedTopK(_, _)),
    "embed_kmeans" -> (graft.queries.ExtQueries.embedKmeans(_, _)),
    "embed_cluster_sample" -> (graft.queries.ExtQueries.embedClusterSample(_, _)),
    "embed_cluster_drift" -> (graft.queries.ExtQueries.embedClusterDrift(_, _)),
    "graph_kcore" -> (graft.queries.ExtQueries.graphKcore(_, _)),
    "embed_sq8_topk" -> (graft.queries.ExtQueries.embedSq8TopK(_, _)),
    "embed_sq8_index" -> (graft.queries.ExtQueries.embedSq8Index(_, _)),
    "embed_filtered_topk" -> (graft.queries.ExtQueries.embedFilteredTopK(_, _)),
    "embed_ivf_topk" -> (graft.queries.ExtQueries.embedIvfTopK(_, _)),
    "embed_knn_classify" -> (graft.queries.ExtQueries.embedKnnClassify(_, _)),
    "embed_outliers" -> (graft.queries.ExtQueries.embedOutliers(_, _)),
    "embed_pq" -> (graft.queries.ExtQueries.embedPq(_, _)),
    "embed_pq_topk" -> (graft.queries.ExtQueries.embedPqTopK(_, _)),
    "embed_ivf_pq_topk" -> (graft.queries.ExtQueries.embedIvfPqTopK(_, _)),
    "embed_ivf_pq_rerank" -> (graft.queries.ExtQueries.embedIvfPqRerank(_, _)),
    "embed_index_search" -> (graft.queries.ExtQueries.embedIndexSearch(_, _)),
    "embed_index_rerank" -> (graft.queries.ExtQueries.embedIndexRerank(_, _)),
    "embed_lsh_buckets" -> (graft.queries.ExtQueries.embedLshBuckets(_, _)),
    "embed_neardup_pairs" -> (graft.queries.ExtQueries.embedNearDupPairs(_, _)),
    "multimodal_meta" -> (graft.queries.ExtQueries.multimodalMeta(_, _)),
    "multimodal_frames" -> (graft.queries.ExtQueries.multimodalFrames(_, _)),
    "multimodal_decode" -> (graft.queries.ExtQueries.multimodalDecode(_, _)),
    "multimodal_jpeg" -> (graft.queries.ExtQueries.multimodalJpeg(_, _)),
    "multimodal_dhash" -> (graft.queries.ExtQueries.multimodalDhash(_, _)),
    "multimodal_neardup" -> (graft.queries.ExtQueries.multimodalNearDup(_, _)),
    "multimodal_audio" -> (graft.queries.ExtQueries.multimodalAudio(_, _)),
    "multimodal_afp" -> (graft.queries.ExtQueries.multimodalAfp(_, _)),
    "multimodal_audio_neardup" -> (graft.queries.ExtQueries.multimodalAudioNearDup(_, _)),
    "multimodal_neardup_indexed" -> (graft.queries.ExtQueries.multimodalNearDupIndexed(_, _)),
    "multimodal_audio_neardup_indexed" -> (graft.queries.ExtQueries.multimodalAudioNearDupIndexed(_, _)),
    "multimodal_video_dhash" -> (graft.queries.ExtQueries.multimodalVideoDhash(_, _)),
    "multimodal_scene_changes" -> (graft.queries.ExtQueries.multimodalSceneChanges(_, _)),
    "layout_hilbert" -> (graft.queries.ExtQueries.layoutHilbert(_, _)),
    "layout_hilbert_box" -> (graft.queries.ExtQueries.layoutHilbertBox(_, _)),
    "layout_hilbert_3d" -> (graft.queries.ExtQueries.layoutHilbert3d(_, _)),
    "layout_zorder" -> (graft.queries.ExtQueries.layoutZorder(_, _)),
    "layout_skipping" -> (graft.queries.ExtQueries.layoutSkipping(_, _)),
    "layout_store_hilbert" -> (graft.queries.ExtQueries.layoutStoreHilbert(_, _)),
    "layout_store_hilbert_3d" -> (graft.queries.ExtQueries.layoutStoreHilbert3d(_, _)),
    "layout_indexed_box" -> (graft.queries.ExtQueries.layoutIndexedBox(_, _)),
    "join_bucketed" -> (graft.queries.ExtQueries.joinBucketed(_, _)),
    "bucket_pruned_lookup" -> (graft.queries.ExtQueries.bucketPrunedLookup(_, _)),
    "scd2_history" -> (graft.queries.ExtQueries.scd2History(_, _)),
    "scd2_store_history" -> (graft.queries.ExtQueries.scd2StoreHistory(_, _)),
    "scd2_purge_history" -> (graft.queries.ExtQueries.scd2PurgeHistory(_, _)),
    "scd2_pit_join" -> (graft.queries.ExtQueries.scd2PitJoin(_, _)),
    "graph_triangles" -> (graft.queries.ExtQueries.graphTriangles(_, _)),
    "agg_store_rollup" -> (graft.queries.ExtQueries.aggStoreRollup(_, _)),
    "agg_store_coarse" -> (graft.queries.ExtQueries.aggStoreCoarse(_, _)),
    "layout_drift" -> (graft.queries.ExtQueries.layoutDrift(_, _)),
    "text_quality_classifier" -> (graft.queries.ExtQueries.textQualityClassifier(_, _)),
    "corpus_curriculum" -> (graft.queries.ExtQueries.corpusCurriculum(_, _)),
    "corpus_snapshot_diff" -> (graft.queries.ExtQueries.corpusSnapshotDiff(_, _)),
    "corpus_epochs" -> (graft.queries.ExtQueries.corpusEpochs(_, _)),
    "split_leakage" -> (graft.queries.ExtQueries.splitLeakage(_, _)),
    "skew_profile" -> (graft.queries.ExtQueries.skewProfile(_, _)),
    "skew_summary" -> (graft.queries.ExtQueries.skewSummary(_, _)),
    "graph_label_prop" -> (graft.queries.ExtQueries.graphLabelProp(_, _)),
    "profile_constraints" -> (graft.queries.ExtQueries.profileConstraints(_, _)),
    "hist_store_quantiles" -> (graft.queries.ExtQueries.histStoreQuantiles(_, _)),
    "hist_store_drift" -> (graft.queries.ExtQueries.histStoreDrift(_, _)),
    "hist_store_rebin" -> (graft.queries.ExtQueries.histStoreRebin(_, _)),
    "hist_match_resample" -> (graft.queries.ExtQueries.histMatchResample(_, _)),
    "hist_batch_drift" -> (graft.queries.ExtQueries.histBatchDrift(_, _)),
  )

  /** Normalised `events` view used by every oracle touching events:
    * nanosecond timestamps truncated to microseconds, matching the Spark
    * side's read path.
    */
  private val eventsCte =
    "ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)"

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    AS sum_base_price_x100,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    * 10000 AS BIGINT) AS sum_disc_price_x10k,
        |  (CAST(sum(CAST(l_discount AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    * 10000) // count(*) AS avg_disc_x1m,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_topk" ->
      """SELECT o_orderkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    * 10000 AS BIGINT) AS revenue_x10k
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey
        |ORDER BY revenue_x10k DESC, o_orderkey LIMIT 10""".stripMargin,

    "join_broadcast" ->
      """SELECT r_name, count(*) AS suppliers,
        |  CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    AS total_bal_x100
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "window_rank" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "window_running" ->
      s"""WITH $eventsCte
         |SELECT event_id, user_id,
         |  CAST(sum(CAST(value AS DECIMAL(18,2)))
         |    OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100 AS BIGINT)
         |    AS running_value_x100
         |FROM ev ORDER BY event_id""".stripMargin,

    "setops" ->
      """WITH b AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
        |     m AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'MACHINERY'),
        |     o AS (SELECT DISTINCT o_custkey AS k FROM orders)
        |SELECT k FROM (
        |  SELECT k FROM (
        |    SELECT DISTINCT k FROM (SELECT k FROM b UNION ALL SELECT k FROM m)
        |    INTERSECT SELECT k FROM o)
        |  EXCEPT (SELECT k FROM b INTERSECT SELECT k FROM m))
        |ORDER BY k""".stripMargin,

    "rollup_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "cube_agg" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    AS sum_price_x100
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |  o_orderpriority ASC NULLS FIRST""".stripMargin,

    "scalar_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_uc,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  substring(p_type, 1, 5) AS type5,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  CAST(round(p_retailprice * 1100, 0) AS BIGINT) AS bumped_x1000,
        |  p_size % 7 AS size_mod
        |FROM part ORDER BY p_partkey""".stripMargin,

    "json_extract" ->
      s"""WITH $eventsCte
         |SELECT CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k, count(*) AS n
         |FROM ev GROUP BY k ORDER BY k""".stripMargin,

    "string_distance" ->
      """WITH b AS (SELECT DISTINCT p_brand FROM part)
        |SELECT x.p_brand AS a, y.p_brand AS b,
        |  CAST(levenshtein(x.p_brand, y.p_brand) AS BIGINT) AS dist
        |FROM b x, b y
        |WHERE x.p_brand < y.p_brand
        |  AND levenshtein(x.p_brand, y.p_brand) <= 2
        |ORDER BY a, b""".stripMargin,

    "events_tumbling" ->
      s"""WITH $eventsCte
         |SELECT date_trunc('hour', ts) AS hour_start, event_type,
         |  count(*) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
         |    AS sum_value_x100
         |FROM ev GROUP BY hour_start, event_type
         |ORDER BY hour_start, event_type""".stripMargin,

    // each event lands in its 2 hopping windows: start_k =
    // 1800·floor(epoch/1800) − k·1800 for k in {0,1}; make_timestamp
    // rebuilds a plain (ntz) TIMESTAMP from epoch micros, matching
    // Spark's window.start
    "events_hopping" ->
      s"""WITH $eventsCte
         |SELECT make_timestamp(CAST((floor(epoch(ts) / 1800) * 1800 - i * 1800)
         |         * 1000000 AS BIGINT)) AS win_start,
         |  event_type, count(*) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
         |    AS sum_value_x100
         |FROM ev, unnest(range(2)) AS u(i)
         |GROUP BY win_start, event_type
         |ORDER BY win_start, event_type""".stripMargin,

    "seq_scan" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, round(o_totalprice, 2) AS price
        |FROM (SELECT * FROM orders WHERE o_orderkey > 100
        |      ORDER BY o_orderkey LIMIT 200)
        |ORDER BY o_orderkey""".stripMargin,

    "ts_scan" ->
      s"""WITH $eventsCte
         |SELECT event_id, ts, user_id, event_type
         |FROM ev
         |WHERE ts > TIMESTAMP '2024-01-05 00:00:00'
         |  AND ts <= TIMESTAMP '2024-01-20 00:00:00'
         |ORDER BY ts, event_id LIMIT 500""".stripMargin,

    "coalesce_scan" ->
      s"""WITH $eventsCte
         |SELECT event_id,
         |  coalesce(CASE WHEN event_type = 'error' THEN NULL ELSE ts END,
         |           date_trunc('day', ts)) AS pos,
         |  event_type
         |FROM ev
         |WHERE coalesce(CASE WHEN event_type = 'error' THEN NULL ELSE ts END,
         |               date_trunc('day', ts)) > TIMESTAMP '2024-01-03 00:00:00'
         |ORDER BY event_id""".stripMargin,

    "cdc_latest" ->
      s"""WITH $eventsCte
         |SELECT user_id, event_id, event_type
         |FROM (SELECT user_id, event_id, event_type,
         |        row_number() OVER (PARTITION BY user_id
         |          ORDER BY ts DESC, event_id DESC) AS rn
         |      FROM ev)
         |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // replays QueueExtractor.changeBatch end-state: newest entry per
    // composite PK wins (REMOVE for line 1 is the 2024-02 generation).
    // REPLACE rows carry every matching base row (the lookup join keeps
    // base-side duplicates); REMOVE rows are synthesized ONE per PK —
    // the changelog dedups per pkValue — hence DISTINCT on that leg
    // (the synthetic lineitem does contain duplicate composite keys).
    "cdc_composite_pk" ->
      """SELECT * FROM (
        |  SELECT l_orderkey, l_linenumber, 'REPLACE' AS method,
        |         round(l_extendedprice, 2) AS price
        |  FROM lineitem WHERE l_orderkey % 199 = 0 AND l_linenumber <> 1
        |  UNION ALL
        |  SELECT DISTINCT l_orderkey, 1 AS l_linenumber, 'REMOVE',
        |         CAST(NULL AS DOUBLE)
        |  FROM lineitem WHERE l_orderkey % 199 = 0 AND l_linenumber = 1)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "upsert_emulation" ->
      """WITH u AS (SELECT o_orderkey, o_totalprice * 2 AS o_totalprice
        |           FROM orders WHERE o_orderkey % 10 = 0),
        |     k AS (SELECT o_orderkey, o_totalprice FROM orders
        |           WHERE NOT (o_orderkey % 10 = 0))
        |SELECT o_orderkey, round(o_totalprice, 2) AS price
        |FROM (SELECT * FROM k UNION ALL SELECT * FROM u)
        |WHERE o_orderkey <= 2000 ORDER BY o_orderkey""".stripMargin,

    "delete_antijoin" ->
      """SELECT o_orderstatus, count(*) AS n
        |FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM customer
        |  WHERE c_custkey = o_custkey AND c_mktsegment = 'MACHINERY')
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "range_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST((CAST(sum(l_quantity) AS BIGINT) * 10000) // count(*)
        |    AS BIGINT) AS avg_qty_x10k
        |FROM orders JOIN lineitem
        |  ON o_orderkey = l_orderkey
        | AND l_shipdate >= o_orderdate
        | AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "semi_join" ->
      """SELECT o_orderpriority, count(*) AS n
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "asof_signup" ->
      s"""WITH $eventsCte
         |SELECT event_id, user_id,
         |  last_value(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
         |    OVER (PARTITION BY user_id ORDER BY ts, event_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup
         |FROM ev ORDER BY event_id""".stripMargin,

    "asof_next" ->
      s"""WITH $eventsCte
         |SELECT event_id, user_id,
         |  first_value(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
         |    OVER (PARTITION BY user_id ORDER BY ts, event_id
         |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_purchase
         |FROM ev ORDER BY event_id""".stripMargin,

    "events_funnel" ->
      s"""WITH $eventsCte,
         |s AS (SELECT user_id,
         |        min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup
         |      FROM ev GROUP BY user_id),
         |p AS (SELECT ev.user_id, min(ev.ts) AS first_purchase
         |      FROM ev JOIN s ON ev.user_id = s.user_id
         |      WHERE ev.event_type = 'purchase' AND ev.ts >= s.first_signup
         |      GROUP BY ev.user_id)
         |SELECT s.user_id, first_signup, first_purchase,
         |  CAST(first_signup IS NOT NULL AND first_purchase IS NOT NULL AS INT)
         |    AS converted,
         |  date_diff('second', first_signup, first_purchase) AS secs_to_convert
         |FROM s LEFT JOIN p ON s.user_id = p.user_id
         |ORDER BY s.user_id""".stripMargin,

    // moments replayed from EXACT integer sums in the identical
    // closed-form expression shape as the Spark side, so mu/sigma/z are
    // bit-identical IEEE doubles; z emits fixed-point (floor)
    "events_anomaly" ->
      s"""WITH $eventsCte,
         |d AS (SELECT date_trunc('day', ts) AS day, event_type,
         |        count(*) AS n
         |      FROM ev GROUP BY day, event_type),
         |m AS (SELECT event_type, count(*) AS cnt,
         |        sum(n) AS s1, sum(n * n) AS s2
         |      FROM d GROUP BY event_type),
         |zz AS (SELECT event_type, day, n,
         |         CAST(s1 AS DOUBLE) / cnt AS mu,
         |         sqrt(CAST(cnt * s2 - s1 * s1 AS DOUBLE)
         |           / CAST(cnt * (cnt - 1) AS DOUBLE)) AS sigma
         |       FROM d JOIN m USING (event_type))
         |SELECT event_type, day, n,
         |  CAST(floor((n - mu) / sigma * 10000) AS BIGINT) AS z_x10k
         |FROM zz
         |WHERE sigma > 0 AND abs((n - mu) / sigma) >= 1.5
         |ORDER BY event_type, day""".stripMargin,

    "events_retention" ->
      s"""WITH $eventsCte,
         |f AS (SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
         |      FROM ev GROUP BY user_id)
         |SELECT cohort_day,
         |  date_diff('day', cohort_day, date_trunc('day', ev.ts)) AS day_offset,
         |  count(DISTINCT ev.user_id) AS active_users
         |FROM ev JOIN f USING (user_id)
         |GROUP BY cohort_day, day_offset
         |ORDER BY cohort_day, day_offset""".stripMargin,

    "histogram_agg" ->
      """SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bucket,
        |  count(*) AS n,
        |  round(min(l_extendedprice), 2) AS lo,
        |  round(max(l_extendedprice), 2) AS hi
        |FROM lineitem GROUP BY bucket ORDER BY bucket""".stripMargin,

    // the salt is a plan-level device: the oracle is the PLAIN join —
    // salting must not change the result, only the key distribution
    "salted_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    * 10000 AS BIGINT) AS revenue_x10k
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "method_routing" ->
      s"""WITH $eventsCte
         |SELECT CASE WHEN event_type = 'signup' THEN 'INSERT'
         |            WHEN event_type = 'error' THEN 'REMOVE'
         |            ELSE 'REPLACE' END AS method, count(*) AS n
         |FROM ev GROUP BY method ORDER BY method""".stripMargin,

    "events_sessionize" ->
      s"""WITH $eventsCte,
         |g AS (SELECT user_id, event_id, ts, value,
         |        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
         |      FROM ev),
         |s AS (SELECT *, CASE WHEN prev IS NULL
         |        OR date_diff('second', prev, ts) > 1800 THEN 1 ELSE 0 END AS new_session
         |      FROM g),
         |i AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id
         |        ORDER BY ts, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         |      FROM s)
         |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
         |  min(ts) AS session_start, count(*) AS n_events,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
         |    AS session_value_x100
         |FROM i GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,

    "salted_agg" ->
      s"""WITH $eventsCte
         |SELECT event_type, count(*) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
         |    AS sum_value_x100
         |FROM ev GROUP BY event_type ORDER BY event_type""".stripMargin,

    "topk_group_agg" ->
      """SELECT o_orderpriority, CAST(rn AS BIGINT) AS rank,
        |  o_orderkey, round(o_totalprice, 2) AS o_totalprice
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_orderpriority
        |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders) t
        |WHERE rn <= 3 ORDER BY o_orderpriority, rank""".stripMargin,

    "percentile_agg" ->
      """SELECT o_orderpriority,
        |  CAST(round(quantile_cont(o_totalprice, 0.5) * 1000, 0) AS BIGINT)
        |    AS p50_x1000,
        |  CAST(round(quantile_cont(o_totalprice, 0.9) * 1000, 0) AS BIGINT)
        |    AS p90_x1000,
        |  CAST(round(max(o_totalprice) * 100, 0) AS BIGINT) AS mx_x100
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "pivot_agg" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F'
        |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) * 100 AS BIGINT) AS F,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O'
        |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) * 100 AS BIGINT) AS O,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P'
        |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) * 100 AS BIGINT) AS P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "geomean_agg" ->
      """SELECT o_orderpriority,
        |  round(exp(avg(ln(o_totalprice))), 2) AS geo_price, count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "setops_all" ->
      """SELECT k, count(*) AS extra_orders FROM (
        |  SELECT o_custkey AS k FROM orders
        |  EXCEPT ALL
        |  SELECT c_custkey AS k FROM customer)
        |GROUP BY k ORDER BY k""".stripMargin,

    "distinct_agg" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS parts,
        |  count(DISTINCT l_suppkey) AS supps
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "conditional_agg" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice
        |    ELSE 0.0 END AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_f_x100,
        |  CAST(sum(CAST(CASE WHEN o_orderstatus = 'O' THEN o_totalprice
        |    ELSE 0.0 END AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_o_x100,
        |  CAST(sum(CAST(CASE WHEN o_orderstatus = 'P' THEN o_totalprice
        |    ELSE 0.0 END AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_p_x100
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
  ) ++ graft.queries.ExtOracles.sql
}
