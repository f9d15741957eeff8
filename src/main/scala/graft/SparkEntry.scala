package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a complete operator from SURVEY.md §2 (the
  * reference's query surface re-expressed Spark-first) or a first-class
  * LLM-data-pipeline operator (dedup / similarity / text analysis /
  * multimodal). Each key with an [[oracleSql]] twin is hash-checked against
  * DuckDB at sf0.01 by the driver's Verify harness.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full curation composite — quality ∧ repetition ∧ contamination
    * gates, LSH+CC canonical dedup, per-language quota, token-bin packing —
    * i.e. the engine's whole reason to exist in one expression. */
  def entry(spark: SparkSession): DataFrame =
    Sampling.trainingMixFull(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Reference parity (SURVEY.md §2.2 Q1–Q4 re-expressed natively)
    "wc_wordcount" -> ((s, d) => TextOps.wordcount(s, d)),
    "wc_by_source" -> ((s, d) => TextOps.wordcountBySource(s, d)),
    "grep_product" -> ((s, d) => TextOps.grep(s, d)),
    "grep_match" -> ((s, d) => TextOps.grep(s, d, "vector")),
    // MapReduce engine end-to-end (F3–F7 dataflow over documents.text)
    "mr_wordcount" -> ((s, d) => graft.mr.MrQueries.mrWordcount(s, d)),
    "mr_wordcount_exec" -> ((s, d) => graft.mr.MrQueries.mrWordcountExec(s, d)),
    "mr_grep" -> ((s, d) => graft.mr.MrQueries.mrGrep(s, d)),
    // Relational coverage (bench headliners)
    "q1_agg" -> ((s, d) => Relational.q1Agg(s, d)),
    "q1_rollup" -> ((s, d) => Relational.q1Rollup(s, d)),
    "q1_cube" -> ((s, d) => Relational.q1Cube(s, d)),
    "top_customers_per_nation" -> ((s, d) => Relational.topCustomersPerNation(s, d)),
    "q3_topk" -> ((s, d) => Relational.q3Topk(s, d)),
    "q5_region" -> ((s, d) => Relational.q5Region(s, d)),
    "q14_promo" -> ((s, d) => Relational.q14Promo(s, d)),
    "customers_no_urgent" -> ((s, d) => Relational.customersNoOrders(s, d)),
    "orders_with_returns" -> ((s, d) => Relational.ordersWithReturns(s, d)),
    "customer_value_profile" -> ((s, d) => Relational.customerValueProfile(s, d)),
    "orders_above_cust_avg" -> ((s, d) => Relational.ordersAboveCustAvg(s, d)),
    "snapshot_merge" -> ((s, d) => Relational.snapshotMerge(s, d)),
    // Event analytics (windows / sessions)
    "events_hourly" -> ((s, d) => EventOps.hourly(s, d)),
    "events_sliding" -> ((s, d) => EventOps.slidingCounts(s, d)),
    "events_rolling_1h" -> ((s, d) => EventOps.rolling1h(s, d)),
    "events_first_per_user" -> ((s, d) => EventOps.firstEventsPerUser(s, d)),
    "events_sessionize" -> ((s, d) => EventOps.sessionize(s, d)),
    "events_click_no_purchase" -> ((s, d) => EventOps.clickNoPurchase(s, d)),
    "events_click_and_purchase" -> ((s, d) => EventOps.clickAndPurchase(s, d)),
    "events_value_ntile" -> ((s, d) => EventOps.valueNtile(s, d)),
    "events_type_pivot" -> ((s, d) => EventOps.typePivot(s, d)),
    "events_props_json" -> ((s, d) => EventOps.propsJson(s, d)),
    "events_date_parts" -> ((s, d) => EventOps.dateParts(s, d)),
    "events_funnel" -> ((s, d) => EventOps.funnel(s, d)),
    "events_asof_click" -> ((s, d) => EventOps.asofClickBeforePurchase(s, d)),
    "events_session_concurrency" -> ((s, d) => EventOps.sessionConcurrency(s, d)),
    "events_user_counts_salted" -> ((s, d) => Skew.userEventCountsSalted(s, d)),
    "events_stream_hourly" -> ((s, d) => graft.streaming.StreamingOps.streamingHourly(s, d)),
    "events_stream_sessionize" -> ((s, d) => graft.streaming.StreamingOps.streamingSessionize(s, d)),
    "docs_stream_dedup" -> ((s, d) => graft.streaming.StreamingOps.streamingDedup(s, d)),
    "events_stream_join" -> ((s, d) => graft.streaming.StreamingOps.streamingIntervalJoin(s, d)),
    // Deduplication
    "dedup_exact" -> ((s, d) => Dedup.exact(s, d)),
    "dedup_fingerprint" -> ((s, d) => Dedup.fingerprint(s, d)),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "dedup_minhash_lsh" -> ((s, d) => Dedup.minhashLsh(s, d)),
    "dedup_simhash" -> ((s, d) => Dedup.simhash(s, d)),
    "dedup_simhash_pairs" -> ((s, d) => Dedup.simhashPairs(s, d)),
    "dedup_embedding" -> ((s, d) => Dedup.embeddingNearDup(s, d)),
    "dedup_embedding_ivf" -> ((s, d) => Similarity.embeddingNearDupIvf(s, d)),
    "dedup_embedding_srp" -> ((s, d) => Similarity.embeddingNearDupSrp(s, d)),
    "dedup_clusters" -> ((s, d) => Dedup.clusters(s, d)),
    "graph_pagerank" -> ((s, d) => Dedup.pagerank(s, d)),
    // Similarity search
    "knn_brute" -> ((s, d) => Similarity.knnBrute(s, d)),
    "knn_ivf" -> ((s, d) => Similarity.knnIvf(s, d)),
    "embedding_centroids" -> ((s, d) => Similarity.embeddingCentroids(s, d)),
    "kmeans_train" -> ((s, d) => Similarity.kmeansTrain(s, d)),
    "knn_recall" -> ((s, d) => Similarity.knnRecall(s, d)),
    "knn_ivf_trained" -> ((s, d) => Similarity.knnIvfTrained(s, d)),
    "knn_pq" -> ((s, d) => Similarity.knnPq(s, d)),
    // Text analysis
    "text_quality" -> ((s, d) => TextAnalysis.quality(s, d)),
    "lang_id" -> ((s, d) => TextAnalysis.langId(s, d)),
    "token_count" -> ((s, d) => TextAnalysis.tokenCount(s, d)),
    "term_df" -> ((s, d) => TextAnalysis.termDf(s, d)),
    "length_quantiles" -> ((s, d) => TextAnalysis.lengthQuantiles(s, d)),
    "tfidf_top_terms" -> ((s, d) => Ranking.tfIdfTopTerms(s, d)),
    "bm25_rank" -> ((s, d) => Ranking.bm25Rank(s, d)),
    "token_histogram" -> ((s, d) => TextAnalysis.tokenHistogram(s, d)),
    "distinct_kmv" -> ((s, d) => TextAnalysis.distinctKmv(s, d)),
    "lm_bigram_score" -> ((s, d) => Curation.lmScore(s, d)),
    // Curation / sampling
    "sample_stratified" -> ((s, d) => Sampling.stratifiedSample(s, d)),
    "shard_assign" -> ((s, d) => Sampling.shardAssign(s, d)),
    "zorder_layout" -> ((s, d) => Sampling.zorderLayout(s, d)),
    "doc_novelty" -> ((s, d) => Curation.novelty(s, d)),
    "training_mix" -> ((s, d) => Sampling.trainingMix(s, d)),
    "training_mix_full" -> ((s, d) => Sampling.trainingMixFull(s, d)),
    "contamination" -> ((s, d) => Curation.contamination(s, d)),
    "quality_repetition" -> ((s, d) => Curation.repetition(s, d)),
    "doc_winnow" -> ((s, d) => Curation.winnow(s, d)),
    "doc_winnow_pairs" -> ((s, d) => Curation.winnowPairs(s, d)),
    "pii_redact" -> ((s, d) => Curation.piiRedact(s, d)),
    "pack_sequences" -> ((s, d) => Sampling.packSequences(s, d)),
    // Multimodal plumbing (stub decoder, real pipeline)
    "multimodal_media" -> ((s, d) => Multimodal.mediaFeatures(s, d)),
    "multimodal_frames" -> ((s, d) => Multimodal.frameSamples(s, d)),
  )

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "wc_wordcount" -> TextOps.wordcountSql,
    "wc_by_source" -> TextOps.wordcountBySourceSql,
    "grep_product" -> TextOps.grepSql(),
    "grep_match" -> TextOps.grepSql("vector"),
    "mr_wordcount" -> graft.mr.MrQueries.mrWordcountSql,
    "mr_wordcount_exec" -> graft.mr.MrQueries.mrWordcountSql,
    "mr_grep" -> graft.mr.MrQueries.mrGrepSql(),
    "q1_agg" -> Relational.q1AggSql,
    "q1_rollup" -> Relational.q1RollupSql,
    "q1_cube" -> Relational.q1CubeSql,
    "top_customers_per_nation" -> Relational.topCustomersPerNationSql(),
    "q3_topk" -> Relational.q3TopkSql,
    "q5_region" -> Relational.q5RegionSql,
    "q14_promo" -> Relational.q14PromoSql,
    "customers_no_urgent" -> Relational.customersNoOrdersSql,
    "orders_with_returns" -> Relational.ordersWithReturnsSql,
    "customer_value_profile" -> Relational.customerValueProfileSql,
    "orders_above_cust_avg" -> Relational.ordersAboveCustAvgSql,
    "snapshot_merge" -> Relational.snapshotMergeSql,
    "events_hourly" -> EventOps.hourlySql,
    "events_sliding" -> EventOps.slidingCountsSql,
    "events_rolling_1h" -> EventOps.rolling1hSql,
    "events_first_per_user" -> EventOps.firstEventsPerUserSql,
    "events_sessionize" -> EventOps.sessionizeSql(),
    "events_click_no_purchase" -> EventOps.clickNoPurchaseSql,
    "events_click_and_purchase" -> EventOps.clickAndPurchaseSql,
    "events_value_ntile" -> EventOps.valueNtileSql,
    "events_type_pivot" -> EventOps.typePivotSql,
    "events_props_json" -> EventOps.propsJsonSql,
    "events_date_parts" -> EventOps.datePartsSql,
    "events_funnel" -> EventOps.funnelSql,
    "events_asof_click" -> EventOps.asofClickBeforePurchaseSql,
    "events_session_concurrency" -> EventOps.sessionConcurrencySql(),
    "events_user_counts_salted" -> Skew.userEventCountsSaltedSql,
    "events_stream_hourly" -> EventOps.hourlySql,
    "events_stream_sessionize" -> EventOps.sessionizeSql(),
    "docs_stream_dedup" -> "SELECT DISTINCT md5(text) AS content_hash FROM documents",
    "events_stream_join" -> graft.streaming.StreamingOps.streamingIntervalJoinSql,
    "dedup_exact" -> Dedup.exactSql,
    "dedup_fingerprint" -> Dedup.fingerprintSql,
    "dedup_ngram_jaccard" -> Dedup.ngramJaccardSql(),
    "dedup_minhash_lsh" -> Dedup.minhashLshSql,
    "dedup_simhash" -> Dedup.simhashSql,
    "dedup_simhash_pairs" -> Dedup.simhashPairsSql(),
    "dedup_embedding" -> Dedup.embeddingNearDupSql(),
    "dedup_embedding_ivf" -> Similarity.embeddingNearDupIvfSql(),
    "dedup_embedding_srp" -> Similarity.embeddingNearDupSrpSql(),
    "dedup_clusters" -> Dedup.clustersSql,
    "graph_pagerank" -> Dedup.pagerankSql(),
    "knn_brute" -> Similarity.knnBruteSql(),
    "knn_ivf" -> Similarity.knnIvfSql(),
    "embedding_centroids" -> Similarity.embeddingCentroidsSql,
    "kmeans_train" -> Similarity.kmeansTrainSql(),
    "knn_recall" -> Similarity.knnRecallSql(),
    "knn_ivf_trained" -> Similarity.knnIvfTrainedSql(),
    "knn_pq" -> Similarity.knnPqSql(),
    "text_quality" -> TextAnalysis.qualitySql,
    "lang_id" -> TextAnalysis.langIdSql,
    "token_count" -> TextAnalysis.tokenCountSql,
    "term_df" -> TextAnalysis.termDfSql(),
    "length_quantiles" -> TextAnalysis.lengthQuantilesSql,
    "tfidf_top_terms" -> Ranking.tfIdfTopTermsSql(),
    "bm25_rank" -> Ranking.bm25RankSql(),
    "token_histogram" -> TextAnalysis.tokenHistogramSql(),
    "distinct_kmv" -> TextAnalysis.distinctKmvSql,
    "lm_bigram_score" -> Curation.lmScoreSql,
    "sample_stratified" -> Sampling.stratifiedSampleSql(),
    "shard_assign" -> Sampling.shardAssignSql(),
    "zorder_layout" -> Sampling.zorderLayoutSql,
    "doc_novelty" -> Curation.noveltySql,
    "training_mix" -> Sampling.trainingMixSql(),
    "training_mix_full" -> Sampling.trainingMixFullSql(),
    "contamination" -> Curation.contaminationSql,
    "quality_repetition" -> Curation.repetitionSql,
    "doc_winnow" -> Curation.winnowSql,
    "doc_winnow_pairs" -> Curation.winnowPairsSql(),
    "pii_redact" -> Curation.piiRedactSql,
    "pack_sequences" -> Sampling.packSequencesSql(),
    "multimodal_media" -> Multimodal.mediaFeaturesSql,
    "multimodal_frames" -> Multimodal.frameSamplesSql,
  )
}
