package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.model.TranscriptGen
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query: the full parse → enrich → route → aggregate pipeline
    * over deterministically synthesised transcripts (BASELINE.json
    * input_hint shape); driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val turns = TranscriptGen.generate(spark, seed = 42L, nConvs = 200L, parallelism = 8).toDF()
    TranscriptPipeline.aggregates(spark, turns)
  }
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    import graft.queries.Queries._
    Map(
      "q_filter_codec" -> (qFilterCodec _),
      "q_grok_nginx" -> (qGrokNginx _),
      "q_multiline" -> (qMultiline _),
      "q_kv_parse" -> (qKvParse _),
      "q_json_action" -> (qJsonAction _),
      "q_date_parse" -> (qDateParse _),
      "q_tags" -> (qTags _),
      "q_pattern_format" -> (qPatternFormat _),
      "q_router" -> (qRouter _),
      "q_enrich_join" -> (qEnrichJoin _),
      "q_agg_counts" -> (qAggCounts _),
      "q_order_restore" -> (qOrderRestore _),
      "q_cel_predicate" -> (qCelPredicate _),
      "q_maxline" -> (qMaxLine _),
      "q_source_union" -> (qSourceUnion _),
      "q_dedup_exact" -> (graft.queries.QueriesML.qDedupExact _),
      "q_dedup_pairs" -> (graft.queries.QueriesML.qDedupPairs _),
      "q_dedup_minhash" -> (graft.queries.QueriesML.qDedupMinhash _),
      "q_dedup_simhash" -> (graft.queries.QueriesML.qDedupSimhash _),
      "q_dedup_clusters" -> (graft.queries.QueriesML.qDedupClusters _),
      "q_ann_cosine" -> (graft.queries.QueriesML.qAnnCosine _),
      "q_embed_neardup" -> (graft.queries.QueriesML.qEmbedNearDup _),
      "q_lang_id" -> (graft.queries.QueriesML.qLangId _),
      "q_text_quality" -> (graft.queries.QueriesML.qTextQuality _),
      "q_fingerprint" -> (graft.queries.QueriesML.qFingerprint _),
      "q_multimodal" -> (graft.queries.QueriesML.qMultimodal _),
      "q_multimodal_resize" -> (graft.queries.QueriesR5.qMultimodalResize _),
      "q_quality_gopher" -> (graft.queries.QueriesR5.qQualityGopher _),
      "q_pii_redact" -> (graft.queries.QueriesR5.qPiiRedact _),
      "q_chunk_windows" -> (graft.queries.QueriesR5.qChunkWindows _),
      "q_ann_ivf_trained" -> (graft.queries.QueriesR5.qAnnIvfTrained _),
      "q_span_dedup" -> (graft.queries.QueriesR5.qSpanDedup _),
      "q_decontaminate" -> (graft.queries.QueriesR5.qDecontaminate _),
      "q_mix_sample" -> (graft.queries.QueriesR5.qMixSample _),
      "q_tfidf" -> (graft.queries.QueriesR5.qTfidf _),
      "q_semdedup" -> (graft.queries.QueriesR5.qSemDedup _),
      "q_text_normalize" -> (graft.queries.QueriesR5.qTextNormalize _),
      "q_doc_repetition" -> (graft.queries.QueriesR5.qDocRepetition _),
      "q_c4_lines" -> (graft.queries.QueriesR5.qC4Lines _),
      "q_bloom_dedup" -> (graft.queries.QueriesR5.qBloomDedup _),
      "q_source_cap" -> (graft.queries.QueriesR5.qSourceCap _),
      "q_ecs_envelope" -> (graft.queries.QueriesR2.qEcsEnvelope _),
      "q_user_agent" -> (graft.queries.QueriesR2.qUserAgent _),
      "q_geoip_enrich" -> (graft.queries.QueriesR2.qGeoipEnrich _),
      "q_multiline_timeout" -> (graft.queries.QueriesR2.qMultilineTimeout _),
      "q_doris_table" -> (graft.queries.QueriesR2.qDorisTable _),
      "q_codec_meters" -> (graft.queries.QueriesR2.qCodecMeters _),
      "q_unset_field" -> (graft.queries.QueriesR2.qUnsetField _),
      "q_skew_salted_agg" -> (graft.queries.QueriesR2.qSkewSaltedAgg _),
      "q_ann_ivf" -> (graft.queries.QueriesML.qAnnIvf _),
      "q_embed_normalize" -> (graft.queries.QueriesML.qEmbedNormalize _),
      "q_sample_split" -> (graft.queries.QueriesML.qSampleSplit _),
      "q_token_hist" -> (graft.queries.QueriesML.qTokenHist _),
      "q_top_terms" -> (graft.queries.QueriesML.qTopTerms _),
      "q_cel_strings" -> (graft.queries.QueriesR3.qCelStrings _),
      "q_nano_ts" -> (graft.queries.QueriesR3.qNanoTs _),
      "q_facts" -> (graft.queries.QueriesR4.qFacts _),
      "q_kmeans" -> (graft.queries.QueriesR4.qKmeans _),
      "q_stream_replay" -> (graft.queries.QueriesR6.qStreamReplay _),
      "q_span_removal" -> (graft.queries.QueriesR6.qSpanRemoval _),
      "q_lm_perplexity" -> (graft.queries.QueriesR6.qLmPerplexity _)
    )
  }
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = {
    import graft.queries.Queries._
    Map(
      "q_filter_codec" -> qFilterCodecSql,
      "q_grok_nginx" -> qGrokNginxSql,
      "q_multiline" -> qMultilineSql,
      "q_kv_parse" -> qKvParseSql,
      "q_json_action" -> qJsonActionSql,
      "q_date_parse" -> qDateParseSql,
      "q_tags" -> qTagsSql,
      "q_pattern_format" -> qPatternFormatSql,
      "q_router" -> qRouterSql,
      "q_enrich_join" -> qEnrichJoinSql,
      "q_agg_counts" -> qAggCountsSql,
      "q_order_restore" -> qOrderRestoreSql,
      "q_cel_predicate" -> qCelPredicateSql,
      "q_maxline" -> qMaxLineSql,
      "q_source_union" -> qSourceUnionSql,
      "q_dedup_exact" -> graft.queries.QueriesML.qDedupExactSql,
      "q_dedup_pairs" -> graft.queries.QueriesML.qDedupPairsSql,
      "q_dedup_minhash" -> graft.queries.QueriesML.qDedupMinhashSql,
      "q_dedup_simhash" -> graft.queries.QueriesML.qDedupSimhashSql,
      "q_dedup_clusters" -> graft.queries.QueriesML.qDedupClustersSql,
      "q_ann_cosine" -> graft.queries.QueriesML.qAnnCosineSql,
      "q_embed_neardup" -> graft.queries.QueriesML.qEmbedNearDupSql,
      "q_lang_id" -> graft.queries.QueriesML.qLangIdSql,
      "q_text_quality" -> graft.queries.QueriesML.qTextQualitySql,
      "q_fingerprint" -> graft.queries.QueriesML.qFingerprintSql,
      "q_multimodal" -> graft.queries.QueriesML.qMultimodalSql,
      "q_multimodal_resize" -> graft.queries.QueriesR5.qMultimodalResizeSql,
      "q_quality_gopher" -> graft.queries.QueriesR5.qQualityGopherSql,
      "q_pii_redact" -> graft.queries.QueriesR5.qPiiRedactSql,
      "q_chunk_windows" -> graft.queries.QueriesR5.qChunkWindowsSql,
      "q_ann_ivf_trained" -> graft.queries.QueriesR5.qAnnIvfTrainedSql,
      "q_span_dedup" -> graft.queries.QueriesR5.qSpanDedupSql,
      "q_decontaminate" -> graft.queries.QueriesR5.qDecontaminateSql,
      "q_mix_sample" -> graft.queries.QueriesR5.qMixSampleSql,
      "q_tfidf" -> graft.queries.QueriesR5.qTfidfSql,
      "q_semdedup" -> graft.queries.QueriesR5.qSemDedupSql,
      "q_text_normalize" -> graft.queries.QueriesR5.qTextNormalizeSql,
      "q_doc_repetition" -> graft.queries.QueriesR5.qDocRepetitionSql,
      "q_c4_lines" -> graft.queries.QueriesR5.qC4LinesSql,
      "q_bloom_dedup" -> graft.queries.QueriesR5.qBloomDedupSql,
      "q_source_cap" -> graft.queries.QueriesR5.qSourceCapSql,
      "q_ecs_envelope" -> graft.queries.QueriesR2.qEcsEnvelopeSql,
      "q_user_agent" -> graft.queries.QueriesR2.qUserAgentSql,
      "q_geoip_enrich" -> graft.queries.QueriesR2.qGeoipEnrichSql,
      "q_multiline_timeout" -> graft.queries.QueriesR2.qMultilineTimeoutSql,
      "q_doris_table" -> graft.queries.QueriesR2.qDorisTableSql,
      "q_codec_meters" -> graft.queries.QueriesR2.qCodecMetersSql,
      "q_unset_field" -> graft.queries.QueriesR2.qUnsetFieldSql,
      "q_skew_salted_agg" -> graft.queries.QueriesR2.qSkewSaltedAggSql,
      "q_ann_ivf" -> graft.queries.QueriesML.qAnnIvfSql,
      "q_embed_normalize" -> graft.queries.QueriesML.qEmbedNormalizeSql,
      "q_sample_split" -> graft.queries.QueriesML.qSampleSplitSql,
      "q_token_hist" -> graft.queries.QueriesML.qTokenHistSql,
      "q_top_terms" -> graft.queries.QueriesML.qTopTermsSql,
      "q_cel_strings" -> graft.queries.QueriesR3.qCelStringsSql,
      "q_nano_ts" -> graft.queries.QueriesR3.qNanoTsSql,
      "q_facts" -> graft.queries.QueriesR4.qFactsSql,
      "q_kmeans" -> graft.queries.QueriesR4.qKmeansSql,
      "q_stream_replay" -> graft.queries.QueriesR6.qStreamReplaySql,
      "q_span_removal" -> graft.queries.QueriesR6.qSpanRemovalSql,
      "q_lm_perplexity" -> graft.queries.QueriesR6.qLmPerplexitySql
    )
  }
}
