package graft.tools
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.adaptive.enabled", "false") // show static codegen stages
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"########## $name")
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    }
    // self-contained: materialise a small transcripts slice under this
    // tool's OWN scratch path (never Bench's warm dir — writing there
    // with this tool's parallelism would silently change the file
    // layout Bench warms up on, depending on which tool ran first)
    val flagshipIn = "/tmp/graft_plandump_in"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$flagshipIn/_SUCCESS")))
      graft.model.TranscriptGen.generate(s, seed = 1L, nConvs = 3000L, parallelism = 4)
        .write.mode("overwrite").parquet(flagshipIn)
    dump("flagship", graft.TranscriptPipeline.run(s, s.read.parquet(flagshipIn)))
    dump("q_enrich_join", graft.queries.Queries.qEnrichJoin(s, dir))
    dump("q_multiline", graft.queries.Queries.qMultiline(s, dir))
    dump("q_dedup_pairs", graft.queries.QueriesML.qDedupPairs(s, dir))
    dump("q_ann_cosine", graft.queries.QueriesML.qAnnCosine(s, dir))
    // scale-path plans: IVF assignment must show NO Exchange before the
    // cell join (fused argmax, not a window); LSH near-dup must be a
    // bucket equi-join on the derived-width bucket ids
    dump("q_ann_ivf", graft.queries.QueriesML.qAnnIvf(s, dir))
    dump("q_embed_neardup", graft.queries.QueriesML.qEmbedNearDup(s, dir))
    dump("q_filter_codec", graft.queries.Queries.qFilterCodec(s, dir))
    // round-4 surfaces: facts must be scan → partial agg → lag window →
    // partial agg (one exchange per key change, nothing corpus-wide);
    // kmeans assignment must be the fused argmax with ZERO Exchange
    // (the per-iteration centroid job has the same shape + one k×dim agg)
    dump("q_facts", graft.queries.QueriesR4.qFacts(s, dir))
    dump("q_kmeans", graft.queries.QueriesR4.qKmeans(s, dir))
    // round-5 surfaces: the text ops must be pure projections over the
    // scan (zero Exchange before the driver-only orderBy); trained IVF
    // must keep the fused-argmax zero-Exchange assignment shape
    dump("q_quality_gopher", graft.queries.QueriesR5.qQualityGopher(s, dir))
    dump("q_pii_redact", graft.queries.QueriesR5.qPiiRedact(s, dir))
    dump("q_chunk_windows", graft.queries.QueriesR5.qChunkWindows(s, dir))
    dump("q_multimodal_resize", graft.queries.QueriesR5.qMultimodalResize(s, dir))
    dump("q_ann_ivf_trained", graft.queries.QueriesR5.qAnnIvfTrained(s, dir))
    // span dedup must be the bounded-posting shape (scan → explode →
    // hash/text agg → explode → per-doc agg, no corpus broadcast);
    // decontaminate must broadcast ONLY the benchmark gram side;
    // mix_sample must be a pure predicate + one agg (no extra Exchange)
    dump("q_span_dedup", graft.queries.QueriesR5.qSpanDedup(s, dir))
    dump("q_decontaminate", graft.queries.QueriesR5.qDecontaminate(s, dir))
    dump("q_mix_sample", graft.queries.QueriesR5.qMixSample(s, dir))
    // tfidf must be ONE scan: explode → (id,term) agg → term agg joined
    // back key-partitioned (NO broadcast of the vocabulary — it grows
    // with the corpus); semdedup must be zero-Exchange fused-argmax
    // assignment, then ONE hash-partition on the cluster key feeding the
    // per-cluster equi self-join (no cartesian, no nested loop)
    dump("q_tfidf", graft.queries.QueriesR5.qTfidf(s, dir))
    dump("q_semdedup", graft.queries.QueriesR5.qSemDedup(s, dir))
    // normalize/repetition must be pure projections: zero Exchange
    // before the presentation orderBy
    dump("q_text_normalize", graft.queries.QueriesR5.qTextNormalize(s, dir))
    dump("q_doc_repetition", graft.queries.QueriesR5.qDocRepetition(s, dir))
    // c4_lines must be a pure projection (zero Exchange before the
    // presentation orderBy); bloom_dedup must show might_contain ON the
    // corpus scan's filter (before the verify join's exchanges) and no
    // broadcast of the corpus side
    dump("q_c4_lines", graft.queries.QueriesR5.qC4Lines(s, dir))
    dump("q_bloom_dedup", graft.queries.QueriesR5.qBloomDedup(s, dir))
    // source_cap must be the top_k_smallest aggregation (two
    // HashAggregates around one groups-sized Exchange), never a Window
    dump("q_source_cap", graft.queries.QueriesR5.qSourceCap(s, dir))
    // round-6 surfaces: span_removal must be window-group + id-keyed
    // cut aggregation + ONE join back (no corpus broadcast, no
    // cartesian); lm_perplexity's SCORING side must be a pure
    // projection (the model is expression state — zero Exchange before
    // the presentation orderBy)
    dump("q_span_removal", graft.queries.QueriesR6.qSpanRemoval(s, dir))
    dump("q_lm_perplexity", graft.queries.QueriesR6.qLmPerplexity(s, dir))
    // classifier must be a pure projection (weights are a foldable plan
    // literal); packing must show the two-level cumsum — a bucket-sized
    // single-partition window feeding bucket-partitioned windows, never
    // one Window over the whole corpus
    dump("q_quality_classifier", graft.queries.QueriesR6.qQualityClassifier(s, dir))
    dump("q_pack_sequences", graft.queries.QueriesR6.qPackSequences(s, dir))
    // line dedup must be count-group (8-byte-led key) + UNHINTED anti
    // join + doc-bounded reassembly; PQ must be a pure code lattice on
    // the corpus side with ONLY the query table broadcast
    dump("q_line_dedup", graft.queries.QueriesR6.qLineDedup(s, dir))
    dump("q_ann_pq", graft.queries.QueriesR6.qAnnPq(s, dir))
    // round-7 surfaces: as-of join must be ONE hash exchange + window —
    // no Join node anywhere (the union-and-carry shape); CMS heavy
    // hitters' estimate must be a projection over the counts aggregate
    // (the lattice is a plan literal — no second corpus scan, no join);
    // multimodal decode is the batched mapPartitions lattice
    dump("q_asof_join", graft.queries.QueriesR7.qAsofJoin(s, dir))
    dump("q_cms_heavy_hitters", graft.queries.QueriesR7.qCmsHeavyHitters(s, dir))
    dump("q_multimodal_decode", graft.queries.QueriesR7.qMultimodalDecode(s, dir))
    // range join must be a shuffled (key, chunk) equi-join — never a
    // nested loop; sessionize must be the native session_window
    // aggregate (map-side merge before the one key shuffle)
    dump("q_range_join", graft.queries.QueriesR7.qRangeJoin(s, dir))
    dump("q_sessionize", graft.queries.QueriesR7.qSessionize(s, dir))
    // round-7b surfaces: rollup must be ONE Expand feeding the grouping
    // aggregate (no per-level rescan); rate_windows' sliding TimeWindow
    // must be a projection-side Expand (never a range join); the
    // percentile/zscore windows must each ride ONE key exchange;
    // inverted index must reuse the term partitioning between its
    // window and group (two key exchanges total before the bounded
    // rank); PMI must be equi-joins only (no cartesian)
    dump("q_rollup_metrics", graft.queries.QueriesR7b.qRollupMetrics(s, dir))
    dump("q_rate_windows", graft.queries.QueriesR7b.qRateWindows(s, dir))
    dump("q_percentile_latency", graft.queries.QueriesR7b.qPercentileLatency(s, dir))
    dump("q_zscore_outliers", graft.queries.QueriesR7b.qZscoreOutliers(s, dir))
    dump("q_inverted_index", graft.queries.QueriesR7b.qInvertedIndex(s, dir))
    dump("q_pmi_collocations", graft.queries.QueriesR7b.qPmiCollocations(s, dir))
    // bpe encode must be ONE codegen projection over the scan (merges
    // as replace-chain literals, no join/shuffle before the
    // presentation orderBy); funnel stages are bounded user-keyed
    // aggregates joined by key; densify's grid is a generated relation
    dump("q_bpe_encode", graft.queries.QueriesR7c.qBpeEncode(s, dir))
    dump("q_funnel_stages", graft.queries.QueriesR7c.qFunnelStages(s, dir))
    dump("q_cohort_retention", graft.queries.QueriesR7c.qCohortRetention(s, dir))
    dump("q_densify_buckets", graft.queries.QueriesR7c.qDensifyBuckets(s, dir))
    // sq8 encode must be ONE codegen projection over the scan (stats as
    // reference-object plan state; the only exchange is the presentation
    // orderBy — the training pass is a separate dimension-bounded job)
    dump("q_embed_quantize", graft.queries.QueriesR7c.qEmbedQuantize(s, dir))
    // pca projection: same contract — the gram/power-iteration model is
    // plan state; the per-vector pass is one codegen projection
    dump("q_pca_project", graft.queries.QueriesR7c.qPcaProject(s, dir))
    // hard negatives must be the ivf shape (fused cell argmax, cent_id
    // equi-join) with the label filter in the join, not a post-rank pass;
    // mix temperature's keep pass is a pure predicate over the scan
    dump("q_hard_negatives", graft.queries.QueriesR7c.qHardNegatives(s, dir))
    dump("q_hll_rollup", graft.queries.QueriesR7c.qHllRollup(s, dir))
    dump("q_mix_temperature", graft.queries.QueriesR7c.qMixTemperature(s, dir))
    // pagerank: each unrolled round must be join + key agg over edges —
    // no cartesian, no per-node window
    dump("q_pagerank", graft.queries.QueriesR7c.qPageRank(s, dir))
    // profile: one stacked Generate + map-side-collapsed count agg;
    // source overlap: distinct (term, source) self-equi-join on the term
    dump("q_profile_hist", graft.queries.QueriesR7c.qProfileHist(s, dir))
    dump("q_source_overlap", graft.queries.QueriesR7c.qSourceOverlap(s, dir))
    dump("q_bitext_mine", graft.queries.QueriesR7c.qBitextMine(s, dir))
    // seasonal anomaly: the densify grid + ONE (type, hod) key exchange
    // for the median window + the flags join — no corpus-sized window
    dump("q_seasonal_anomaly", graft.queries.QueriesR7c.qSeasonalAnomaly(s, dir))
    // fuzzy match runs on the distinct-name dictionary; the funnel is
    // one content-hash exchange + codegen stage predicates
    dump("q_fuzzy_match", graft.queries.QueriesR7c.qFuzzyMatch(s, dir))
    dump("q_curation_funnel", graft.queries.QueriesR7c.qCurationFunnel(s, dir))
    s.stop()
  }
}
