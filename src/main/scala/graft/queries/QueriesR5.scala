package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.text.TextAnalysis

/** Round-5 driver queries. */
object QueriesR5 {

  private def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  // ---------------------------------------------------------------
  // Multimodal resize + frame sampling, oracle-checked (round-4 additions
  // were ScalaTest-only; VERDICT r4 #8): per media row, the nearest-
  // neighbor resize output is hashed (md5 of the full resized payload —
  // the oracle reconstructs every byte via the same 1-D rule
  // out[k] = in[k·n/outLen] and hashes the identical blob) and the
  // stride-sampled frame lattice is aggregated (count / byte total /
  // frame-0 prefix). The codec itself stays the disclosed deterministic
  // stub; what this locks down cross-engine is the Spark-side plumbing:
  // payload bytes, sampling indices, chunk boundaries, resize index math.
  // ---------------------------------------------------------------
  val ResizeW = 16
  val ResizeH = 16
  val FrameStride = 2
  val FrameBytes = 100 // shipped docs are <600 bytes; 100-byte frames make
                       // the chunk lattice real (≈6 frames/doc, 3 sampled)
  def qMultimodalResize(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.fromDocuments(spark, dir)
    val rz = Multimodal.resize(media, ResizeW, ResizeH)
      .select(col("media_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        // md5 over the LOWERCASE-HEX encoding of the resized payload —
        // DuckDB has no BLOB substring, so the oracle reconstructs the
        // bytes as a hex string; hashing the same encoding both sides
        // keeps the comparison byte-exact without unhex/BLOB support
        md5(lower(hex(col("payload")))).as("resize_md5"))
    val fr = Multimodal.sampleFrames(media, FrameStride, FrameBytes)
      .groupBy("media_id").agg(
        count(lit(1)).as("n_sampled"),
        sum(col("frame_bytes")).cast("long").as("sampled_bytes"),
        min(when(col("frame_idx") === 0, col("frame_prefix"))).as("frame0_prefix"))
    rz.join(fr, Seq("media_id"), "left").orderBy("media_id")
  }
  val qMultimodalResizeSql: String = {
    val outLen = ResizeW * ResizeH
    s"""WITH media AS (
       |  SELECT doc_id AS media_id, lower(hex(encode(text))) AS hx,
       |         octet_length(encode(text)) AS n
       |  FROM documents),
       |rz AS (
       |  SELECT media_id, CAST($ResizeW AS BIGINT) AS width,
       |    CAST($ResizeH AS BIGINT) AS height,
       |    md5(string_agg(
       |      CASE WHEN n = 0 THEN '00'
       |           ELSE substr(hx, CAST((k * n) // $outLen AS BIGINT) * 2 + 1, 2) END,
       |      '' ORDER BY k)) AS resize_md5
       |  FROM media CROSS JOIN range($outLen) t(k)
       |  GROUP BY media_id, n),
       |frames AS (
       |  SELECT media_id, CAST(i AS INTEGER) AS frame_idx,
       |    CAST(least($FrameBytes, n - i * $FrameBytes) AS INTEGER) AS frame_bytes,
       |    substr(hx, CAST(i * $FrameBytes AS BIGINT) * 2 + 1, 16) AS frame_prefix
       |  FROM media CROSS JOIN range(256) t(i)
       |  WHERE i < (n + $FrameBytes - 1) // $FrameBytes
       |    AND i % $FrameStride = 0),
       |fagg AS (
       |  SELECT media_id, count(*) AS n_sampled,
       |    CAST(sum(frame_bytes) AS BIGINT) AS sampled_bytes,
       |    min(CASE WHEN frame_idx = 0 THEN frame_prefix END) AS frame0_prefix
       |  FROM frames GROUP BY media_id)
       |SELECT rz.media_id AS media_id, width, height, resize_md5,
       |       n_sampled, sampled_bytes, frame0_prefix
       |FROM rz LEFT JOIN fagg ON rz.media_id = fagg.media_id
       |ORDER BY rz.media_id""".stripMargin
  }

  // ---------------------------------------------------------------
  // IVF over the TRAINED quantizer (the stated purpose of q_kmeans):
  // kmeansCentroids (same k/iters as q_kmeans) trains the cells, then
  // ivfTopKTrained probes them. The oracle replays the IDENTICAL
  // training arithmetic via QueriesR4.kmeansCteChain, then the probe —
  // corpus argmax assignment, nprobe query cells, explicit
  // dot/(√na·√nb) cosine — entirely in SQL.
  // ---------------------------------------------------------------
  val IvfTrainedNprobe = 3
  def qAnnIvfTrained(spark: SparkSession, dir: String): DataFrame = {
    val emb = tbl(spark, dir, "embeddings")
    val cents = graft.sim.Ann.kmeansCentroids(emb,
      k = QueriesR4.KmeansK, iters = QueriesR4.KmeansIters, dim = 64)
    graft.sim.Ann.ivfTopKTrained(emb, emb.filter(col("vec_id") < 10),
        k = 5, cents, nprobe = IvfTrainedNprobe)
      .orderBy("query_id", "rank")
  }
  val qAnnIvfTrainedSql: String = {
    import QueriesR4.{cos, kmeansCteChain}
    s"""WITH $kmeansCteChain,
       |cents AS (SELECT cent AS cent_id,
       |    list_transform(cs, x -> x::DOUBLE) AS cvec FROM c2),
       |corpus_assign AS (
       |  SELECT vec_id, v, cent_id FROM (
       |    SELECT e.vec_id, e.v, c.cent_id,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cos("e.v", "c.cvec")} DESC, c.cent_id) AS rk
       |    FROM e CROSS JOIN cents c) WHERE rk = 1),
       |query_assign AS (
       |  SELECT vec_id AS query_id, v AS qvec, cent_id FROM (
       |    SELECT e.vec_id, e.v, c.cent_id,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cos("e.v", "c.cvec")} DESC, c.cent_id) AS rk
       |    FROM e CROSS JOIN cents c WHERE e.vec_id < 10) WHERE rk <= $IvfTrainedNprobe),
       |sims AS (SELECT q.query_id, ca.vec_id AS neighbor_id,
       |    ${cos("q.qvec", "ca.v")} AS sim
       |  FROM query_assign q JOIN corpus_assign ca USING (cent_id)
       |  WHERE ca.vec_id != q.query_id),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY sim DESC, neighbor_id) AS rank FROM sims)
       |SELECT query_id, rank, neighbor_id, round(sim, 4) AS sim
       |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------
  // Gopher-style quality rules (Rae et al. 2021 §A1.1) as an integer
  // lattice — every signal a count, every verdict an integer comparison,
  // so the whole row is bit-exact cross-engine. The oracle recomputes
  // word splitting, per-word filters, stopword distinctness and all five
  // keep-rules in SQL.
  // ---------------------------------------------------------------
  def qQualityGopher(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    docs.select(col("doc_id"), TextAnalysis.gopherQuality(col("text")).as("q"))
      .select(col("doc_id"), col("q.*"))
      .orderBy("doc_id")
  }
  val qQualityGopherSql: String = {
    val stops = TextAnalysis.Stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH w AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(coalesce(text, ''), '\\s+'),
       |                w -> len(w) > 0) AS words
       |  FROM documents),
       |c AS (
       |  SELECT doc_id,
       |    CAST(len(words) AS BIGINT) AS n_words,
       |    CAST(coalesce(list_sum(list_transform(words, x -> len(x))), 0) AS BIGINT)
       |      AS total_word_chars,
       |    CAST(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT)
       |      AS n_alpha_words,
       |    CAST(len(list_filter(words, x -> lower(x) IN ($stops))) AS BIGINT)
       |      AS n_stop_hits,
       |    CAST(len(list_distinct(list_transform(
       |      list_filter(words, x -> lower(x) IN ($stops)), x -> lower(x)))) AS BIGINT)
       |      AS n_distinct_stops,
       |    CAST(len(list_distinct(words)) AS BIGINT) AS n_distinct_words
       |  FROM w)
       |SELECT *,
       |  (n_words BETWEEN 50 AND 100000
       |   AND total_word_chars >= n_words * 3 AND total_word_chars <= n_words * 10
       |   AND n_alpha_words * 5 >= n_words * 4
       |   AND n_distinct_stops >= 2
       |   AND n_distinct_words * 10 >= n_words * 3) AS keep
       |FROM c ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------
  // PII redaction: the test tables carry no PII by construction, so the
  // query synthesizes realistic messages deterministically from events
  // columns (the q_grok_nginx pattern), redacts, and the oracle replays
  // the same synthesis + the same regex chain. Compared by TEXT EQUALITY
  // on the redacted message plus per-kind match counts.
  // ---------------------------------------------------------------
  def qPiiRedact(spark: SparkSession, dir: String): DataFrame = {
    val ev = tbl(spark, dir, "events")
    val msg = concat(
      lit("user=u"), col("user_id").cast("string"),
      lit(" mail=u"), col("user_id").cast("string"), lit("@example.com"),
      lit(" src=10."), (col("user_id") % 200).cast("string"),
      lit(".0."), (col("event_id") % 200).cast("string"),
      lit(" tel=+1-555-"), lpad((col("event_id") % 10000).cast("string"), 4, "0"),
      lit(" type="), col("event_type"))
    ev.filter(col("event_id") < 2000)
      .select(col("event_id"), msg.as("message"))
      .select(col("event_id"),
        TextAnalysis.redactPii(col("message")).as("redacted"),
        TextAnalysis.piiCounts(col("message")).as("c"))
      .select(col("event_id"), col("redacted"),
        col("c.emails").as("n_emails"), col("c.ips").as("n_ips"),
        col("c.phones").as("n_phones"))
      .orderBy("event_id")
  }
  val qPiiRedactSql: String =
    s"""WITH m AS (
       |  SELECT event_id,
       |    'user=u' || CAST(user_id AS VARCHAR)
       |      || ' mail=u' || CAST(user_id AS VARCHAR) || '@example.com'
       |      || ' src=10.' || CAST(user_id % 200 AS VARCHAR)
       |      || '.0.' || CAST(event_id % 200 AS VARCHAR)
       |      || ' tel=+1-555-' || lpad(CAST(event_id % 10000 AS VARCHAR), 4, '0')
       |      || ' type=' || event_type AS message
       |  FROM events WHERE event_id < 2000)
       |SELECT event_id,
       |  regexp_replace(regexp_replace(regexp_replace(message,
       |    '${TextAnalysis.EmailRe}', '<EMAIL>', 'g'),
       |    '${TextAnalysis.Ipv4Re}', '<IP>', 'g'),
       |    '${TextAnalysis.PhoneRe}', '<PHONE>', 'g') AS redacted,
       |  CAST(len(regexp_extract_all(message, '${TextAnalysis.EmailRe}')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(message, '${TextAnalysis.Ipv4Re}')) AS BIGINT) AS n_ips,
       |  CAST(len(regexp_extract_all(message, '${TextAnalysis.PhoneRe}')) AS BIGINT) AS n_phones
       |FROM m ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------
  // Token-window chunking (training context windows with overlap):
  // window=32 tokens, stride=24 (8-token overlap). Compared by TEXT
  // EQUALITY on every chunk. The oracle rebuilds the windows with
  // 1-based inclusive list slicing over a fixed start range.
  // ---------------------------------------------------------------
  val ChunkWindow = 32
  val ChunkStride = 24
  def qChunkWindows(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    docs.select(col("doc_id"),
        explode(TextAnalysis.chunkWindows(col("text"), ChunkWindow, ChunkStride)).as("ch"))
      .select(col("doc_id"), col("ch.*"))
      .orderBy("doc_id", "chunk_idx")
  }
  val qChunkWindowsSql: String =
    s"""WITH w AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(coalesce(text, ''), '\\s+'),
       |                w -> len(w) > 0) AS words
       |  FROM documents)
       |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
       |  CAST(least($ChunkWindow, len(words) - i * $ChunkStride) AS BIGINT) AS n_tokens,
       |  array_to_string(words[(i * $ChunkStride + 1):(i * $ChunkStride + $ChunkWindow)], ' ')
       |    AS chunk_text
       |FROM w CROSS JOIN range(64) t(i)
       |WHERE i * $ChunkStride < len(words)
       |ORDER BY doc_id, chunk_idx""".stripMargin

  // shared oracle prelude for the span-window queries: whitespace words +
  // every k-token window with its text (range(256) safely covers the
  // shipped ≤100-word docs at every sf)
  private def winsCte(k: Int): String =
    s"""WITH w AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(coalesce(text, ''), '\\s+'),
       |                w -> len(w) > 0) AS words
       |  FROM documents),
       |wins AS (
       |  SELECT doc_id, array_to_string(words[(i+1):(i+$k)], ' ') AS wtext
       |  FROM w CROSS JOIN range(256) t(i)
       |  WHERE i + $k <= len(words))""".stripMargin

  // ---------------------------------------------------------------
  // Exact substring dedup at k-token-window granularity (Lee et al.
  // 2021 re-expressed as bounded hashed-window postings): per-doc
  // window totals and duplicated-window counts. maxOcc=1000 is the
  // boilerplate guard, a no-op at this sf (hottest span ≪ 1000 occs)
  // exactly like q_embed_neardup's occupancy cap — the plan is the
  // bounded one, the rows are the unbounded ones, so the oracle can
  // recompute them by global window counts.
  // ---------------------------------------------------------------
  val SpanK = 8
  def qSpanDedup(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.spanDupStats(tbl(spark, dir, "documents"),
        "doc_id", "text", SpanK, minDup = 2, maxOcc = 1000)
      .select(col("id").as("doc_id"), col("n_windows"), col("n_dup_windows"))
      .orderBy("doc_id")
  val qSpanDedupSql: String =
    s"""${winsCte(SpanK)},
       |g AS (SELECT wtext, count(*) AS n_occ FROM wins GROUP BY wtext),
       |d AS (SELECT wins.doc_id, count(*) AS n_dup_windows
       |      FROM wins JOIN g USING (wtext) WHERE g.n_occ >= 2
       |      GROUP BY wins.doc_id)
       |SELECT w.doc_id,
       |  CAST(greatest(len(words) - ${SpanK - 1}, 0) AS BIGINT) AS n_windows,
       |  CAST(coalesce(d.n_dup_windows, 0) AS BIGINT) AS n_dup_windows
       |FROM w LEFT JOIN d USING (doc_id) ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // Benchmark decontamination (GPT-3 appendix-C n-gram overlap): the
  // deterministic doc_id % 7 == 0 slice plays the eval set; corpus docs
  // sharing any 8-gram with it are contaminated. The benchmark side is
  // small and corpus-independent → broadcast semi-join is the CORRECT
  // plan (vs the banned corpus-growing stop-shingle broadcast).
  // ---------------------------------------------------------------
  def qDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    graft.dedup.Dedup.decontaminate(
        docs.filter(col("doc_id") % 7 =!= 0),
        docs.filter(col("doc_id") % 7 === 0),
        "doc_id", "text", SpanK)
      .select(col("id").as("doc_id"), col("n_hit_windows"))
      .orderBy("doc_id")
  }
  val qDecontaminateSql: String =
    s"""${winsCte(SpanK)},
       |bench AS (SELECT DISTINCT wtext FROM wins WHERE doc_id % 7 = 0)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_windows
       |FROM wins JOIN bench USING (wtext)
       |WHERE doc_id % 7 <> 0
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // Deterministic mixture sampling (the data-mixing stage): per-lang
  // target keep-rates applied as a pure md5-threshold predicate — same
  // verdict per row on any cluster size / partitioning / rerun. The
  // oracle replays the exact row set via the identical lexicographic
  // hex-prefix comparison (see graft.sample.Sampling's contract).
  // ---------------------------------------------------------------
  val MixRates: Map[String, Double] =
    Map("en" -> 0.5, "de" -> 0.9, "fr" -> 1.0, "zh" -> 0.25)
  val MixDefault = 0.75 // es and anything unlisted
  def qMixSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    val keep = graft.sample.Sampling.mixtureKeep(
      col("doc_id"), col("lang"), MixRates, MixDefault)
    docs.groupBy("lang").agg(
        count(lit(1)).as("n_total"),
        sum(keep.cast("long")).as("n_kept"))
      .orderBy("lang")
  }
  val qMixSampleSql: String = {
    val cases = MixRates.toSeq.sorted.map { case (g, r) =>
      s"WHEN lang = '$g' THEN '${graft.sample.Sampling.thresholdHex(r)}'"
    }.mkString("\n|    ")
    s"""SELECT lang, count(*) AS n_total,
       |  CAST(sum(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
       |    CASE $cases
       |    ELSE '${graft.sample.Sampling.thresholdHex(MixDefault)}' END
       |  THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ---------------------------------------------------------------
  // tf-idf term statistics: top-3 salient terms per doc over the
  // (tf, df, N) lattice. The driver-checked ranking is the INTEGER
  // proxy (tf desc, df asc, term asc) — deterministic cross-engine for
  // the same reason k-means quantizes; TextAnalysis.tfidfTopTerms ranks
  // by the real float tf-idf in-engine (ScalaTest-checked against a
  // local reference — one engine, one libm, no cross-engine float
  // ordering to defend).
  // ---------------------------------------------------------------
  def qTfidf(spark: SparkSession, dir: String): DataFrame = {
    val stats = TextAnalysis.termStats(tbl(spark, dir, "documents"), "doc_id", "text")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("tf").desc, col("df").asc, col("term").asc)
    stats.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("id").as("doc_id"), col("rank"), col("term"),
        col("tf"), col("df"), col("n_docs"))
      .orderBy("doc_id", "rank")
  }
  val qTfidfSql: String =
    """WITH words AS (
      |  SELECT doc_id, unnest(list_filter(
      |    regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
      |    w -> len(w) > 0)) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM words GROUP BY 1, 2),
      |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |ranked AS (SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
      |    row_number() OVER (PARTITION BY tf.doc_id
      |      ORDER BY tf.tf DESC, dfreq.df ASC, tf.term) AS rank
      |  FROM tf JOIN dfreq USING (term))
      |SELECT doc_id, rank, term, tf, df,
      |  (SELECT count(*) FROM documents) AS n_docs
      |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin

  // ---------------------------------------------------------------
  // SemDeDup (Abbas et al. 2023): near-dup removal WITHIN trained
  // k-means clusters — centroids trained on the base embeddings via the
  // identical e6-integer chain the q_kmeans oracle unrolls
  // (QueriesR4.kmeansCteChain), the dedup corpus is the planted
  // 1.5×-copy corpus of q_embed_neardup (cosine scale-invariance puts
  // every copy in its original's cluster at sim 1.0), and the oracle
  // replays training + assignment + within-cluster pairing with the
  // contractual dot/(√·√) cosine.
  // ---------------------------------------------------------------
  val SemDedupThreshold = 0.99
  def qSemDedup(spark: SparkSession, dir: String): DataFrame = {
    val cents = graft.sim.Ann.kmeansCentroids(tbl(spark, dir, "embeddings"),
      k = QueriesR4.KmeansK, iters = QueriesR4.KmeansIters, dim = 64)
    graft.sim.Ann.semDedup(QueriesML.embedDedupCorpus(spark, dir), cents,
        threshold = SemDedupThreshold)
      .select(col("vec_id"), col("cluster").cast("long").as("cluster"),
        col("dup_of"), col("sim"))
      .orderBy("vec_id")
  }
  val qSemDedupSql: String = {
    import QueriesR4.{cos, kmeansCteChain}
    s"""WITH $kmeansCteChain,
       |corpus AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + ${QueriesML.EmbedCopyIdOffset},
       |    list_transform(embedding::DOUBLE[], x -> x * 1.5)
       |  FROM embeddings WHERE vec_id % 5 = 0),
       |asg AS (SELECT vec_id, v, cent FROM (
       |   SELECT corpus.vec_id, corpus.v, c.cent,
       |     row_number() OVER (PARTITION BY corpus.vec_id ORDER BY
       |       ${cos("corpus.v", "list_transform(c.cs, x -> x::DOUBLE)")} DESC,
       |       c.cent) AS rk
       |   FROM corpus CROSS JOIN c2 c) WHERE rk = 1),
       |pairs AS (
       |  SELECT b.vec_id, b.cent AS cluster, a.vec_id AS aid,
       |    ${cos("a.v", "b.v")} AS sim
       |  FROM asg a JOIN asg b ON a.cent = b.cent AND a.vec_id < b.vec_id
       |  WHERE ${cos("a.v", "b.v")} >= $SemDedupThreshold)
       |SELECT vec_id, cluster, min(aid) AS dup_of,
       |  round(min_by(sim, aid), 4) AS sim
       |FROM pairs GROUP BY vec_id, cluster ORDER BY vec_id""".stripMargin
  }

  // ---------------------------------------------------------------
  // Canonical text cleanup (NFC + control strip + whitespace collapse):
  // the shipped documents are already NFC and single-spaced, so the
  // query MANGLES them deterministically first — a combining acute after
  // every 'e' (composed back by NFC), a C0 control + double space at
  // each end (stripped/collapsed/trimmed) — and both engines normalize
  // the identical mangled input. Exercises the real composition path of
  // graft.functions.NfcNormalize cross-engine, not just the
  // already-normalized fast path. Codepoint counts before/after pin the
  // length semantics (Spark length == DuckDB len == codepoints).
  // ---------------------------------------------------------------
  def qTextNormalize(spark: SparkSession, dir: String): DataFrame = {
    val mangled = concat(lit("\u0001 "),
      regexp_replace(col("text"), "e", "e\u0301"), lit("  x\u0007"))
    val clean = TextAnalysis.cleanText(mangled)
    tbl(spark, dir, "documents").select(col("doc_id"),
        length(mangled).cast("long").as("n_chars_raw"),
        clean.as("clean_text"),
        length(clean).cast("long").as("n_chars_clean"))
      .orderBy("doc_id")
  }
  val qTextNormalizeSql: String =
    """WITH m AS (
      |  SELECT doc_id, chr(1) || ' ' || replace(text, 'e', 'e' || chr(769))
      |    || '  x' || chr(7) AS raw
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, raw,
      |    trim(regexp_replace(regexp_replace(nfc_normalize(raw),
      |      '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
      |      '\s+', ' ', 'g')) AS clean_text
      |  FROM m)
      |SELECT doc_id, CAST(len(raw) AS BIGINT) AS n_chars_raw, clean_text,
      |  CAST(len(clean_text) AS BIGINT) AS n_chars_clean
      |FROM c ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // Within-document repetition signals (Gopher family) as a pure
  // integer lattice + integer-cross-multiplied keep rule — zero shuffle
  // at any corpus size (per-row array arithmetic only).
  // ---------------------------------------------------------------
  def qDocRepetition(spark: SparkSession, dir: String): DataFrame = {
    val stats = TextAnalysis.repetitionStats(
      tbl(spark, dir, "documents"), "doc_id", "text")
    stats.select(col("id").as("doc_id"), col("n_words"),
        col("n_distinct_words"), col("n_bigrams"), col("n_distinct_bigrams"),
        TextAnalysis.repetitionKeep(col("n_words"), col("n_distinct_words"),
          col("n_bigrams"), col("n_distinct_bigrams")).as("keep"))
      .orderBy("doc_id")
  }
  val qDocRepetitionSql: String =
    """WITH w AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'),
      |                x -> len(x) > 0) AS words
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, words,
      |    [words[i] || ' ' || words[i+1] FOR i IN range(1, len(words))] AS bigrams
      |  FROM w)
      |SELECT doc_id,
      |  CAST(len(words) AS BIGINT) AS n_words,
      |  CAST(len(list_distinct(words)) AS BIGINT) AS n_distinct_words,
      |  CAST(len(bigrams) AS BIGINT) AS n_bigrams,
      |  CAST(len(list_distinct(bigrams)) AS BIGINT) AS n_distinct_bigrams,
      |  ((len(words) = 0 OR len(list_distinct(words)) * 10 >= len(words) * 3)
      |   AND (len(bigrams) = 0
      |        OR len(list_distinct(bigrams)) * 10 >= len(bigrams) * 2)) AS keep
      |FROM b ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // C4 line-level cleanup (Raffel et al. 2020 §2.2): the distinctive
  // WITHIN-page step the doc-level lattices don't cover. Shipped docs
  // are single-line, so the query first synthesizes a multi-line page
  // deterministically (sentence-per-line split plus three planted
  // boilerplate lines — one per drop-rule: a javascript notice, a
  // code-brace line, a short no-punctuation menu line) and both engines
  // clean the identical page. Compared by TEXT EQUALITY on the cleaned
  // page plus the line counts and the ≥3-kept-lines page verdict.
  // ---------------------------------------------------------------
  def qC4Lines(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    // coalesce on BOTH sides: a NULL text mangles to the planted lines
    // alone rather than a NULL page (parity with the oracle's coalesce)
    val raw = concat(
      replace(coalesce(col("text"), lit("")), lit(". "), lit(".\n")),
      lit("\nenable javascript to view this site today." +
        "\nclick here for our full catalog { listing today." +
        "\nmenu home about"))
    TextAnalysis.c4Clean(docs.select(col("doc_id"), raw.as("text")),
        "doc_id", "text")
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }
  val qC4LinesSql: String =
    s"""WITH m AS (
       |  SELECT doc_id, replace(coalesce(text, ''), '. ', '.' || chr(10)) || chr(10) ||
       |    'enable javascript to view this site today.' || chr(10) ||
       |    'click here for our full catalog { listing today.' || chr(10) ||
       |    'menu home about' AS raw
       |  FROM documents),
       |l AS (SELECT doc_id,
       |    -- engine splits on CR?LF; fold CRLF to LF first so corpus text
       |    -- containing CRLF doesn't leave a trailing CR on oracle lines
       |    -- (trim strips spaces only) and flip the terminal-punct rule
       |    list_transform(
       |      string_split(replace(raw, chr(13) || chr(10), chr(10)), chr(10)),
       |      x -> trim(x)) AS lines
       |  FROM m),
       |k AS (SELECT doc_id, lines,
       |    list_filter(lines, t ->
       |      regexp_matches(t, '[.!?"]$$')
       |      AND len(list_filter(regexp_split_to_array(t, '\\s+'),
       |                          w -> len(w) > 0)) >= ${TextAnalysis.C4MinWordsPerLine}
       |      AND NOT contains(lower(t), 'javascript')
       |      AND NOT contains(t, '{')
       |      AND NOT contains(lower(t), 'lorem ipsum')) AS kept
       |  FROM l)
       |SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
       |  CAST(len(kept) AS BIGINT) AS n_kept_lines,
       |  len(kept) >= ${TextAnalysis.C4MinKeptLines} AS keep,
       |  -- array_to_string([]) is NULL in DuckDB; Spark's array_join is ''
       |  coalesce(array_to_string(kept, chr(10)), '') AS clean_text
       |FROM k ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // Bloom-pruned incremental dedup (new-batch-vs-corpus membership):
  // the batch is a deterministic "re-crawl" of every 7th doc under new
  // ids — odd originals get a text edit (genuinely new content, the
  // bloom's true negatives), even ones are byte-identical (the dups).
  // The oracle replays the batch synthesis and the exact LEFT-join
  // verdict; the bloom prune is plan-only (exactness is the verify
  // join's), asserted in DedupSpec.
  // ---------------------------------------------------------------
  def qBloomDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = tbl(spark, dir, "documents")
    val batch = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 9000000L).as("doc_id"),
        when(col("doc_id") % 2 === 1,
            concat(col("text"), lit(" [recrawl edit]")))
          .otherwise(col("text")).as("text"))
    // capacity derived from the batch (expectedItems <= 0): the batch
    // grows with the table (|documents|/7), so a fixed constant would
    // silently over-saturate the filter at larger sf
    graft.dedup.Dedup.incrementalDedup(docs, batch, "doc_id", "text")
      .select(col("id").as("doc_id"), col("n_dups"), col("first_dup"),
        col("is_new"))
      .orderBy("doc_id")
  }
  // ---------------------------------------------------------------
  // Per-source contribution cap: at most k docs per source, the k with
  // the smallest md5(doc_id) — exact-count cousin of q_mix_sample's
  // rate cap. The engine computes it as the TopKSmallest aggregation
  // (O(groups·k) shuffle, no unsplittable hot-group window partition);
  // the oracle replays the identical lexicographic order with a window
  // (fine at oracle scale).
  // ---------------------------------------------------------------
  val SourceCapK = 10
  def qSourceCap(spark: SparkSession, dir: String): DataFrame =
    graft.sample.Sampling.capPerGroup(tbl(spark, dir, "documents"),
        "source", "doc_id", SourceCapK)
      .orderBy("source", "doc_id")
  val qSourceCapSql: String =
    s"""SELECT source, doc_id FROM (
       |  SELECT source, doc_id,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY substring(md5(CAST(doc_id AS VARCHAR)), 1, 16)
       |        || ':' || CAST(doc_id AS VARCHAR)) AS rk
       |  FROM documents) WHERE rk <= $SourceCapK
       |ORDER BY source, doc_id""".stripMargin

  val qBloomDedupSql: String =
    """WITH batch AS (
      |  SELECT doc_id + 9000000 AS id,
      |    CASE WHEN doc_id % 2 = 1 THEN text || ' [recrawl edit]'
      |         ELSE text END AS text
      |  FROM documents WHERE doc_id % 7 = 0)
      |SELECT b.id AS doc_id,
      |  CAST(count(c.doc_id) AS BIGINT) AS n_dups,
      |  min(c.doc_id) AS first_dup,
      |  count(c.doc_id) = 0 AS is_new
      |FROM batch b LEFT JOIN documents c ON b.text = c.text
      |GROUP BY b.id ORDER BY doc_id""".stripMargin
}
