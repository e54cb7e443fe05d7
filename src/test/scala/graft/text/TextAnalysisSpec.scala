package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("text").select(c).collect()(0).get(0)

  test("whitespace and regex token counts") {
    assert(one("the quick brown fox", TextAnalysis.wsTokenCount($"text")) == 4)
    assert(one("", TextAnalysis.wsTokenCount($"text")) == 0)
    assert(one("  a  b ", TextAnalysis.wsTokenCount($"text")) == 2)
    assert(one("ab12,cd", TextAnalysis.regexTokenCount($"text")) == 4) // ab 12 , cd
  }

  test("stopword ratio and quality bounds") {
    assert(one("the cat sat on the mat", TextAnalysis.stopwordRatio($"text")) == 2.0 / 6)
    val q = one("the cat sat on the mat", TextAnalysis.qualityScore($"text"))
      .asInstanceOf[Double]
    assert(q > 0.0 && q <= 1.0)
  }

  test("langId picks the marker-dominant language, unknown when no hits") {
    assert(one("the cat and the dog of war", TextAnalysis.langId($"text")) == "en")
    assert(one("el gato la casa de madrid", TextAnalysis.langId($"text")) == "es")
    assert(one("der hund und das haus", TextAnalysis.langId($"text")) == "de")
    assert(one("xyzzy plugh", TextAnalysis.langId($"text")) == "unknown")
  }

  test("fingerprint matches the local fold and is order-sensitive") {
    def local(text: String): Long = {
      val t = text.trim
      if (t.isEmpty) 7L
      else t.split("\\s+").foldLeft(7L)((acc, w) =>
        (acc * 31 + w.length * 17 + w.charAt(0).toLong) % 1000000007L)
    }
    for (t <- Seq("hello world", "world hello", "a", ""))
      assert(one(t, TextAnalysis.fingerprint($"text")) == local(t), s"fp($t)")
    assert(local("hello world") != local("world hello"))
  }

  test("gopherQuality: integer signals and the five keep-rules") {
    def q(text: String): org.apache.spark.sql.Row =
      Seq(text).toDF("text")
        .select(TextAnalysis.gopherQuality($"text", minWords = 5).as("q"))
        .select("q.*").collect()(0)
    val good = q("the quick brown foxes and dogs jumped over a lazy fence near it")
    assert(good.getAs[Long]("n_words") == 13)
    assert(good.getAs[Long]("total_word_chars") == 51)
    assert(good.getAs[Long]("n_distinct_stops") >= 2)
    assert(good.getAs[Boolean]("keep"))
    // too few words
    assert(!q("the cat").getAs[Boolean]("keep"))
    // no stopword diversity
    assert(!q("cat dog bird fish mouse horse goat").getAs[Boolean]("keep"))
    // repetition: distinct/total < 30%
    assert(!q(("the a " + "spam " * 30).trim).getAs[Boolean]("keep"))
    // mean word length out of [3,10]: single-char soup
    assert(!q("a b c d e f g h the a").getAs[Boolean]("keep"))
    // empty text: zero everywhere, not kept, no crash
    val empty = q("")
    assert(empty.getAs[Long]("n_words") == 0 && !empty.getAs[Boolean]("keep"))
  }

  test("redactPii replaces emails, IPv4s and phones; counts match") {
    val s = "from bob.smith+x@mail.example.org at 192.168.0.1 call +44-555-1234 end"
    assert(one(s, TextAnalysis.redactPii($"text")) ==
      "from <EMAIL> at <IP> call <PHONE> end")
    val c = Seq(s).toDF("text")
      .select(TextAnalysis.piiCounts($"text").as("c")).select("c.*").collect()(0)
    assert(c.getAs[Long]("emails") == 1 && c.getAs[Long]("ips") == 1
      && c.getAs[Long]("phones") == 1)
    // non-PII text passes through untouched (version strings are not IPs:
    // 1.2.3.4 IS ip-shaped, but 1.2.3 is not)
    assert(one("release 1.2.3 shipped", TextAnalysis.redactPii($"text")) ==
      "release 1.2.3 shipped")
  }

  test("chunkWindows: full coverage, overlap, short last chunk, empty text") {
    def chunks(text: String, w: Int, s: Int): Seq[(Long, Long, String)] =
      Seq(text).toDF("text")
        .select(explode(TextAnalysis.chunkWindows($"text", w, s)).as("c"))
        .select("c.*").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val words = (1 to 10).map(i => s"w$i").mkString(" ")
    val got = chunks(words, 4, 3)
    assert(got == Seq(
      (0L, 4L, "w1 w2 w3 w4"), (1L, 4L, "w4 w5 w6 w7"),
      (2L, 4L, "w7 w8 w9 w10"), (3L, 1L, "w10")))
    // every token appears in at least one chunk
    assert(got.flatMap(_._3.split(" ")).toSet == words.split(" ").toSet)
    // stride == window → disjoint cover
    assert(chunks(words, 5, 5).map(_._3) == Seq("w1 w2 w3 w4 w5", "w6 w7 w8 w9 w10"))
    assert(chunks("", 4, 3).isEmpty)
    intercept[IllegalArgumentException](chunks("x", 3, 4)) // stride > window
  }

  private val tfidfCorpus = Seq(
    1L -> "the cat sat on the mat",
    2L -> "the dog sat",
    3L -> "cat cat cat dog",
    4L -> "  ", // blank doc still counts toward N, contributes no terms
    5L -> "unique")

  test("termStats matches a local tf/df/N computation") {
    val df = tfidfCorpus.toDF("doc_id", "text")
    val got = TextAnalysis.termStats(df, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val docs = tfidfCorpus.toMap.view
      .mapValues(_.trim).filter(_._2.nonEmpty)
      .mapValues(_.split("\\s+").map(_.toLowerCase).toSeq).toMap
    val tf = docs.toSeq.flatMap { case (id, ws) =>
      ws.groupBy(identity).map { case (w, g) => (id, w) -> g.size.toLong } }.toMap
    val dfreq = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(got.keySet == tf.keySet)
    for (((id, w), (gTf, gDf, gN)) <- got) {
      assert(gTf == tf((id, w)), s"tf($id,$w)")
      assert(gDf == dfreq(w), s"df($w)")
      assert(gN == 5L, "N counts blank docs too")
    }
  }

  test("tfidfTopTerms ranks by smoothed tf-idf, ties on term asc, k capped") {
    val df = tfidfCorpus.toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(df, "doc_id", "text", k = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.groupBy(_._1).values.forall(_.length <= 2))
    // doc 3: "cat"×3 (df 2) beats "dog"×1 (df 2)
    val d3 = got.filter(_._1 == 3L).sortBy(_._2).map(_._3)
    assert(d3.toSeq == Seq("cat", "dog"))
    // score formula: tf * (ln((N+1)/(df+1)) + 1), rounded to 4
    for ((_, _, _, tf, dfq, s) <- got) {
      val want = math.rint(tf * (math.log(6.0 / (dfq + 1)) + 1) * 10000) / 10000
      assert(math.abs(s - want) < 1e-9)
    }
    // blank doc contributes no rows
    assert(!got.exists(_._1 == 4L))
    // knownCount short-circuits the count job but yields identical rows
    val got2 = TextAnalysis.tfidfTopTerms(df, "doc_id", "text", k = 2,
      knownCount = Some(5L)).collect().map(_.toSeq).toSet
    assert(got2 == got.map(t => Seq(t._1, t._2, t._3, t._4, t._5, t._6)).toSet)
  }

  test("termStats plan: ONE corpus scan (df branch reuses the tf exchange), no cartesian") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val stats = TextAnalysis.termStats(docs, "doc_id", "text", knownCount = Some(500L))
    stats.collect() // materialize so the AQE final plan is in place
    val plan = stats.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), "no cartesian")
    assert(!plan.contains("CartesianProduct"), "no cartesian")
    // the df branch must resume from tf's (id,term) exchange, not
    // re-scan + re-tokenize the corpus (the count(CASE...) guard in
    // termStats exists exactly to keep the subtrees canonically equal)
    assert(plan.contains("ReusedExchange"), "df branch reuses the tf exchange")
    val cut = plan.indexOf("== Initial Plan ==")
    val finalPlan = if (cut >= 0) plan.substring(0, cut) else plan
    assert("FileScan parquet".r.findAllIn(finalPlan).length == 1,
      "corpus scanned exactly once in the final plan")
  }
  test("cleanText: NFC composition, control strip, whitespace collapse, trim") {
    // decomposed e+acute composes; \u0001/\u0007 stripped; runs collapse
    val raw = "\u0001 xe\u0301  y\tz \u0007 "
    assert(one(raw, TextAnalysis.cleanText($"text")) == "x\u00E9 y z")
    // tab/newline/CR are WHITESPACE (collapsed), not stripped as controls
    assert(one("a\tb\nc\rd", TextAnalysis.cleanText($"text")) == "a b c d")
    // vertical tab \u000B is a stripped control, never reaches \s+ --
    // the Java-vs-RE2 \s divergence on \x0B is unobservable by design
    assert(one("a\u000Bb", TextAnalysis.cleanText($"text")) == "ab")
    assert(one("", TextAnalysis.cleanText($"text")) == "")
    assert(one("  already clean  ", TextAnalysis.cleanText($"text")) == "already clean")
  }

  test("repetitionStats: integer lattice matches a local reference") {
    def local(text: String): (Long, Long, Long, Long) = {
      // the contract: non-empty \s+-separated tokens — exact under any
      // leading/trailing whitespace kind (tab, NL), not just spaces
      val ws = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val bg = ws.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toArray
      (ws.length.toLong, ws.distinct.length.toLong,
        bg.length.toLong, bg.distinct.length.toLong)
    }
    val docs = Seq(
      (0L, "a b a b a b"),        // heavy bigram repetition
      (1L, "w x y z"),            // all distinct
      (2L, "solo"),               // one word, zero bigrams
      (3L, ""),                   // empty
      (4L, "Dup dup DUP"),        // case-folded word repetition
      (5L, "\ta b"),              // tab-led: no phantom "" token
      (6L, "a b \n"),             // trailing newline: no phantom token
      (7L, "\t \n"))              // whitespace-only doc = zero words
    val got = TextAnalysis.repetitionStats(
        docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    for ((id, text) <- docs)
      assert(got(id) == local(text), s"doc $id: '$text'")
    // lattice spot values
    assert(got(0L) == ((6L, 2L, 5L, 2L)))
    assert(got(2L) == ((1L, 1L, 0L, 0L)))
    assert(got(3L) == ((0L, 0L, 0L, 0L)))
    assert(got(5L) == ((2L, 2L, 1L, 1L)))
    assert(got(7L) == ((0L, 0L, 0L, 0L)))
  }

  test("repetitionKeep: integer cross-multiplied thresholds") {
    def keep(n: Long, nd: Long, nb: Long, ndb: Long): Boolean =
      Seq((n, nd, nb, ndb)).toDF("n", "nd", "nb", "ndb")
        .select(TextAnalysis.repetitionKeep($"n", $"nd", $"nb", $"ndb"))
        .collect()(0).getBoolean(0)
    assert(keep(10, 3, 9, 2))    // exactly at both thresholds (>= holds)
    assert(!keep(10, 2, 9, 9))   // distinct words below 30%
    assert(!keep(10, 10, 10, 1)) // distinct bigrams below 20%
    assert(keep(0, 0, 0, 0))     // empty doc keeps (no evidence against)
    assert(keep(1, 1, 0, 0))     // single word, no bigrams
  }

  test("c4Clean: each line drop-rule fires independently; page rule is >=3 kept lines") {
    val page = Seq(
      "This sentence has enough words to be kept today.",   // kept
      "Short line here.",                                   // <5 words
      "this line has five words ok",                        // no terminal punct
      "Please enable JavaScript to continue using this.",   // javascript marker
      "A code sample { return 1; } inside the line today.", // brace
      "Lorem ipsum dolor sit amet is placeholder text.",    // lorem ipsum
      "Another proper sentence is retained for the corpus!", // kept (!)
      "He said \"this quoted line also counts fine\""       // kept (closing ")
    ).mkString("\n")
    val df = Seq((1L, page), (2L, "a b.\nc d."), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.c4Clean(df, "doc_id", "text")
    val rows = out.orderBy("id").collect()
    assert(rows(0).getLong(1) == 8 && rows(0).getLong(2) == 3
      && rows(0).getBoolean(3))
    assert(rows(0).getString(4) == Seq(
      "This sentence has enough words to be kept today.",
      "Another proper sentence is retained for the corpus!",
      "He said \"this quoted line also counts fine\"").mkString("\n"))
    // two short lines: counted, none kept, page dropped
    assert(rows(1).getLong(1) == 2 && rows(1).getLong(2) == 0
      && !rows(1).getBoolean(3) && rows(1).getString(4) == "")
    // empty text: split yields one empty line, nothing kept
    assert(rows(2).getLong(1) == 1 && rows(2).getLong(2) == 0
      && !rows(2).getBoolean(3))
    // scale shape: pure per-row array lattice — no shuffle anywhere
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
      "c4Clean must not shuffle")
  }

  test("c4Clean: lines are trimmed before the rules and in the output") {
    val df = Seq((1L, "   Padded but a fully valid sentence stays here.   \nnext"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.c4Clean(df, "doc_id", "text").collect()(0)
    assert(r.getLong(2) == 1
      && r.getString(4) == "Padded but a fully valid sentence stays here.")
  }

  test("word lattices: tab/newline-led text grows no phantom token; NULL text is an empty doc") {
    val df = Seq(
      (1L, "\tfoo bar"),        // tab-led: 2 words, not 3
      (2L, "\t"),               // whitespace-only: 0 words
      (3L, "a  b"),             // run separator: 2 words, mean len 1.0
      (4L, null.asInstanceOf[String])) // NULL: empty doc, integer verdicts
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextAnalysis.wsTokenCount(col("text")).as("n"),
        TextAnalysis.meanTokenLen(col("text")).as("mean"),
        TextAnalysis.fingerprint(col("text")).as("fp"),
        TextAnalysis.gopherQuality(col("text")).getField("keep").as("keep"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getDouble(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(1L)._1 == 2, "tab-led text must count 2 words")
    assert(got(2L)._1 == 0 && got(2L)._3 == 7L)
    assert(got(3L)._1 == 2 && got(3L)._2 == 1.0,
      "mean token length must not count separator runs")
    assert(got(4L)._1 == 0 && !got(4L)._4, "NULL text: defined verdicts, not NULL")
    // stopwords match case-insensitively like gopherQuality
    val sr = df.sparkSession.range(1).select(
      TextAnalysis.stopwordRatio(lit("The cat sat"))).collect()(0).getDouble(0)
    assert(math.abs(sr - 1.0 / 3) < 1e-9, s"sentence-initial 'The' must count, got $sr")
  }

  test("dedupLines: hot lines cut by trimmed-form df, rest kept verbatim in order") {
    val docs = Seq(
      (1L, "unique opening line\nCopyright 2024\nbody one\n  Copyright 2024  "),
      (2L, "Copyright 2024\nbody two"),
      (3L, "body three\nCopyright 2024"),
      (4L, "no boilerplate here\n\ntrailing blank kept")
    ).toDF("doc_id", "text")
    val got = graft.text.TextAnalysis.dedupLines(docs, "doc_id", "text", minDf = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // 'Copyright 2024' (trimmed) appears in 3 distinct docs → cut
    // EVERYWHERE, including doc 1's space-padded variant; doc 1's other
    // lines keep their exact bytes and order
    assert(got(0) == ((1L, 4L, 2L, "unique opening line\nbody one")))
    assert(got(1) == ((2L, 2L, 1L, "body two")))
    assert(got(2) == ((3L, 2L, 1L, "body three")))
    // blank lines never count as duplicates and are kept verbatim
    assert(got(3) == ((4L, 3L, 3L, "no boilerplate here\n\ntrailing blank kept")))
    // below the threshold nothing is cut
    val none = graft.text.TextAnalysis.dedupLines(docs, "doc_id", "text", minDf = 4)
      .agg(org.apache.spark.sql.functions.sum(col("n_lines") - col("n_kept")))
      .collect()(0).getLong(0)
    assert(none == 0L)
  }

  test("hashedLinearScore: features, buckets and sigmoid match a local replay") {
    val b = 64
    // constant weights make the score a pure feature-count check first
    val ones = Array.fill(b)(0.5)
    val r1 = Seq("The cat sat").toDF("text")
      .select(TextAnalysis.hashedLinearScore(col("text"), ones, b).as("s"))
      .select(col("s.n_feats"), col("s.score")).collect()(0)
    // 3 unigrams + 2 bigrams; mean weight 0.5 → sigmoid(0.5)
    assert(r1.getLong(0) == 5L)
    assert(math.abs(r1.getDouble(1) - 1.0 / (1.0 + math.exp(-0.5))) < 1e-12)
    // varying weights: replay buckets + weights locally
    val weights = (0 until b).map(i => ((i.toLong * 2654435761L) % 2000L) / 1000.0 - 1.0)
    val wCol = weights.toArray
    def bucket(f: String): Int = {
      val mid = (f.length + 1) / 2
      ((f.length * 97L + f.charAt(0).toLong * 961L
        + f.charAt(mid - 1).toLong * 31L + f.charAt(f.length - 1).toLong) % b).toInt
    }
    val text = "alpha beta gamma alpha"
    val toks = text.split("\\s+").toSeq
    val feats = toks ++ toks.sliding(2).map(_.mkString("_"))
    val expected = 1.0 / (1.0 + math.exp(-(feats.map(f => weights(bucket(f))).sum / feats.size)))
    val r2 = Seq(text).toDF("text")
      .select(TextAnalysis.hashedLinearScore(col("text"), wCol, b).as("s"))
      .select(col("s.n_feats"), col("s.score")).collect()(0)
    assert(r2.getLong(0) == feats.size.toLong)
    assert(math.abs(r2.getDouble(1) - expected) < 1e-12, s"got ${r2.getDouble(1)} want $expected")
    // empty/NULL docs: zero features → sigmoid(bias) = 0.5 at bias 0
    val r3 = Seq[String](null).toDF("text")
      .select(TextAnalysis.hashedLinearScore(col("text"), ones, b).as("s"))
      .select(col("s.n_feats"), col("s.score")).collect()(0)
    assert(r3.getLong(0) == 0L && r3.getDouble(1) == 0.5)

    // the staged DataFrame form (one tree evaluation per row — the
    // corpus-scale spelling) is bit-identical to the Column form on
    // real documents, including NULLs and single-word docs
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val viaCol = docs.select(col("doc_id"),
        TextAnalysis.hashedLinearScore(col("text"), wCol.toArray, b).as("s"))
      .select(col("doc_id"), col("s.n_feats"), col("s.score"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val viaDf = TextAnalysis.hashedLinearScoreDf(docs, "text", wCol.toArray, b)
      .select(col("doc_id"), col("s.n_feats"), col("s.score"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(viaDf == viaCol)
  }

  test("charTrigramLm: normalization classes, bounded model, local score replay") {
    val ref = Seq((0L, "The cat sat, 42 times!"), (1L, "the cat ran")).toDF("doc_id", "text")
    // normalization: ws→' ', non-alnum runs→one '_', lower, digits→'0'
    val norm = ref.select(graft.text.CharTrigramLm.normalize(col("text")))
      .collect().map(_.getString(0))
    assert(norm(0) == "the cat sat_ 00 times_")
    assert(norm(1) == "the cat ran")
    val tri = graft.text.CharTrigramLm.train(ref, "text")
    // model is alphabet-bounded and counts real occurrences: "the" once
    // per doc, " ca" twice, never more groups than distinct trigrams
    assert(tri("the") == 2L && tri(" ca") == 2L && tri("at_") == 1L)
    assert(tri.keys.forall(_.length == 3))
    // local replay of the scored sum on a held-out doc
    val bi = graft.text.CharTrigramLm.prefixCounts(tri)
    val doc = "the cat"
    val expected = (0 until doc.length - 2).map { i =>
      val t = doc.substring(i, i + 3)
      math.log10((tri.getOrElse(t, 0L) + 1.0) /
        (bi.getOrElse(t.substring(0, 2), 0L) + 29.0))
    }.sum
    val got = Seq(doc).toDF("text")
      .select(graft.text.CharTrigramLm.score(col("text"), tri).as("s"))
      .select(col("s.n_tri"), col("s.sum_logprob")).collect()(0)
    assert(got.getLong(0) == 5L)
    assert(math.abs(got.getDouble(1) - expected) < 1e-12)
    // in-reference text scores higher (less negative) than gibberish
    def mean(s: String): Double = {
      val r = Seq(s).toDF("text")
        .select(graft.text.CharTrigramLm.score(
          graft.text.CharTrigramLm.normalize(col("text")), tri).as("x"))
        .select(col("x.sum_logprob") / col("x.n_tri")).collect()(0).getDouble(0)
      r
    }
    assert(mean("the cat sat") > mean("zqxj wvkp zzz"),
      "reference-like text must out-score gibberish")
    // short/empty docs: zero trigrams, zero sum (callers null the mean)
    val empty = Seq("ab").toDF("text")
      .select(graft.text.CharTrigramLm.score(col("text"), tri).as("s"))
      .select(col("s.n_tri"), col("s.sum_logprob")).collect()(0)
    assert(empty.getLong(0) == 0L && empty.getDouble(1) == 0.0)
  }

  test("trigramCounts aggregate equals the explode-and-groupBy spelling on real docs") {
    // the one-pass bounded aggregate must count EXACTLY what the old
    // materialize-array-then-explode spelling counted — same model, only
    // the constant factor changed
    import org.apache.spark.sql.functions.{transform => sqlTransform, _}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fast = graft.text.CharTrigramLm.train(docs, "text")
    val s = graft.text.CharTrigramLm.normalize(col("text"))
    val tris = when(length(s) >= 3,
        sqlTransform(sequence(lit(0), length(s) - 3), i => s.substr(i + 1, lit(3))))
      .otherwise(array().cast("array<string>"))
    val slow = docs.select(explode(tris).as("tri"))
      .groupBy("tri").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fast == slow, {
      val onlyFast = (fast.keySet -- slow.keySet).take(5)
      val onlySlow = (slow.keySet -- fast.keySet).take(5)
      val diff = fast.keySet.intersect(slow.keySet).filter(k => fast(k) != slow(k)).take(5)
      s"model mismatch: fast-only=$onlyFast slow-only=$onlySlow diffcounts=$diff"
    })
    assert(fast.nonEmpty && fast.size <= 29 * 29 * 29)
  }

  test("c4Clean handles CRLF pages (trailing \\r must not fail the punctuation rule)") {
    val page = Seq(
      "This is a perfectly fine sentence for the corpus.",
      "Another proper sentence is retained here today.",
      "A third fine sentence keeps the page alive.").mkString("\r\n")
    val r = TextAnalysis.c4Clean(Seq((1L, page)).toDF("doc_id", "text"),
      "doc_id", "text").collect()(0)
    assert(r.getLong(2) == 3 && r.getBoolean(3),
      s"CRLF page must keep all 3 lines, got ${r.getLong(2)}")
    assert(!r.getString(4).contains("\r"))
  }

  test("sourceOverlap: hand-counted intersections/unions; near-mirror pair ranks by overlap") {
    import spark.implicits._
    // s1 vocab {a,b,c,d}; s2 = near-mirror {a,b,c}; s3 disjoint-ish {x,y,b}
    val docs = Seq(
      (1L, "s1", "a b c"), (2L, "s1", "c d"),
      (3L, "s2", "a b"), (4L, "s2", "c a"),
      (5L, "s3", "x y"), (6L, "s3", "b x"),
      (7L, "s1", "UPPER 123 IGNORED")) // non-[a-z]+ terms dropped
      .toDF("doc_id", "source", "text")
    val got = graft.text.TextAnalysis.sourceOverlap(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // vocab sizes: s1 {a,b,c,d}=4, s2 {a,b,c}=3, s3 {x,y,b}=3
    assert(got(("s1", "s2")) == ((3L, 4L)))  // ∩ {a,b,c}, ∪ {a,b,c,d}
    assert(got(("s1", "s3")) == ((1L, 6L)))  // ∩ {b}
    assert(got(("s2", "s3")) == ((1L, 5L)))  // ∩ {b}
    // the near-mirror pair has the highest Jaccard (cross-multiplied compare)
    val (iMirror, uMirror) = got(("s1", "s2"))
    got.filterNot(_._1 == ("s1", "s2")).values.foreach { case (i, u) =>
      assert(iMirror * u > i * uMirror, "mirror pair must rank first")
    }
  }
}
