package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis family for training-data pipelines (driver contract
  * BASELINE.json north star; SURVEY.md §2.C X4): token frequency, token
  * counting, language-ID heuristic, quality scoring, document
  * fingerprinting. All pure codegen'd built-ins (split / higher-order
  * functions / md5) — no UDFs, so every query stays inside whole-stage
  * codegen and remains DuckDB-oracle-checkable.
  *
  * Scale notes: everything here is embarrassingly parallel per document
  * except `q_text_tokens` (one exchange on token, partial-aggregated map
  * side first, so the shuffle carries (token, partial count) — bounded by
  * vocabulary × partitions, not corpus size).
  */
object TextAnalysis {
  type Q = (SparkSession, String) => DataFrame

  private def toks = Analyzer.default.tokens(col("text"))

  /** Shared 3-gram shingling (also used by Dedup): word 3-grams per
    * document, duplicates included — consumers dedupe inside their own
    * aggregation (collect_set / countDistinct), which avoids a full
    * distinct shuffle of the shingle table. */
  def shingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= 3)
      // Fan the documents out across the cluster BEFORE the explode: the
      // source may be few files (here: one), and the 500× row expansion +
      // downstream aggregation must not run at the source's parallelism.
      .repartition(col("doc_id"))
      .select(col("doc_id"), explode(
        expr("transform(sequence(1, size(t) - 2), i -> concat_ws(' ', slice(t, i, 3)))")).as("s"))

  private def qTextTokens(spark: SparkSession, dir: String): DataFrame =
    // Vocabulary statistics read the MATERIALIZED postings — `n` is the
    // occurrence count (Σ tf) the index already carries — not the corpus:
    // Solr serves term stats from its standing index the same way.
    Index.sharedPostings(spark, dir)
      .select(col("tok"), col("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(50)

  /** Context-window size (tokens) and stride for [[qTextChunks]] — W−S
    * tokens of overlap so no boundary context is lost between chunks. */
  private val ChunkW = 32
  private val ChunkS = 24

  /** Context-window chunking — the step between curation and
    * `q_pack_batches` in a training pipeline: every document becomes
    * ceil(max(n−w, 0)/s) + 1 windows of ≤ w tokens at stride s, each
    * chunk carrying its provenance (doc_id, chunk_id) and token count;
    * consecutive chunks overlap w−s tokens so no boundary context is
    * lost. Pure per-row codegen (transform + posexplode over the one
    * token array): embarrassingly parallel, no shuffle — the shape that
    * holds verbatim at 100 TB. */
  def chunks(docs: DataFrame, w: Int, s: Int): DataFrame = {
    require(w > 0 && s > 0 && s <= w, s"need 0 < stride <= window, got w=$w s=$s")
    docs
      .select(col("doc_id"), toks.as("t"))
      .withColumn("n", size(col("t")))
      .withColumn("nch",
        (ceil(greatest(col("n") - w, lit(0)).cast("double") / s) + 1)
          .cast("int"))
      .select(col("doc_id"), col("n"), posexplode(expr(
        s"transform(sequence(0, nch - 1), " +
          s"k -> array_join(slice(t, k * $s + 1, $w), ' '))")))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        least(lit(w), col("n") - col("pos") * s).cast("long").as("n_tok"),
        col("col").as("chunk_text"))
  }

  private def qTextChunks(spark: SparkSession, dir: String): DataFrame =
    chunks(Tables.documents(spark, dir), ChunkW, ChunkS)
      .orderBy("doc_id", "chunk_id")

  private def qTokenCount(spark: SparkSession, dir: String): DataFrame =
    // Whitespace tokens + a BPE-ish alnum-run count (regex word pieces).
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(toks).cast("long").as("n_ws"),
        size(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).cast("long").as("n_alnum"),
        col("n_chars"))
      .orderBy("doc_id")

  private val stopwords = Seq("the", "a", "of", "and", "in")

  /** Stopword-token ratio of a token-array column (function-word density —
    * the language-ID / quality signal). */
  def stopRatio(tokens: Column): Column = {
    val isStop: Column => Column = t => stopwords.map(t === _).reduce(_ || _)
    size(filter(tokens, isStop)) * lit(1.0) / size(tokens)
  }

  private def qLangId(spark: SparkSession, dir: String): DataFrame = {
    // n-gram/stopword-ratio language-ID heuristic: English function-word
    // density. (The fixture corpus shares one vocabulary across langs, so
    // this demonstrates the operator shape, not a tuned classifier.)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), stopRatio(toks).as("ratio0"))
      .select(col("doc_id"), col("lang"),
        when(col("ratio0") >= 0.12, "en").otherwise("other").as("pred_lang"),
        round(col("ratio0"), 4).as("stop_ratio"))
      .orderBy("doc_id")
  }

  private def qQualityScore(spark: SparkSession, dir: String): DataFrame =
    // Quality scoring: length band, type-token ratio, average token length.
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_unique"))
      .withColumn("ttr", round(col("n_unique") * lit(1.0) / col("n_tokens"), 4))
      .withColumn("avg_tok_len",
        round((col("n_chars") - (col("n_tokens") - 1)) * lit(1.0) / col("n_tokens"), 4))
      // quality derives from the UNROUNDED ratio: rounding a previously
      // rounded value manufactures exact decimal halves (e.g. 0.7333/2 =
      // 0.36665) where Spark (BigDecimal HALF_UP on the shortest decimal
      // repr) and DuckDB (binary-value rounding) disagree. Raw ratios with
      // denominators ≤ 2·99 can only hit a 4-decimal half if binary-exact,
      // where both engines round identically.
      .withColumn("quality",
        round(when(col("n_tokens").between(20, 80), lit(1.0)).otherwise(lit(0.5)) *
          (col("n_unique") * lit(1.0) / col("n_tokens")), 4))
      .orderBy("doc_id")

  private def qUnigramLogprob(spark: SparkSession, dir: String): DataFrame = {
    // Perplexity-style quality signal from a corpus-level unigram LM:
    // per-document mean negative log-probability of its tokens under the
    // corpus distribution. High nll = improbable vocabulary = candidate
    // for filtering. The LM "training" is one aggregation; scoring is a
    // broadcast join of the (vocabulary-sized) frequency table — the
    // corpus scan never shuffles.
    val docToks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(toks).as("tok"))
    // the LM itself comes from the MATERIALIZED postings (occurrence
    // counts) — only the per-doc scoring pass reads the corpus
    val freq = Index.sharedPostings(spark, dir)
      .select(col("tok"), col("n").as("cnt"))
    // total token count from the vocabulary-sized freq table — not a
    // second full corpus scan
    val tot = freq.agg(sum(col("cnt")).as("tot"))
    docToks.join(broadcast(freq), "tok")
      .crossJoin(broadcast(tot))
      .groupBy("doc_id")
      .agg(round(-sum(log(col("cnt") / col("tot"))) / count(lit(1)), 4).as("nll"))
      .orderBy("doc_id")
  }

  /** Share of word-bigram slots taken by the most frequent bigram of a
    * token-array column — the Gopher top-2-gram repetition signal as a
    * reusable PURE per-row expression, so it composes into
    * [[graft.streaming.IngestPipeline]]'s `admitIf` quality gate the same
    * way [[stopRatio]] does. NULL for texts of fewer than two tokens
    * (no bigram exists; a gate should decide short texts by length, not
    * by repetition). */
  def topBigramFrac(tokens: Column): Column =
    when(size(tokens) >= 2,
      repStats(tokens).getField("top_bigram_n") * lit(1.0) /
        (size(tokens) - 1))

  /** Share of tokens taken by the most frequent token — the companion
    * single-word repetition signal. NULL for empty token arrays. */
  def topWordFrac(tokens: Column): Column =
    when(size(tokens) >= 1,
      repStats(tokens).getField("top_word_n") * lit(1.0) / size(tokens))

  /** The ONE repetition-statistics kernel in this file — `q_repetition`
    * and the gate predicates ([[topBigramFrac]]/[[topWordFrac]]) all read
    * it, so the signal cannot fork: word and adjacent-bigram max
    * frequency + cardinality in one compiled pass
    * ([[graft.functions.RunLengthStats]] — the higher-order
    * `array_sort`+`aggregate` lambda form it replaces evaluates
    * interpreted and was the suite's slowest key; the expression sorts
    * token indices with compiled comparisons and never materializes a
    * bigram string. RepetitionSpec pins the lambda equivalence). */
  private def repStats(tokens: Column): Column =
    graft.functions.RunLengthStats.run_length_stats(tokens)

  private def qRepetition(spark: SparkSession, dir: String): DataFrame =
    // Repetition signals (the Gopher/MassiveText repetition filters): the
    // fraction of a document occupied by its most frequent word bigram,
    // the fraction of bigram occurrences that are repeats, and the most
    // frequent single word's share of all tokens. Excessive repetition is
    // the canonical generated/boilerplate-text tell a corpus build filters
    // on. All three are PURE PER-ROW array expressions — no explode, no
    // exchange, no shuffle: each document computes its own signal and the
    // plan is a single scan-project, the shape that scales to 100 TB by
    // adding executors. Frequency stats come from the ONE compiled
    // repetition kernel ([[repStats]]), O(len log len) per doc.
    Tables.documents(spark, dir)
      .select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= 2)
      .withColumn("rs", repStats(col("t")))
      .select(col("doc_id"),
        (size(col("t")) - 1).cast("long").as("n_bigrams"),
        col("rs.top_bigram_n").as("top_bigram_n"),
        col("rs.n_distinct_bigrams").as("n_distinct_bigrams"),
        col("rs.top_word_n").as("top_word_n"),
        size(col("t")).cast("long").as("n_tokens"))
      .withColumn("top_bigram_frac",
        round(col("top_bigram_n") * lit(1.0) / col("n_bigrams"), 4))
      .withColumn("dup_bigram_frac",
        round(lit(1.0) - col("n_distinct_bigrams") * lit(1.0) / col("n_bigrams"), 4))
      .withColumn("top_word_frac",
        round(col("top_word_n") * lit(1.0) / col("n_tokens"), 4))
      .orderBy("doc_id")

  /** Per-document min-shingle fingerprints (winnowing anchor + distinct
    * shingle count), MATERIALIZED once per session: the same artifact is
    * q_fingerprint's output AND the contamination check's match key, and
    * at scale it is a standing per-doc index column maintained alongside
    * the corpus, not a per-query recompute. A scope registered against a
    * maintained state is fed from the live docs the changelog keeps
    * current (`IncrementalShingles.liveDocs`) — the fingerprint is a pure
    * per-doc function of `text`, and each state merge invalidates the
    * artifact, so no corpus rescan AND no staleness. */
  private[graft] def sharedFingerprints(spark: SparkSession, dir: String): DataFrame =
    Materialize.artifact(spark, "doc_fingerprints", dir)(
      shingles(graft.streaming.IncrementalShingles.liveDocs(spark, dir))
        .groupBy("doc_id")
        .agg(min(md5(col("s"))).as("fp"), countDistinct(col("s")).as("n_shingles")))

  private def qFingerprint(spark: SparkSession, dir: String): DataFrame =
    // Document fingerprint: min-hash over rolling 3-gram shingles (md5 as
    // the rolling hash; the lexicographic min of hashes is the winnowing
    // anchor). Constant-size output per doc regardless of doc length.
    sharedFingerprints(spark, dir)
      .select("doc_id", "fp", "n_shingles")
      .orderBy("doc_id")

  private def qBoilerplateNgrams(spark: SparkSession, dir: String): DataFrame =
    // Corpus-level boilerplate detection — the C4/RefinedWeb "most common
    // n-grams" pass: 3-grams ranked by DOCUMENT frequency, i.e. how many
    // distinct docs carry the gram (within-doc spam is q_repetition's
    // signal, not this one's). Two-phase distinct aggregation: the
    // shuffle carries each (gram, doc) pair once, the final top-k is a
    // TakeOrdered — no corpus-sized sort. The output is the removal list
    // a corpus build subtracts, the same way the repetition signals feed
    // the ingest gate's admitIf.
    shingles(Tables.documents(spark, dir))
      .groupBy(col("s"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .select(col("s").as("gram"), col("n_docs"))
      .orderBy(col("n_docs").desc, col("gram"))
      .limit(20)

  /** Document-level co-occurrence pair counts (tok_a < tok_b, n_ab),
    * MATERIALIZED once per session — the corpus statistic PMI mining
    * reads, vocabulary²-bounded (distinct sorted pairs, never
    * occurrences). Unthresholded: the n_ab cutoff is the QUERY's
    * constant, not the statistic's. */
  private[graft] def sharedCoocCounts(spark: SparkSession, dir: String): DataFrame =
    Materialize.artifact(spark, "cooc_pair_counts", dir) {
      val ts = array_sort(array_distinct(toks))
      Tables.documents(spark, dir)
        .select(ts.as("t"))
        .select(posexplode(col("t")).as(Seq("i", "tok_a")), col("t"))
        .select(col("tok_a"),
          explode(slice(col("t"), col("i") + lit(2), size(col("t")))).as("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(count(lit(1)).as("n_ab"))
    }

  /** Adjacent-bigram occurrence counts ((a, b), n_ab), MATERIALIZED once
    * per session — the bigram LM table beside the unigram one the
    * postings already carry. Bounded by distinct adjacent pairs. */
  private[graft] def sharedBigramCounts(spark: SparkSession, dir: String): DataFrame =
    Materialize.artifact(spark, "bigram_counts", dir) {
      Tables.documents(spark, dir).select(toks.as("t"))
        .filter(size(col("t")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS a, t[i] AS b))"))
          .as("bg"))
        .groupBy(col("bg.a").as("tok_a"), col("bg.b").as("tok_b"))
        .agg(count(lit(1)).as("n_ab"))
    }

  private def qCollocations(spark: SparkSession, dir: String): DataFrame = {
    // PMI collocation mining — which word pairs co-occur in documents far
    // more than their independent document frequencies predict (the
    // statistical phrase/topic-pair signal a corpus analysis runs; PMI =
    // ln(P(a,b) / (P(a)·P(b))) over document-level co-occurrence).
    // Pair GENERATION is per-row — sorted distinct tokens expand to their
    // O(k²) combinations through two chained GENERATORS (posexplode, then
    // explode of the remaining suffix), no self-join — so the only
    // exchanges are vocabulary²-bounded aggregates of (pair, partial
    // count), never a corpus-sized join: the self-join formulation
    // shuffles the exploded token table twice and its skew follows doc
    // length. Generators stay on the whole-stage-codegen path; the
    // equivalent nested higher-order `transform` lambdas fall back to
    // interpreted evaluation and ran ~10× slower at sf0.1.
    // Round 17 (guide §2.4 via the Materialize seam): the document-level
    // co-occurrence counts are a standing corpus statistic — vocabulary²-
    // bounded, like the postings they sit beside — so the O(k²) per-doc
    // pair expansion builds ONCE per session instead of inside every
    // call; df(tok) is read from the postings artifact (same analyzer —
    // distinct-docs-per-token IS the posting list's df), which removes
    // the second full corpus explode this query ran per call. Only the
    // broadcast joins, the n_ab threshold (a query constant, kept OUT of
    // the artifact) and the PMI arithmetic remain per query.
    val pairs = sharedCoocCounts(spark, dir)
    val dfreq = Index.sharedPostings(spark, dir)
      .select(col("tok"), col("df"))
    val nDocs = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    pairs
      .join(broadcast(dfreq.select(col("tok").as("tok_a"), col("df").as("df_a"))), "tok_a")
      .join(broadcast(dfreq.select(col("tok").as("tok_b"), col("df").as("df_b"))), "tok_b")
      .crossJoin(broadcast(nDocs))
      .filter(col("n_ab") >= 20)
      .select(col("tok_a"), col("tok_b"), col("n_ab"),
        // Products go through double BEFORE multiplying: n_ab·n_docs (and
        // df_a·df_b) as long×long overflows Long at ~100 TB corpus counts
        // and, with ANSI off, wraps silently. DuckDB's oracle does the
        // same double arithmetic.
        round(log(col("n_ab").cast("double") * col("n_docs") /
          (col("df_a").cast("double") * col("df_b"))), 4)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("tok_a"), col("tok_b"))
      .limit(20)
  }

  private def qBigramPmi(spark: SparkSession, dir: String): DataFrame = {
    // Classic collocation extraction — PMI over ADJACENT token pairs
    // (the Church&Hanks statistic; q_collocations is its document-level
    // cousin): which bigrams occur far more often than their unigram
    // frequencies predict. Occurrence-weighted: P(a,b) over all bigram
    // slots, P(a)/P(b) over all token slots. Bigram generation is the
    // same per-row sequence/slice expression q_repetition uses — one
    // scan, no join; the aggregates are vocabulary²-bounded and the two
    // frequency tables broadcast into the scorer.
    // Round 17: the bigram table is the [[sharedBigramCounts]] session
    // artifact and the unigram table reads the postings artifact's
    // occurrence counts (same analyzer; Σ tf per token IS the unigram
    // count) — the two full corpus explode+aggregate passes this query
    // re-ran per call now build once per session. Totals come from the
    // two vocabulary-sized tables, exactly as before.
    val bigrams = sharedBigramCounts(spark, dir)
    val unigrams = Index.sharedPostings(spark, dir)
      .select(col("tok"), col("n").as("cnt"))
    val totals = unigrams.agg(sum(col("cnt")).as("n_toks"))
      .crossJoin(bigrams.agg(sum(col("n_ab")).as("n_bgs")))
    bigrams
      .join(broadcast(unigrams.select(col("tok").as("tok_a"), col("cnt").as("cnt_a"))), "tok_a")
      .join(broadcast(unigrams.select(col("tok").as("tok_b"), col("cnt").as("cnt_b"))), "tok_b")
      .crossJoin(broadcast(totals))
      .filter(col("n_ab") >= 30)
      .select(col("tok_a"), col("tok_b"), col("n_ab"),
        round(log((col("n_ab") / col("n_bgs")) /
          ((col("cnt_a") / col("n_toks")) * (col("cnt_b") / col("n_toks")))), 4)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("tok_a"), col("tok_b"))
      .limit(20)
  }

  val queries: Map[String, Q] = Map(
    "q_bigram_pmi" -> qBigramPmi,
    "q_collocations" -> qCollocations,
    "q_boilerplate_ngrams" -> qBoilerplateNgrams,
    "q_text_tokens" -> qTextTokens,
    "q_text_chunks" -> qTextChunks,
    "q_token_count" -> qTokenCount,
    "q_lang_id" -> qLangId,
    "q_quality_score" -> qQualityScore,
    "q_unigram_logprob" -> qUnigramLogprob,
    "q_repetition" -> qRepetition,
    "q_fingerprint" -> qFingerprint)

  /** DuckDB-side shingle CTE shared by the oracle strings (mirrors
    * `shingles`). */
  val shingleCte: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (
      |  SELECT DISTINCT doc_id, array_to_string(list_slice(t, i, i + 2), ' ') AS s
      |  FROM toks, unnest(generate_series(1, len(t) - 2)) AS g(i))""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_boilerplate_ngrams" ->
      (shingleCte +
        """
          |SELECT s AS gram, count(*) AS n_docs
          |FROM sh GROUP BY 1 ORDER BY n_docs DESC, gram LIMIT 20""".stripMargin),
    "q_text_tokens" ->
      """SELECT tok, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |GROUP BY 1 ORDER BY n DESC, tok LIMIT 50""".stripMargin,
    "q_text_chunks" ->
      """WITH c AS (
        |  SELECT doc_id, string_split(text, ' ') AS t,
        |         len(string_split(text, ' ')) AS n
        |  FROM documents)
        |SELECT doc_id, k AS chunk_id,
        |       least(32, n - k * 24) AS n_tok,
        |       array_to_string(list_slice(t, k * 24 + 1, k * 24 + 32), ' ') AS chunk_text
        |FROM c, unnest(generate_series(0,
        |       cast(ceil(greatest(n - 32, 0) / 24.0) AS bigint))) AS g(k)
        |ORDER BY doc_id, chunk_id""".stripMargin,
    "q_token_count" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_ws,
        |       len(regexp_extract_all(text, '[a-z0-9]+')) AS n_alnum, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_lang_id" ->
      """SELECT doc_id, lang,
        |       CASE WHEN ratio0 >= 0.12 THEN 'en' ELSE 'other' END AS pred_lang,
        |       round(ratio0, 4) AS stop_ratio
        |FROM (
        |  SELECT doc_id, lang,
        |         len(list_filter(string_split(text, ' '),
        |             t -> t IN ('the', 'a', 'of', 'and', 'in'))) * 1.0
        |           / len(string_split(text, ' ')) AS ratio0
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q_quality_score" ->
      """SELECT doc_id, n_chars, n_tokens, n_unique, ttr, avg_tok_len,
        |       round(CASE WHEN n_tokens BETWEEN 20 AND 80 THEN 1.0 ELSE 0.5 END
        |             * (n_unique * 1.0 / n_tokens), 4) AS quality
        |FROM (
        |  SELECT doc_id, n_chars, n_tokens, n_unique,
        |         round(n_unique * 1.0 / n_tokens, 4) AS ttr,
        |         round((n_chars - (n_tokens - 1)) * 1.0 / n_tokens, 4) AS avg_tok_len
        |  FROM (
        |    SELECT doc_id, n_chars,
        |           len(string_split(text, ' ')) AS n_tokens,
        |           len(list_distinct(string_split(text, ' '))) AS n_unique
        |    FROM documents))
        |ORDER BY doc_id""".stripMargin,
    "q_bigram_pmi" ->
      """WITH d AS (
        |  SELECT string_split(text, ' ') AS t FROM documents),
        |bg AS (
        |  SELECT t[i] AS tok_a, t[i+1] AS tok_b, count(*) AS n_ab
        |  FROM d, unnest(generate_series(1, len(t) - 1)) AS g(i)
        |  WHERE len(t) >= 2
        |  GROUP BY 1, 2),
        |uni AS (
        |  SELECT tok, count(*) AS cnt FROM (
        |    SELECT unnest(t) AS tok FROM d) GROUP BY 1),
        |tot AS (
        |  SELECT (SELECT sum(cnt) FROM uni) AS n_toks,
        |         (SELECT sum(n_ab) FROM bg) AS n_bgs)
        |SELECT tok_a, tok_b, n_ab,
        |       round(ln((n_ab / n_bgs) /
        |             ((ua.cnt / n_toks) * (ub.cnt / n_toks))), 4) AS pmi
        |FROM bg
        |JOIN uni ua ON ua.tok = bg.tok_a
        |JOIN uni ub ON ub.tok = bg.tok_b, tot
        |WHERE n_ab >= 30
        |ORDER BY pmi DESC, tok_a, tok_b LIMIT 20""".stripMargin,
    "q_collocations" ->
      """WITH d AS (
        |  SELECT doc_id, list_sort(list_distinct(string_split(text, ' '))) AS t
        |  FROM documents),
        |toks AS (SELECT doc_id, unnest(t) AS tok FROM d),
        |dfreq AS (SELECT tok, count(*) AS df FROM toks GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |pairs AS (
        |  SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_ab
        |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.tok < b.tok
        |  GROUP BY 1, 2)
        |SELECT tok_a, tok_b, n_ab,
        |       round(ln(n_ab * n_docs / (fa.df * fb.df)), 4) AS pmi
        |FROM pairs
        |JOIN dfreq fa ON fa.tok = pairs.tok_a
        |JOIN dfreq fb ON fb.tok = pairs.tok_b, n
        |WHERE n_ab >= 20
        |ORDER BY pmi DESC, tok_a, tok_b LIMIT 20""".stripMargin,
    "q_unigram_logprob" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
        |tot AS (SELECT count(*) AS tot FROM toks)
        |SELECT doc_id, round(-sum(ln(cnt / tot)) / count(*), 4) AS nll
        |FROM toks JOIN freq USING (tok), tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_repetition" ->
      """WITH b AS (
        |  SELECT doc_id, string_split(text, ' ') AS t,
        |         list_transform(generate_series(1, len(string_split(text, ' ')) - 1),
        |                        i -> array_to_string(list_slice(string_split(text, ' '), i, i + 1), ' ')) AS bg
        |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
        |c AS (
        |  SELECT doc_id,
        |         len(bg) AS n_bigrams,
        |         list_max(list_transform(list_distinct(bg),
        |                                 x -> len(list_filter(bg, y -> y = x)))) AS top_bigram_n,
        |         len(list_distinct(bg)) AS n_distinct_bigrams,
        |         list_max(list_transform(list_distinct(t),
        |                                 x -> len(list_filter(t, y -> y = x)))) AS top_word_n,
        |         len(t) AS n_tokens
        |  FROM b)
        |SELECT doc_id, n_bigrams, top_bigram_n, n_distinct_bigrams, top_word_n, n_tokens,
        |       round(top_bigram_n * 1.0 / n_bigrams, 4) AS top_bigram_frac,
        |       round(1.0 - n_distinct_bigrams * 1.0 / n_bigrams, 4) AS dup_bigram_frac,
        |       round(top_word_n * 1.0 / n_tokens, 4) AS top_word_frac
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_fingerprint" -> (shingleCte +
      """
        |SELECT doc_id, min(md5(s)) AS fp, count(*) AS n_shingles
        |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin))
}
