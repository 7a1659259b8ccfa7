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

  val queries: Map[String, Q] = Map(
    "q_text_tokens" -> qTextTokens,
    "q_token_count" -> qTokenCount,
    "q_lang_id" -> qLangId,
    "q_quality_score" -> qQualityScore,
    "q_unigram_logprob" -> qUnigramLogprob,
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
    "q_text_tokens" ->
      """SELECT tok, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |GROUP BY 1 ORDER BY n DESC, tok LIMIT 50""".stripMargin,
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
    "q_unigram_logprob" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
        |tot AS (SELECT count(*) AS tot FROM toks)
        |SELECT doc_id, round(-sum(ln(cnt / tot)) / count(*), 4) AS nll
        |FROM toks JOIN freq USING (tok), tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_fingerprint" -> (shingleCte +
      """
        |SELECT doc_id, min(md5(s)) AS fp, count(*) AS n_shingles
        |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin))
}
