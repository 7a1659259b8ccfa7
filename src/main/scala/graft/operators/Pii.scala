package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** PII detection and redaction — the scrub a training-data pipeline runs
  * before text lands anywhere durable (builder-brief tier; the reference
  * system predates the concern, so this is a pipeline extension beside
  * X4's quality family, SURVEY.md §2.C).
  *
  * Pure `regexp_replace`/`regexp_count` arithmetic over a deliberately
  * COMMON regex dialect (no lookaround, no backreferences, POSIX-ish
  * classes only) so Spark's Java regex and DuckDB's RE2 agree literally —
  * which keeps the operator oracle-checkable. Masking order matters and
  * is fixed: emails first (their local parts may contain digits), then
  * dashed phone shapes, then bare long digit runs (ids/SSN/card-like) —
  * each later pattern cannot match inside an earlier mask token.
  *
  * Scale: per-row codegen'd expressions, no shuffle, no UDF — the
  * redaction rides any scan or ingest projection at line rate. Wired into
  * the ingest pipeline as the `textTransform` seam (IngestPipeline), it
  * runs BEFORE the admission gate, so raw PII never reaches the row
  * state, the postings/shingle states, the admission log's payloads, or
  * the alert outbox.
  */
object Pii {
  type Q = (SparkSession, String) => DataFrame

  /** The common-dialect patterns (kept in sync with the oracle SQL —
    * change both or neither). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
  val PhoneRe = "[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]"
  val IdRe = "[0-9]{9,}"

  val EmailMask = "<EMAIL>"
  val PhoneMask = "<PHONE>"
  val IdMask = "<ID>"

  /** Redacted form of a text column — mask emails, then dashed phones,
    * then ≥9-digit runs. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, EmailMask),
        PhoneRe, PhoneMask),
      IdRe, IdMask)

  /** Per-category detection counts on the UNredacted text. */
  def counts(text: Column): Seq[Column] = Seq(
    regexp_count(text, lit(EmailRe)).cast("long").as("n_email"),
    regexp_count(regexp_replace(text, EmailRe, EmailMask), lit(PhoneRe))
      .cast("long").as("n_phone"),
    regexp_count(
      regexp_replace(regexp_replace(text, EmailRe, EmailMask),
        PhoneRe, PhoneMask), lit(IdRe)).cast("long").as("n_id"))

  /** The fixture corpus carries no PII, so the oracle key DECORATES it
    * deterministically (same arithmetic in the DuckDB SQL): every doc
    * gains one synthetic email and phone, every third doc a second
    * email, every fifth a 11-digit id — then detection counts and the
    * redacted text are checked end to end. */
  private[graft] def decorated(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      concat(col("text"),
        lit(" contact u"), col("doc_id").cast("string"), lit("@ex.org"),
        when(col("doc_id") % 3 === 0, lit(" and admin@corp.example.net"))
          .otherwise(lit("")),
        lit(" call 415-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        when(col("doc_id") % 5 === 0,
          concat(lit(" ref 9"), lpad(col("doc_id").cast("string"), 10, "0")))
          .otherwise(lit(""))).as("text"))

  private def qPiiRedact(spark: SparkSession, dir: String): DataFrame = {
    // Round-17: the built-in formulation ran SIX regex passes per row
    // (3× regexp_replace for the mask chain + 3× regexp_count on the
    // per-stage inputs; Catalyst's subexpression elimination dedupes the
    // shared replace prefixes but cannot merge a count with its replace
    // twin). The fused [[graft.functions.RegexpReplaceCount]] expression
    // returns (clean, n) from ONE `find()` loop per category — three
    // passes total, identical semantics (count == replacements by
    // construction; parity spec-pinned, oracle re-checked at two SFs).
    import graft.functions.RegexpReplaceCount.regexp_replace_count
    val d = decorated(Tables.documents(spark, dir))
    d.select(col("doc_id"),
        regexp_replace_count(col("text"), EmailRe, EmailMask).as("s1"))
      .select(col("doc_id"), col("s1"),
        regexp_replace_count(col("s1.clean"), PhoneRe, PhoneMask).as("s2"))
      .select(col("doc_id"), col("s1"), col("s2"),
        regexp_replace_count(col("s2.clean"), IdRe, IdMask).as("s3"))
      .select(col("doc_id"),
        col("s1.n").as("n_email"),
        col("s2.n").as("n_phone"),
        col("s3.n").as("n_id"),
        col("s3.clean").as("clean"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map("q_pii_redact" -> qPiiRedact)

  val oracle: Map[String, String] = Map(
    "q_pii_redact" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         text || ' contact u' || CAST(doc_id AS VARCHAR) || '@ex.org'
        |           || CASE WHEN doc_id % 3 = 0
        |                   THEN ' and admin@corp.example.net' ELSE '' END
        |           || ' call 415-555-'
        |           || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |           || CASE WHEN doc_id % 5 = 0
        |                   THEN ' ref 9' || lpad(CAST(doc_id AS VARCHAR), 10, '0')
        |                   ELSE '' END AS text
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, text,
        |         regexp_replace(text,
        |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+',
        |           '<EMAIL>', 'g') AS t1
        |  FROM d),
        |m2 AS (
        |  SELECT doc_id, text, t1,
        |         regexp_replace(t1,
        |           '[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]',
        |           '<PHONE>', 'g') AS t2
        |  FROM m)
        |SELECT doc_id,
        |       len(regexp_extract_all(text,
        |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+'))::BIGINT AS n_email,
        |       len(regexp_extract_all(t1,
        |         '[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]'))::BIGINT AS n_phone,
        |       len(regexp_extract_all(t2, '[0-9]{9,}'))::BIGINT AS n_id,
        |       regexp_replace(t2, '[0-9]{9,}', '<ID>', 'g') AS clean
        |FROM m2
        |ORDER BY doc_id""".stripMargin)
}
