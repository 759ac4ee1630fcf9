package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation: tokenization, TF-IDF,
  * language-ID heuristics, quality scoring, token counting, rolling-hash
  * fingerprinting. All pure Column expressions (codegen'd); the explode-
  * based operators (token counts, TF-IDF) are hash-partitioned groupBys
  * on the token — the classic scalable shape.
  */
object Text {

  /** Language-ID marker words (n-gram heuristic, deterministic). */
  val Markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "value"),
    "de" -> Seq("der", "die", "und", "ist"),
    "es" -> Seq("el", "la", "de", "que"),
    "fr" -> Seq("le", "les", "et", "est"),
    "zh" -> Seq("de", "shi", "le"))

  /** Count of tokens from `wordsCol` present in `markers`. */
  def markerScore(wordsSql: String, markers: Seq[String]): Column = {
    val list = markers.map(m => s"'$m'").mkString(", ")
    expr(s"CAST(size(filter($wordsSql, x -> x IN ($list))) AS BIGINT)")
  }

  /** Whitespace token count (BIGINT). */
  def nWords(text: Column): Column = size(split(text, " ")).cast("long")

  /** BPE-ish token estimate: regex alpha-token count + the chars/4
    * heuristic used for LLM budget estimates. */
  def regexTokens(text: Column): Column = regexp_count(text, lit("[a-z]+")).cast("long")
  def bpeApprox(nChars: Column): Column = ceil(nChars.cast("double") / 4.0).cast("long")

  /** Rolling-hash document fingerprint (winnowing-style), two stages so
    * the gram hashes are computed once (materialize [[gramHashes]] with
    * withColumn, then take [[windowMins]] over it — inlining both into
    * one expression would re-hash per window). Engine-specific hash →
    * golden/property tested, not oracle-compared. */
  def gramHashes(textSql: String, k: Int = 8): Column =
    // length < k → NO grams (not one truncated gram)
    expr(s"""CASE WHEN length($textSql) < $k THEN array()
             ELSE transform(sequence(0, length($textSql) - $k),
                  i -> xxhash64(substring($textSql, i + 1, $k)))
             END""")

  /** FULL windows only (size < w → no fingerprints) — the same contract
    * as the oracle-checked llm_fingerprint query; a partial-window min
    * here would make the two implementations disagree on short docs. */
  def windowMins(gramsSql: String, w: Int = 16): Column =
    expr(s"""CASE WHEN size($gramsSql) < $w THEN array()
             ELSE array_distinct(transform(
               sequence(0, size($gramsSql) - $w),
               i -> array_min(slice($gramsSql, i + 1, $w)))) END""")

  /** PII scrubbing patterns — the RE2/Java-regex COMMON SUBSET (no
    * backrefs, no lookaround), so Spark and the DuckDB oracle match the
    * same spans. Email-ish tokens and long digit runs (phone/account
    * numbers); extend per deployment. */
  val PiiEmail = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PiiDigits = "[0-9]{6,}"

  /** Redact PII in-place (single codegen'd projection — scrubbing 100 TB
    * is a map-only pass, no shuffle). */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, PiiEmail, "<EMAIL>"),
      PiiDigits, "<NUM>")

  /** Redaction counts matching [[scrubPii]]'s actual replacements: digit
    * runs are counted AFTER email removal (a digit run inside an email
    * disappears into `<EMAIL>` and must not be counted as a `<NUM>`). */
  def piiCounts(text: Column): (Column, Column) =
    (regexp_count(text, lit(PiiEmail)).cast("long"),
      regexp_count(regexp_replace(text, PiiEmail, "<EMAIL>"),
        lit(PiiDigits)).cast("long"))
}
