package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-statistics column functions for large-scale corpus pipelines:
  * token counting, quality features, n-gram heuristic language ID,
  * document fingerprints, word n-grams.
  *
  * All pure built-in compositions (split/filter/transform/aggregate)
  * so they run inside whole-stage codegen with zero shuffle — each is
  * a map over the documents scan.
  */
object TextFns {

  /** Whitespace tokenization (kept trivially simple: the BPE-ish
    * variant below handles punctuation). */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokensLower(c: Column): Column = split(lower(trim(c)), "\\s+")

  /** BPE-ish subword-boundary tokens: splits on whitespace AND
    * punctuation boundaries, the usual pre-tokenizer regex shape. */
  def tokensBpeish(c: Column): Column =
    split(trim(c), "\\s+|(?=[.,!?;:])|(?<=[.,!?;:])")

  /** Count of tokens that appear in a (small, broadcast-literal)
    * word set. */
  def wordSetHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** The engine's shared corpus quality score (t02's formula): length
    * saturation × stopword-ratio blend, floored to 4 decimals so both
    * engines (and every consumer — gates, keepers, curricula) order
    * documents identically. */
  def qualityScore(text: Column): Column = {
    val toks = tokensLower(text)
    floor(least(lit(1.0), length(text) / 500.0) *
      (lit(0.7) + lit(0.3) *
        (wordSetHits(toks, Seq("the", "a", "and", "of", "to", "in")) /
          size(toks))) * 10000) / 10000
  }

  /** d01's canonical text fingerprint: md5 of the upper-cased,
    * whitespace-collapsed, trimmed text. */
  def textFingerprint(text: Column): Column =
    md5(upper(regexp_replace(trim(text), "\\s+", " ")))

  /** Stopword sets per language for the heuristic language ID.
    * Order matters: ties resolve to the earlier language. */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of"),
    "es" -> Seq("el", "la", "de", "y"),
    "de" -> Seq("der", "und", "die", "das"),
    "fr" -> Seq("le", "la", "et", "les"))

  /** N-gram-ish heuristic language ID: argmax of per-language
    * stopword hits, 'und' (undetermined) when no set matches. */
  def langId(toks: Column): Column = {
    val hits = LangStopwords.map { case (l, ws) => l -> wordSetHits(toks, ws) }
    val pred = hits.zipWithIndex.foldRight(lit("und")) {
      case (((lang, h), i), elseCol) =>
        val later = hits.drop(i + 1).map(_._2)
        val isMax = later.foldLeft(h > 0)((acc, o) => acc && h >= o)
        when(isMax, lit(lang)).otherwise(elseCol)
    }
    pred
  }

  /** Document fingerprint: md5 over whitespace-normalized uppercased
    * text — stable across engines (DuckDB md5 is byte-identical). */
  def fingerprint(c: Column): Column = md5(Normalize.cleanText(c))

  /** Word n-grams over a token array; shorter docs yield an empty
    * array (explode then drops them). */
  def wordNgrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j =>
          element_at(toks, i + lit(j))): _*)))
      .otherwise(array())

  /** Count of occurrences of the single most frequent element of an
    * array — within-row, zero shuffle: sort, then one aggregate()
    * pass tracking the longest run of equal neighbors (O(n log n),
    * and the input array expression is referenced exactly ONCE — an
    * `array_distinct(arr)` × `filter(arr, ...)` composition would
    * re-evaluate `arr` inside the lambda for every outer element,
    * since lambda scopes get no common-subexpression elimination). */
  def topElementCount(arr: Column): Column = {
    val init = struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best"))
    val scanned = aggregate(array_sort(arr), init,
      (acc, x) => {
        val run = when(x === acc.getField("prev"),
          acc.getField("run") + 1).otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    coalesce(scanned, lit(0))
  }

  /** Feature-hashing bucket (the hashing-trick vectorizer): a token's
    * bucket in a `dim`-dimensional feature space, derived from the
    * first 8 hex digits of md5 — chosen over xxhash64 because md5 is
    * byte-identical across engines, so hashed features are
    * reproducible anywhere (the whole point of the hashing trick:
    * no vocabulary to ship). Codegen'd built-ins, zero shuffle. */
  def featureBucket(token: Column, dim: Int): Column =
    conv(substring(md5(token), 1, 8), 16, 10).cast("long") % dim

  /** Email/phone PII patterns — deliberately simple and identical
    * under Java regex and RE2 so the redaction operator is
    * oracle-checkable across engines. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\d{3}-\\d{3}-\\d{4}"

  /** PII redaction: replace every email and phone occurrence with
    * typed placeholder tags. Pure map-side regexp_replace. */
  def redactPii(c: Column): Column =
    regexp_replace(regexp_replace(c, EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  /** Fused single-pass PII scan ([[graft.plans.PiiScan]]): returns
    * struct(n_emails, n_phones, redacted) from ONE byte walk — the
    * production form of the [[EmailRe]]/[[PhoneRe]] +
    * [[redactPii]] composition (four regex traversals), exact-match
    * equivalent (PlansSpec property-pins the scanner against the
    * regex pipeline). */
  def piiScan(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(graft.plans.PiiScan(GraftBridge.expression(c)))
  }

  /** t31's markup stripper — the boilerplate-removal pass of a web
    * corpus pipeline: drop tags, decode the named HTML entities,
    * collapse whitespace. Three codegen regexp/replace passes over
    * the scan (zero shuffle — the cost IS the scan); `&amp;` decodes
    * LAST, the standard order, so `&amp;lt;` yields the literal
    * `&lt;` instead of double-decoding to `<`. The DuckDB oracle
    * runs the identical chain, pinning the transform cross-engine
    * byte-for-byte. */
  def stripMarkup(c: Column): Column = {
    val noTags = regexp_replace(c, "<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (ent, ch)) =>
        replace(acc, lit(ent), lit(ch))
      }
    trim(regexp_replace(decoded, "\\s+", " "))
  }
}
