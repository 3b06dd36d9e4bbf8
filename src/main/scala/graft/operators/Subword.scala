package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftBridge

import graft.functions.TextFns
import graft.plans.{SubwordEncode, SubwordVocab}

/** Tokenizer-application at corpus scale: derive a bounded
  * vocabulary, then greedy longest-match encode every document
  * map-side ([[graft.plans.SubwordEncode]]) and audit the result —
  * tokens per doc, fertility (chars per token) and OOV rate are the
  * numbers a training-data pipeline checks before committing to a
  * tokenizer (a vocab that fragments or misses a source inflates
  * training cost there; the reference normalizes text the same
  * derive-then-apply way at field level, hangarbay/address.py).
  *
  * Scale shape: the vocab derivation is one token-count aggregate
  * with a bounded top-V head (the ONLY driver state — a tokenizer
  * artifact, ≤ [[SubwordVocab.MaxEntries]]); the encode pass rides
  * the documents scan with zero shuffle (the vocab ships in the
  * expression, one copy per task binary, probe index rebuilt lazily
  * per executor); the audit is one hash aggregate per source. At
  * 100 TB the cost is the scan, not the tokenizer.
  */
object Subword {

  /** Top-`size` corpus words by (count desc, word asc) — the
    * deterministic stand-in for a trained merge table; single-char
    * ASCII fallbacks are implicit (unknown code points count as OOV
    * single-char tokens at encode time). Words longer than
    * [[SubwordVocab.MaxEntryBytes]] can never be vocab entries. */
  def deriveVocab(docs: DataFrame, size: Int = 512): SubwordVocab = {
    require(size <= SubwordVocab.MaxEntries,
      s"vocab size $size exceeds the ${SubwordVocab.MaxEntries} bound")
    val words = docs
      .select(explode(TextFns.tokensLower(col("text"))).as("w"))
      .filter(length(col("w")) > 0 &&
        octet_length(col("w")) <= SubwordVocab.MaxEntryBytes)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(size) // bounded: driver receives <= size rows
      .select("w").collect().map(_.getString(0))
    // whitespace entries so full-text encoding treats inter-word
    // gaps as known tokens rather than OOV noise (a trained vocab
    // carries space-joined pieces the same way)
    SubwordVocab(words.toSeq ++ Seq(" ", "\n", "\t"))
  }

  /** BPE merge-trained vocabulary (Sennrich et al., "Neural Machine
    * Translation of Rare Words with Subword Units", ACL'16 — the
    * public word-frequency-dictionary trainer): ONE distributed
    * aggregate collects the top-`maxWords` (word, count) table, then
    * `merges` rounds of the classic driver loop — count adjacent
    * symbol pairs weighted by word frequency, merge the most
    * frequent pair (ties broken lexicographically, so training is
    * deterministic), rewrite the dictionary — build the subword
    * inventory. The resulting pieces (single chars + merged symbols,
    * frequency-capped to `size`) are applied with the SAME greedy
    * longest-match encode as [[deriveVocab]]'s word vocab — the
    * WordPiece-style application of a BPE-trained inventory, so the
    * fertility audit measures subword fragmentation (a real
    * pipeline's regime), not just whole-word coverage.
    *
    * Scale shape: identical to [[deriveVocab]] — one bounded
    * aggregate (top-maxWords head) is the only distributed work; the
    * merge loop is O(merges · Σ word lengths) on a ≤ maxWords-row
    * driver table, milliseconds at any corpus size. */
  def trainBpeVocab(
      docs: DataFrame,
      merges: Int = 64,
      size: Int = 512,
      maxWords: Int = 4096): SubwordVocab = {
    require(size <= SubwordVocab.MaxEntries,
      s"vocab size $size exceeds the ${SubwordVocab.MaxEntries} bound")
    val wordRows = docs
      .select(explode(TextFns.tokensLower(col("text"))).as("w"))
      .filter(length(col("w")) > 0 &&
        octet_length(col("w")) <= SubwordVocab.MaxEntryBytes)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // dictionary: word → (symbol sequence, corpus count)
    var dict: Array[(Array[String], Long)] =
      wordRows.map { case (w, n) => (w.map(_.toString).toArray, n) }
    var done = 0
    while (done < merges) {
      val pairCounts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      dict.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = merges
      else {
        val ((a, b), _) = pairCounts.maxBy { case ((x, y), c) =>
          (c, x, y) // count, then lexicographic — deterministic
        }(Ordering.Tuple3(Ordering.Long,
          Ordering.String.reverse, Ordering.String.reverse))
        val merged = a + b
        if (merged.getBytes("UTF-8").length >
            SubwordVocab.MaxEntryBytes) {
          done = merges // longest useful piece reached
        } else {
          dict = dict.map { case (syms, n) =>
            if (syms.length < 2) (syms, n)
            else {
              val out = new scala.collection.mutable.ArrayBuffer[String](
                syms.length)
              var i = 0
              while (i < syms.length) {
                if (i < syms.length - 1 && syms(i) == a &&
                    syms(i + 1) == b) {
                  out += merged; i += 2
                } else { out += syms(i); i += 1 }
              }
              (out.toArray, n)
            }
          }
          done += 1
        }
      }
    }
    // piece inventory by corpus frequency: merged symbols + the
    // single chars (char fallback keeps rare words encodable rather
    // than OOV), capped to `size` by (freq desc, piece asc)
    val pieceCounts = scala.collection.mutable.HashMap.empty[String, Long]
    dict.foreach { case (syms, n) =>
      syms.foreach(s =>
        pieceCounts.update(s, pieceCounts.getOrElse(s, 0L) + n))
      var i = 0
      while (i < syms.length) { // char fallbacks, weighted once
        syms(i).foreach { ch =>
          val c = ch.toString
          if (!pieceCounts.contains(c)) pieceCounts.update(c, 0L)
        }
        i += 1
      }
    }
    val pieces = pieceCounts.toSeq
      .sortBy { case (p, c) => (-c, p) }
      .take(size).map(_._1)
    SubwordVocab(pieces ++ Seq(" ", "\n", "\t"))
  }

  /** struct(n_tokens, n_unk, n_chars) for one text column under
    * `vocab` — composable encode column for callers that need the
    * raw per-document numbers. */
  def encodeStats(vocab: SubwordVocab)(text: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    GraftBridge.column(SubwordEncode(GraftBridge.expression(text), vocab))

  /** Per-source fertility audit: docs, mean tokens/doc, fertility
    * (total chars / total tokens) and OOV share, 4-decimal floored
    * so every consumer orders sources identically. Encoding runs on
    * the LOWERED text — the vocab is lowercase by construction. */
  def fertilityAudit(docs: DataFrame, vocab: SubwordVocab): DataFrame = {
    val st = encodeStats(vocab)(lower(col("text")))
    docs
      .select(col("source"), st.as("__s"))
      .select(col("source"),
        col("__s.n_tokens").as("__t"),
        col("__s.n_unk").as("__u"),
        col("__s.n_chars").as("__c"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        floor(sum("__t") / count(lit(1))).cast("long")
          .as("tokens_per_doc"),
        (floor(sum("__c") * 10000 / sum("__t")) / 10000)
          .as("fertility"),
        (floor(sum("__u") * 10000 / sum("__t")) / 10000)
          .as("unk_rate"))
      .orderBy("source")
  }
}
