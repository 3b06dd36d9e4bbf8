package graft

import org.apache.spark.sql.functions._

import graft.operators.Subword
import graft.plans.SubwordVocab

/** Greedy subword encode + fertility audit (t30). The encode has no
  * SQL oracle, so these specs carry the semantics: hand-segmented
  * maximal-munch cases, UTF-8/OOV edges, vocab bounds, and the audit
  * arithmetic on a hand-computable corpus. */
class SubwordSpec extends SparkSuite {
  import spark.implicits._

  private val vocab =
    SubwordVocab(Seq("the", "then", "a", "ab", "or", "y", " "))

  private def enc(text: String): (Long, Long, Long) = {
    val r = vocab.encode(
      org.apache.spark.unsafe.types.UTF8String.fromString(text))
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("maximal munch: longest entry wins at every position") {
    // "then" (4) beats "the" (3); rest segments as " a" -> 2 tokens
    assert(enc("then a") == ((3L, 0L, 6L)))
    // inside a word: "theory" -> "the" + o,r OOV? no: "or" matches
    // after "the" consumes 3, leaving "ory" -> "or" + "y"
    assert(enc("theory") == ((3L, 0L, 6L)))
    // "ab" beats "a": "ab a" -> "ab", " ", "a"
    assert(enc("ab a") == ((3L, 0L, 4L)))
  }

  test("OOV falls back to exactly one code point") {
    assert(enc("thex") == ((2L, 1L, 4L))) // "the" + x(OOV)
    assert(enc("zz") == ((2L, 2L, 2L)))
    assert(enc("") == ((0L, 0L, 0L)))
    // multi-byte OOV consumes the whole code point, counts one char
    assert(enc("é") == ((1L, 1L, 1L)))
    assert(enc("theé") == ((2L, 1L, 4L)))
    // 4-byte emoji: one OOV token, one char
    assert(enc("😀") == ((1L, 1L, 1L)))
    // no mid-codepoint match: vocab "y" must not bind inside "ÿ"
    // (0xc3 0xbf shares no byte with "y" anyway, but a crafted
    // 2-byte char whose CONTINUATION byte region overlaps ASCII is
    // impossible in UTF-8 — continuation bytes are >= 0x80)
    assert(enc("ÿy") == ((2L, 1L, 2L))) // OOV ÿ, then vocab y
  }

  test("vocab bounds and equality") {
    intercept[IllegalArgumentException] {
      SubwordVocab(Seq.fill(SubwordVocab.MaxEntries + 1)("x"))
    }
    intercept[IllegalArgumentException] { SubwordVocab(Seq("")) }
    intercept[IllegalArgumentException] {
      SubwordVocab(Seq("q" * (SubwordVocab.MaxEntryBytes + 1)))
    }
    // value equality (Catalyst CSE/canonicalization relies on it)
    assert(SubwordVocab(Seq("a", "b")) == SubwordVocab(Seq("a", "b")))
    assert(SubwordVocab(Seq("a")) != SubwordVocab(Seq("b")))
  }

  test("encodeStats as a column under codegen, null -> null") {
    val df = Seq(("then a"), null.asInstanceOf[String])
      .toDF("text")
      .select(Subword.encodeStats(vocab)(col("text")).as("s"))
    val rows = df.collect()
    assert(rows(0).getStruct(0).getLong(0) == 3L)
    assert(rows(1).isNullAt(0))
  }

  test("deriveVocab is frequency-then-lexical and bounded") {
    val docs = Seq(
      (1L, "b b b a a c", "en", "web"),
      (2L, "a b", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val v = Subword.deriveVocab(docs, size = 2)
    // b:4, a:3 -> top-2; whitespace entries appended
    assert(v.entries.toSet == Set("b", "a", " ", "\n", "\t"))
  }

  test("trainBpeVocab: hand-computed merges, deterministic ties, char fallback") {
    // corpus words: "abab" x3, "abc" x2 -> pair counts round 1:
    // (a,b): 2*3 + 1*2 = 8, (b,a): 1*3 = 3, (b,c): 2 -> merge "ab"
    // round 2: (ab,ab): 3, (ab,c): 2 -> merge "abab"
    val docs = Seq(
      (1L, "abab abab abab", "en", "web"),
      (2L, "abc abc", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val v2 = Subword.trainBpeVocab(docs, merges = 2, size = 8)
    assert(v2.entries.contains("ab") && v2.entries.contains("abab"),
      s"expected the two hand-computed merges in ${v2.entries}")
    // char fallbacks survive the inventory (c appears unmerged; a, b
    // exist as fallback chars even though every occurrence merged)
    assert(Seq("a", "b", "c").forall(v2.entries.contains),
      s"char fallbacks missing from ${v2.entries}")
    // deterministic: training twice gives the same inventory
    assert(Subword.trainBpeVocab(docs, merges = 2, size = 8)
      .entries.toSeq == v2.entries.toSeq)
    // with one merge only, "abab" is not yet a piece
    val v1 = Subword.trainBpeVocab(docs, merges = 1, size = 8)
    assert(v1.entries.contains("ab") && !v1.entries.contains("abab"))
    // encode under the trained vocab: maximal munch uses the longest
    // merge ("abab" one token; "abc" = "ab" + "c")
    val r = v2.encode(
      org.apache.spark.unsafe.types.UTF8String.fromString("abab abc"))
    assert((r.getLong(0), r.getLong(1)) == ((4L, 0L)),
      "expected [abab][ ][ab][c]")
  }

  test("fertilityAudit arithmetic on a hand-computed corpus") {
    val docs = Seq(
      (1L, "the the", "en", "s1"), // the, " ", the -> 3 tok, 7 chars
      (2L, "thex", "en", "s1"), // the + x(OOV) -> 2 tok, 1 unk
      (3L, "a", "en", "s2")) // 1 tok
      .toDF("doc_id", "text", "lang", "source")
    val got = Subword.fertilityAudit(docs, vocab)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    // s1: 5 tokens, 11 chars, 1 unk -> fertility 2.2, unk 0.2
    assert(got.toSeq == Seq(
      ("s1", 2L, 2L, 2.2, 0.2),
      ("s2", 1L, 1L, 1.0, 0.0)))
  }

  test("t30 runs at sf0.001: non-empty, deterministic") {
    val a = SparkEntry.queries("t30_tokenizer_fertility")(spark, sfDir)
      .collect()
    val b = SparkEntry.queries("t30_tokenizer_fertility")(spark, sfDir)
      .collect()
    assert(a.nonEmpty && a.toSeq == b.toSeq)
    // every source's fertility >= 1 (a token is >= 1 char) and
    // unk_rate in [0, 1]
    a.foreach { r =>
      assert(r.getDouble(3) >= 1.0)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }
}
