package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing
import graft.functions.TextFns

class PackingSpec extends SparkSuite {

  private val budget = 512L

  private lazy val docs = Tables.load(spark, sfDir, "documents")
    .select(col("doc_id"), col("source"),
      size(TextFns.tokens(col("text"))).cast("long").as("n_tok"))

  private lazy val packed =
    Packing.packSequences(docs, "source", "doc_id", "n_tok", budget)

  test("every doc is assigned exactly once") {
    assert(packed.count() == docs.count())
    assert(packed.select("doc_id").distinct().count() == docs.count())
  }

  test("matches a sequential reference fold per group") {
    // Re-derive the greedy fill on the driver from the sorted input —
    // the executable spec of "scan in order, reset on overflow".
    val in = docs.collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    val expect = scala.collection.mutable.Map[(String, Long), (Long, Long)]()
    var key = ""; var seq = 0L; var fill = 0L
    in.foreach { case (k, id, t) =>
      if (k != key) { key = k; seq = 0L; fill = t }
      else if (fill + t > budget) { seq += 1L; fill = t }
      else fill += t
      expect((k, id)) = (seq, fill)
    }
    val got = packed.collect().map(r => ((r.getString(1), r.getLong(0)),
      (r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect.toMap)
  }

  test("no sequence exceeds the budget unless it is a single oversized doc") {
    val bad = Packing.sequenceSummary(packed, "source", budget)
      .filter(col("fill") > budget && col("n_docs") > 1)
    assert(bad.count() == 0)
  }

  test("an oversized doc gets a sequence of its own") {
    import spark.implicits._
    val df = Seq(("a", 1L, 100L), ("a", 2L, 9999L), ("a", 3L, 100L))
      .toDF("source", "doc_id", "n_tok")
    val p = Packing.packSequences(df, "source", "doc_id", "n_tok", budget)
      .orderBy("doc_id").collect()
    assert(p.map(_.getLong(3)).toSeq == Seq(0L, 1L, 2L))
  }

  test("every group starts at sequence 0 and ids are contiguous") {
    val perGroup = packed.groupBy("source")
      .agg(min("seq_id").as("mn"), max("seq_id").as("mx"),
        countDistinct("seq_id").as("n"))
      .collect()
    perGroup.foreach { r =>
      assert(r.getLong(1) == 0L, s"${r.getString(0)} min seq != 0")
      assert(r.getLong(3) == r.getLong(2) + 1,
        s"${r.getString(0)} seq ids not contiguous")
    }
  }

  test("deterministic across runs") {
    val a = packed.collect().map(_.toSeq).toSet
    val b = Packing.packSequences(docs, "source", "doc_id", "n_tok", budget)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
