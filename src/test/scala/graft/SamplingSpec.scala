package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSuite {

  private lazy val docs = Tables.load(spark, sfDir, "documents")

  test("hashSample is deterministic and near the requested rate") {
    val a = Sampling.hashSample(docs, "doc_id", 0.4)
    val b = Sampling.hashSample(docs, "doc_id", 0.4)
    assert(a.collect().map(_.getLong(0)).toSet ==
      b.collect().map(_.getLong(0)).toSet)
    val rate = a.count().toDouble / docs.count()
    assert(math.abs(rate - 0.4) < 0.1, s"rate $rate far from 0.4")
  }

  test("stratified sampling caps only the targeted strata") {
    val sampled = Sampling.stratifiedHashSample(docs, "lang", "doc_id",
      Map("en" -> 0.5), defaultFraction = 1.0)
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after("en") < before("en")) // en reduced
    (before.keySet - "en").foreach(l =>
      assert(after(l) == before(l), s"untargeted stratum $l changed"))
  }

  test("stratifiedBudget takes exactly min(budget, stratum size)") {
    val out = Sampling.stratifiedBudget(docs, "lang", "doc_id", 30)
    val sizes = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    full.foreach { case (l, n) =>
      assert(sizes(l) == math.min(30L, n), s"$l: ${sizes(l)}")
    }
  }
}
