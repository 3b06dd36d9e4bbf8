package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** A/B probe for t08_tfidf_keywords: the shipped plan pays FOUR
  * exchanges (groupBy(doc_id,term) tf → groupBy(term) df → join by
  * term → window by doc_id). Variant B computes per-doc tf ENTIRELY
  * map-side with higher-order functions (array_distinct + filter
  * counts — O(u·n) per doc, u = distinct terms), removing the first
  * and largest exchange; df/join/window stay identical. The probe
  * asserts bit-identical results, then times both isolated.
  * Usage: runMain graft.tools.T08Probe [sfDir] */
object T08Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def variantB: DataFrame = {
      val docs = graft.Tables.load(spark, sfDir, "documents")
      val perDoc = docs
        .select(col("doc_id"), TextFns.tokensLower(col("text")).as("toks"))
        .select(col("doc_id"),
          explode(transform(array_distinct(col("toks")),
            t => struct(t.as("term"),
              size(filter(col("toks"), x => x === t)).as("tf"))))
            .as("e"))
        .select(col("doc_id"), col("e.term").as("term"),
          col("e.tf").cast("long").as("tf"))
      val dfreq = perDoc.groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("__n"))
      val w = Window.partitionBy("doc_id")
        .orderBy((col("tf") * col("__n") / col("df")).desc, col("term"))
      perDoc.join(dfreq, "term").crossJoin(broadcast(n))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          (floor((col("tf") *
            log(col("__n").cast("double") / col("df"))) * 10000) / 10000)
            .as("tfidf"))
        .orderBy("doc_id", "term")
    }

    val shipped = graft.SparkEntry.queries("t08_tfidf_keywords")
    val a = shipped(spark, sfDir)
    val b = variantB
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"[t08probe] diff rows = $diff")
    require(diff == 0, "variant B diverges from shipped t08")

    def time(f: => DataFrame): Seq[Double] = (1 to 4).map { _ =>
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val ta = time(shipped(spark, sfDir))
    val tb = time(variantB)
    println(f"[t08probe] shipped warm=${ta.head}%.2f steady=${ta.tail.min}%.2f")
    println(f"[t08probe] mapside warm=${tb.head}%.2f steady=${tb.tail.min}%.2f")
    spark.stop()
  }
}
