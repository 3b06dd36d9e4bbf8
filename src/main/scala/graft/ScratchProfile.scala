package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup
object ScratchProfile {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[phase] $name ${(System.nanoTime()-t0)/1e9}%.3f s"); r
  }
  // instrumented copy of clusterLeaders
  def cl(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val edges = pairs.select(col("a_id"), col("b_id"))
      .union(pairs.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      .cache()
    var labels = t("  init labels")(edges
      .groupBy(col("a_id").as("doc_id"))
      .agg(min(col("b_id")).as("__mn"))
      .select(col("doc_id"), least(col("__mn"), col("doc_id")).as("leader_id"))
      .localCheckpoint())
    var i = 0; var converged = false
    while (i < maxIter && !converged) {
      t(s"  round $i") {
        val starEdges = labels
          .select(col("doc_id").as("a_id"), col("leader_id").as("b_id"))
          .union(labels.select(col("leader_id").as("a_id"), col("doc_id").as("b_id")))
        val allEdges = edges.union(starEdges)
        val viaNeighbor = allEdges
          .join(labels.withColumnRenamed("doc_id", "b_id")
            .withColumnRenamed("leader_id", "nb_leader"), Seq("b_id"))
          .groupBy(col("a_id").as("doc_id"))
          .agg(min(col("nb_leader")).as("nb_min"))
        val next = labels.withColumnRenamed("leader_id", "__prev")
          .join(viaNeighbor, Seq("doc_id"), "left")
          .select(col("doc_id"), col("__prev"),
            least(col("__prev"), coalesce(col("nb_min"), col("__prev"))).as("leader_id"))
          .localCheckpoint()
        converged = next.filter(col("leader_id") =!= col("__prev")).isEmpty
        labels = next.drop("__prev")
        i += 1
      }
    }
    println(s"  rounds=$i")
    edges.unpersist(blocking = false)
    labels
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.load(spark, dir, "documents")
    docs.write.format("noop").mode("overwrite").save()
    (1 to 2).foreach { i =>
      println(s"--- iteration $i ---")
      val verified = Dedup.jaccardOnPairs(
          Dedup.minHashCandidatePairs(docs, col("doc_id"), col("text")),
          docs, col("doc_id"), col("text"))
        .filter(col("jaccard") >= 0.5).select("a_id","b_id").cache()
      val leaders = t("clusterLeaders total") { val l = cl(verified); l.count(); l }
      verified.unpersist()
    }
    spark.stop()
  }
}
