package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.tools.ScaleGen

/** The sf1.0 rehearsal data generator must actually preserve the
  * properties its exponent analysis leans on: exact per-copy
  * distribution replication, internally consistent FK graphs per
  * copy, fixed dimensions, and the embedding nudge that breaks
  * exact top-k ties without moving vectors materially. */
class ScaleGenSpec extends SparkSuite {

  private lazy val outDir: String = {
    val d = Files.createTempDirectory("scalegen").toFile
    d.deleteOnExit()
    ScaleGen.run(spark, sfDir, d.getAbsolutePath, copies = 2)
    d.getAbsolutePath
  }

  private def src(name: String) = Tables.load(spark, sfDir, name)
  private def gen(name: String) = Tables.load(spark, outDir, name)

  test("facts replicate copies x, dimensions stay fixed") {
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings"))
      assert(gen(t).count() == 2 * src(t).count(), s"table $t")
    for (t <- Seq("region", "nation"))
      assert(gen(t).count() == src(t).count(), s"dimension $t")
  }

  test("copy 0 is the source verbatim (literal key lookups keep hitting)") {
    val a = src("orders").select("o_orderkey", "o_custkey", "o_totalprice")
    val b = gen("orders").filter(col("o_orderkey") < 100000000L)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    assert(b.exceptAll(a).isEmpty && a.exceptAll(b).isEmpty)
  }

  test("each replica's FK graph is internally consistent") {
    // every generated order resolves to a generated customer — the
    // per-copy key shift must move both ends of every FK edge
    val dangling = gen("orders").join(
      gen("customer").select(col("c_custkey").as("o_custkey")),
      Seq("o_custkey"), "left_anti").count()
    assert(dangling == 0, s"$dangling orders with no customer")
    val danglingLi = gen("lineitem").join(
      gen("orders").select(col("o_orderkey").as("l_orderkey")),
      Seq("l_orderkey"), "left_anti").count()
    assert(danglingLi == 0, s"$danglingLi lineitems with no order")
  }

  test("per-key distributions are preserved exactly") {
    // group-size histogram of orders-per-customer is identical ×2:
    // the property that makes measured exponents attributable to the
    // operator rather than to drifting data shape
    val h = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy("o_custkey").agg(count(lit(1)).as("n"))
        .groupBy("n").agg(count(lit(1)).as("freq"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hs = h(src("orders"))
    val hg = h(gen("orders"))
    assert(hg == hs.map { case (n, f) => n -> 2 * f })
  }

  test("embedding replicas are nudged, not tied") {
    val e = gen("embeddings").select(col("vec_id"),
      element_at(col("embedding"), 1).as("x0"))
    val base = e.filter(col("vec_id") < 100000000L)
      .select(col("vec_id"), col("x0").as("b0"))
    val rep = e.filter(col("vec_id") >= 100000000L)
      .select((col("vec_id") - 100000000L).as("vec_id"), col("x0"))
    val joined = rep.join(base, "vec_id")
      .select(abs(col("x0") - col("b0")).as("d")).agg(
        min("d").as("mn"), max("d").as("mx")).head()
    val (mn, mx) = (joined.getAs[Float]("mn"), joined.getAs[Float]("mx"))
    assert(mn > 0f, "replica vectors must not tie exactly")
    assert(mx < 2e-3f, s"nudge must stay tiny, got $mx")
  }
}
