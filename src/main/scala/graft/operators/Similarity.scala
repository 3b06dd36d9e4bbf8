package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Three paths:
  *  - [[knnBrute]]: exact cosine top-k. O(N·Q): the query set is
  *    broadcast, the corpus streams — correct baseline and the
  *    recall oracle for the approximate paths.
  *  - [[lshAnn]]: random-hyperplane LSH. Buckets cut the candidate
  *    set before any join; multi-probe (1-bit flips) recovers recall.
  *  - [[ivfAnn]]: IVF-style coarse quantization — centroids from the
  *    data, queries probe the nearest `nprobe` cells only.
  *
  * All vector math is built-in higher-order functions
  * (zip_with/aggregate) evaluated in double precision — no UDFs, no
  * collect. A native Catalyst Expression with doGenCode is the
  * planned round-2 upgrade for the dot-product inner loop.
  */
object Similarity {

  /** Elementwise double cast (float parquet vectors → stable math). */
  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** HOF dot product (zip_with/aggregate) — portability fallback;
    * [[dotNative]] is the codegen path used in hot loops. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  /** Fused-codegen dot product ([[graft.plans.DotProduct]]): one JIT
    * loop instead of an interpreted lambda per element. */
  def dotNative(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(graft.plans.DotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  }

  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity via the native codegen'd
    * [[graft.plans.CosineSim]] expression: one fused loop, stays in
    * whole-stage codegen. Double-precision left-to-right
    * accumulation — numerically identical to [[cosineHof]] and to
    * DuckDB's list_cosine_similarity on DOUBLE[]. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(graft.plans.CosineSim(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  }

  /** The same computation composed from built-in higher-order
    * functions (zip_with + aggregate): three array traversals through
    * lambda dispatch. Kept as the portability fallback and the
    * benchmark baseline for the native expression. */
  def cosineHof(a: Column, b: Column): Column = {
    val ad = asDouble(a)
    val bd = asDouble(b)
    dot(ad, bd) / (l2norm(ad) * l2norm(bd))
  }

  /** Exact cosine top-k: for each row of `queries`, the k nearest
    * rows of `corpus` (self excluded by id). Queries are broadcast;
    * the per-query top-k is a window over (query, sim) — which sorts
    * the WHOLE corpus per query in a single task. Test-oracle only:
    * [[knnBruteAgg]] is the identical-output scale path (map-side
    * k-row heaps, no per-query sort) and is what SparkEntry wires. */
  def knnBrute(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = broadcast(
      queries.select(col(idCol).as("q_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    c.join(q, col("cand_id") =!= col("q_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("cand_id"))
  }

  /** Top-k per group via the bounded-heap aggregate
    * ([[graft.plans.TopKPairs]]): identical output to the window
    * row_number form, but the plan is a hash aggregate with k-row
    * state and map-side partials — no per-group sort of the full
    * candidate set. */
  def topKAgg(score: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      graft.plans.TopKPairs(
        GraftBridge.expression(struct(score.as("score"), id.as("id"))), k)
        .toAggregateExpression())
  }

  /** knnBrute with the aggregate-based top-k (same results, scalable
    * plan: no window sort). */
  def knnBruteAgg(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = broadcast(
      queries.select(col(idCol).as("q_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
    c.join(q, col("cand_id") =!= col("q_id"))
      .groupBy(col("q_id"))
      .agg(topKAgg(cosine(col("qv"), col("cv")), col("cand_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("cand_id"))
  }

  /** Deterministic ±1 random hyperplanes (seeded). */
  private def planes(numPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  /** Sign-bit bucket id from `numPlanes` seeded random hyperplanes —
    * shared by the ANN index ([[lshAnn]]) and the corpus-scale
    * embedding near-dup path ([[Dedup.embeddingNearDupPairsBucketed]]).
    * Two vectors collide with probability (1 − θ/π)^numPlanes for
    * angle θ, so fewer planes = bigger buckets = higher recall. */
  private[operators] def hyperplaneBucket(
      vec: Column, numPlanes: Int, dim: Int, seed: Long): Column =
    bucketCol(vec, planes(numPlanes, dim, seed))

  /** Sign-bit bucket id from hyperplane projections — planes × dims
    * fused multiply-adds per row through the codegen dot product (the
    * HOF form made bucketing the dominant cost of the LSH paths). */
  private def bucketCol(vec: Column, ps: Seq[Seq[Double]]): Column =
    ps.zipWithIndex.map { case (p, j) =>
      when(dotNative(vec, typedLit(p)) >= 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Random-hyperplane LSH ANN: bucket the corpus once, probe each
    * query's bucket plus all neighbors within `probeBits` bit flips,
    * exact-rerank the candidates. The corpus-side join key is the
    * bucket id — the candidate set per query is
    * |corpus| / 2^planes × (1 + planes + [planes·(planes−1)/2]).
    * Multi-probe trades candidate volume for recall without
    * rebuilding the index; deeper probes visit buckets in increasing
    * hamming distance, which tracks increasing angle. */
  def lshAnn(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      // defaults = the TUNED config (recall@5 ≥ 0.6 on the test
      // corpus, asserted in SimilaritySpec): 5 planes keep buckets
      // populated at 2^5 cells and 2-bit multi-probe recovers
      // boundary neighbors; the cheaper 1-bit probe drops recall to
      // ~0.2 — callers chasing throughput opt DOWN explicitly
      numPlanes: Int = 5,
      dim: Int = 64,
      seed: Long = 42L,
      probeBits: Int = 2): DataFrame = {
    require(probeBits >= 0 && probeBits <= 2, s"probeBits 0..2: $probeBits")
    val ps = planes(numPlanes, dim, seed)
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
      bucketCol(col(vecCol), ps).as("bucket"))
    val oneBit =
      if (probeBits < 1) Seq.empty
      else (0 until numPlanes).map(j => col("qb").bitwiseXOR(lit(1 << j)))
    val twoBit =
      if (probeBits < 2) Seq.empty
      else for {
        i <- 0 until numPlanes; j <- (i + 1) until numPlanes
      } yield col("qb").bitwiseXOR(lit((1 << i) | (1 << j)))
    val q = broadcast(queries
      .select(col(idCol).as("q_id"), col(vecCol).as("qv"),
        bucketCol(col(vecCol), ps).as("qb"))
      .withColumn("probe",
        explode(array((col("qb") +: oneBit) ++ twoBit: _*))))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    c.join(q, col("bucket") === col("probe") && col("cand_id") =!= col("q_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("cand_id"))
  }

  /** K-means cell assignment — trains the IVF coarse codebook when no
    * natural partition column exists (a real IVF index quantizes; it
    * doesn't assume labels).
    *
    * Lloyd's iterations in the shape that scales: centroids are TINY
    * (k·dim doubles) and live on the driver between iterations; each
    * round is one map-side argmax-cosine assignment over broadcast
    * literal centroids (k fused-codegen [[cosine]] evaluations per
    * row — no join, no shuffle) plus one posexplode/avg aggregation to
    * re-estimate means (two bounded shuffles). The data is never
    * cached or re-partitioned; iteration state never grows lineage
    * (each round's plan is built fresh from the driver-held
    * centroids).
    *
    * Deterministic: initial centroids are the k rows with the
    * smallest xxhash64(id, seed) (a seeded hash-ordered sample —
    * stable across runs and partitionings), ties in assignment break
    * toward the lower cell id. Stops early when no assignment can
    * change (max centroid movement < 1e-12).
    *
    * @return (id, cell) — feed as `cellCol` to [[ivfAnn]]. */
  def kmeansCells(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      maxIter: Int = 10,
      seed: Long = 42L): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val v = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    // seeded deterministic init: k hash-ordered rows
    var centroids: Array[Seq[Double]] = v
      .orderBy(xxhash64(col("__id"), lit(seed)), col("__id")).limit(k)
      .select(transform(col("__v"), _.cast("double")).as("c"))
      .collect().map(_.getSeq[Double](0))
    def assignCol: Column = {
      // argmax cosine via struct max: (sim, -cell) orders ties toward
      // the smaller cell id
      val scored = centroids.zipWithIndex.map { case (c, i) =>
        struct(cosine(col("__v"), typedLit(c)).as("sim"),
          lit(-i).as("negCell"))
      }
      (-array_max(array(scored: _*)).getField("negCell")).as("cell")
    }
    var iter = 0
    var moved = true
    while (iter < maxIter && moved) {
      val means = v.select(col("__v"), assignCol)
        .select(col("cell"), posexplode(col("__v")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("centroid"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      val next = centroids.zipWithIndex.map { case (old, i) =>
        means.getOrElse(i, old) // empty cell keeps its centroid
      }
      moved = centroids.zip(next).exists { case (a, b) =>
        a.zip(b).exists { case (x, y) => math.abs(x - y) > 1e-12 }
      }
      centroids = next
      iter += 1
    }
    v.select(col("__id").as(idCol), assignCol)
  }

  /** Integer dot product over int8-quantized vectors
    * ([[graft.plans.ByteDot]]): all-integer multiply-accumulate in
    * one codegen loop. */
  def byteDot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(graft.plans.ByteDot(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  }

  /** KNN over int8-quantized embeddings with exact re-scoring — the
    * memory-bound scale path: a 100 TB float corpus is 25 TB at int8,
    * and the first-pass scoring moves/multiplies bytes, not floats.
    *
    * Pass 0 (two tiny aggregates): corpus-wide symmetric scale
    * `127 / max|x|`, broadcast. Pass 1: quantize both sides to
    * array<tinyint> (norms precomputed ONCE per row), score every
    * (query, candidate) with the integer [[byteDot]], keep the top
    * `k × candMult` per query via the bounded-heap aggregate — no
    * window sort, map-side partials. Pass 2: exact float cosine
    * ([[cosine]]) on the surviving candidates only (|Q| × k×candMult
    * rows), top k. Output matches [[knnBruteAgg]] whenever the true
    * top-k survives the quantized cut (recall asserted ≥ in
    * SimilaritySpec; exact equality holds on the test corpus). */
  def quantizedKnn(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      candMult: Int = 4): DataFrame = {
    val scaleDf = corpus.select(
      max(aggregate(col(vecCol), lit(0.0),
        (acc, x) => greatest(acc, abs(x.cast("double"))))).as("__mx"))
    def quant(df: DataFrame, id: String, v: String, qv: String, qn: String) =
      df.crossJoin(broadcast(scaleDf))
        .select(col(idCol).as(id), col(vecCol).as(v),
          transform(col(vecCol),
            x => round(x.cast("double") / col("__mx") * 127).cast("byte"))
            .as(qv))
        .select(col(id), col(v), col(qv),
          sqrt(aggregate(col(qv), lit(0.0),
            (acc, x) => acc + x.cast("double") * x.cast("double"))).as(qn))
    val c = quant(corpus, "cand_id", "cv", "cqv", "cqn")
    val q = broadcast(quant(queries, "q_id", "qv", "qqv", "qqn"))
    val cands = c.join(q, col("cand_id") =!= col("q_id"))
      .select(col("q_id"),
        (byteDot(col("cqv"), col("qqv")).cast("double") /
          (col("cqn") * col("qqn"))).as("asim"),
        col("cand_id"))
      .groupBy("q_id")
      .agg(topKAgg(col("asim"), col("cand_id"), k * candMult).as("top"))
      .select(col("q_id"), explode(col("top")).as("c"))
      .select(col("q_id"), col("c.id").as("cand_id"))
    cands
      .join(corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv")),
        Seq("cand_id"))
      .join(broadcast(
        queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"))),
        Seq("q_id"))
      .groupBy("q_id")
      .agg(topKAgg(cosine(col("qv"), col("cv")), col("cand_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("cand_id"))
  }

  /** Per-cell mean centroids (the IVF coarse codebook), computed from
    * a cell-assignment column: posexplode → per-(cell,dim) avg →
    * re-assembled arrays. Two small shuffles, output is tiny and
    * broadcastable. */
  def centroids(df: DataFrame, cellCol: String, vecCol: String): DataFrame =
    df.select(col(cellCol).as("cell"), posexplode(col(vecCol)))
      .groupBy(col("cell"), col("pos")).agg(avg(col("col")).as("m"))
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("centroid"))

  /** IVF-style ANN: assign each query to its `nprobe` nearest
    * centroids, search only those cells, exact-rerank. The corpus is
    * pre-partitioned by cell (the inverted file); a probe touches
    * nprobe/|cells| of the data. */
  def ivfAnn(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      cellCol: String,
      k: Int,
      nprobe: Int = 2): DataFrame = {
    val cents = broadcast(centroids(corpus, cellCol, vecCol))
    val wq = Window.partitionBy(col("q_id"))
      .orderBy(col("csim").desc, col("cell"))
    val probed = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"))
      .crossJoin(cents)
      .withColumn("csim", cosine(col("qv"), col("centroid")))
      .withColumn("crank", row_number().over(wq))
      .filter(col("crank") <= nprobe)
      .select(col("q_id"), col("qv"), col("cell"))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
      col(cellCol).as("cell"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    c.join(broadcast(probed),
        Seq("cell")).filter(col("cand_id") =!= col("q_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("cand_id"))
  }
}
