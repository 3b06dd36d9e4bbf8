package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for the round-11 sf1.0 rehearsal: replicate the
  * driver's sf0.1 tables `copies`× by KEY-SHIFTED union — copy k adds
  * k·10⁸ to every entity key, copy 0 is the source verbatim (so
  * literal key lookups keep hitting). Why replication and not fresh
  * synthesis: it preserves every per-key distribution EXACTLY (block
  * sizes, group cardinalities, text/shingle statistics, FK fan-outs
  * all stay constant while row counts scale), which is precisely what
  * a scaling-exponent measurement wants — a healthy operator should
  * time ~linearly in copies, and any super-linear key is the
  * operator's fault, not the data's. Dimensions (region, nation) stay
  * fixed, TPC-H style; events keep their timestamps (10× density in
  * the same time range — the streaming-fold stress we want) under
  * fresh per-copy user/event ids; embeddings get a tiny deterministic
  * first-component nudge per copy so replicated vectors are not
  * exactly tied in top-k orderings.
  *
  * Output is one PLAIN parquet file per table (name.parquet), the
  * same layout the driver ships, so graft.Tables.load AND the DuckDB
  * oracle read it unchanged. Deterministic end to end — no RNG, no
  * clock.
  *
  * FRESH mode (round 13, VERDICT r12 "What's wrong" #5): replication
  * preserves distributions exactly — which is what EXPONENT
  * measurement wants — but it also gives every vector 10 key-shifted
  * near-twins, so ANN recall saturates at 1.000 and near-dup answer
  * mass is a replication artifact, not a corpus property. `fresh`
  * re-SYNTHESIZES documents and embeddings at copies× the source
  * row count from the source's measured generative family (new
  * keys, new text, new vectors; no replication):
  *
  *   - documents: tokens iid from the source's 30-word uniform
  *     vocabulary, token count uniform [10,100], lang multinomial
  *     (en ≈ 0.41, the other four ≈ 0.15 each), source uniform over
  *     src0..src19; 5% of docs are near-twins of their predecessor
  *     (base text + " dup" — the source's own planting scheme,
  *     measured: 250/5000 docs carry the dup marker) and 1/625 are
  *     exact copies (measured: 8/5000 duplicate texts);
  *   - embeddings: unit-norm 64-dim hash-seeded Box-Muller gaussian
  *     vectors (the source's family: near-orthogonal, max pairwise
  *     cos ≈ 0.6 at 2000 rows), labels uniform 0..9; 2% are noisy
  *     twins of their predecessor (cos ≈ 0.95) so near-dup operators
  *     stay exercised at a realistic (non-replicated) rate.
  *
  * Everything is a pure function of (doc id, position, seed) via
  * xxhash64 — column expressions end to end, no RNG object, no
  * driver loop, no join. The TPC-H/events tables keep the key-shift
  * replication even in fresh mode: their operators' semantics don't
  * depend on content novelty, and preserving their per-key
  * distributions exactly is still what their exponents want.
  *
  * Usage: runMain graft.tools.ScaleGen <srcDir> <outDir> [copies=10] [fresh]
  */
object ScaleGen {
  private val Off = 100000000L // key shift per copy, >> any source key

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try run(spark, args(0), args(1),
      if (args.length > 2) args(2).toInt else 10,
      fresh = args.length > 3 && args(3) == "fresh")
    finally spark.stop()
  }

  /** Session-agnostic body (specs drive it on the shared suite
    * session; main owns session lifecycle). */
  def run(spark: SparkSession, srcDir: String, outDir: String,
      copies: Int, fresh: Boolean = false): Unit = {
    new java.io.File(outDir).mkdirs()

    def read(name: String): DataFrame =
      spark.read.parquet(s"$srcDir/$name.parquet")

    /** Union `copies` key-shifted replicas; `shift` maps (df, offset)
      * to the shifted replica. Copy 0 must be the identity. */
    def replicate(df: DataFrame)(shift: (DataFrame, Long) => DataFrame)
        : DataFrame =
      (0 until copies).map(k => shift(df, k * Off)).reduce(_ unionByName _)

    def shiftCols(cols: String*)(df: DataFrame, off: Long): DataFrame =
      cols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(off)))

    /** Write as the driver's single-file layout: name.parquet as a
      * plain file (DuckDB's read_parquet takes it directly) — but
      * with row groups sized so the file carries ~32 of them instead
      * of ONE. Round 12 found every sf1.0 scan was single-task: the
      * default 128 MB parquet.block.size put each table in one row
      * group, and row groups are the parallelism quantum for BOTH
      * engines (Spark assigns row groups to splits by midpoint;
      * DuckDB parallelizes per row group) — a 113 MB lineitem
      * monofile serialized every scan-bound key onto one core, in
      * both engines. Real 100 TB corpora arrive as thousands of
      * files with 8-128 MB row groups; ~32 groups per table is the
      * realistic fixture, and it is identical ROWS in the identical
      * order (chunking only). */
    def write(df: DataFrame, name: String): Unit = {
      val srcBytes = new java.io.File(s"$srcDir/$name.parquet").length()
      val block = math.max(1L << 20, srcBytes * copies / 32)
      val tmp = s"$outDir/_tmp_$name"
      df.coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", block)
        .parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file under $tmp"))
      val dst = new java.io.File(s"$outDir/$name.parquet")
      if (dst.exists()) dst.delete()
      java.nio.file.Files.move(part.toPath, dst.toPath)
      new java.io.File(tmp).listFiles().foreach(_.delete())
      new java.io.File(tmp).delete()
      println(s"[scalegen] $name: ${spark.read.parquet(dst.toString).count()} rows")
    }

    // dimensions: fixed
    write(read("region"), "region")
    write(read("nation"), "nation")
    // entities: every key column shifts by the same per-copy offset,
    // so each replica's FK graph is internally consistent
    write(replicate(read("customer"))(shiftCols("c_custkey")), "customer")
    write(replicate(read("supplier"))(shiftCols("s_suppkey")), "supplier")
    write(replicate(read("part"))(shiftCols("p_partkey")), "part")
    write(replicate(read("orders"))(
      shiftCols("o_orderkey", "o_custkey")), "orders")
    write(replicate(read("lineitem"))(
      shiftCols("l_orderkey", "l_partkey", "l_suppkey")), "lineitem")
    write(replicate(read("events"))(
      shiftCols("event_id", "user_id")), "events")
    if (fresh) {
      val nDocs = read("documents").count() * copies
      val nVecs = read("embeddings").count() * copies
      write(freshDocuments(spark, nDocs), "documents")
      write(freshEmbeddings(spark, nVecs), "embeddings")
    } else {
      write(replicate(read("documents"))(shiftCols("doc_id")), "documents")
      write(replicate(read("embeddings")) { (df, off) =>
        val k = off / Off
        shiftCols("vec_id")(df, off)
          .withColumn("embedding",
            transform(col("embedding"), (x, i) =>
              when(i === 0, x + lit((k * 1e-3).toFloat)).otherwise(x)))
      }, "embeddings")
    }
  }

  /** Uniform-ish hash in [0, 1): xxhash64 of (cols..., salt), folded
    * to 30 mantissa-sized bits. Pure column expression. */
  private def u01(salt: Long, cols: org.apache.spark.sql.Column*)
      : org.apache.spark.sql.Column =
    pmod(xxhash64(cols :+ lit(salt): _*), lit(1L << 30)).cast("double") /
      lit((1L << 30).toDouble)

  /** Fresh documents table: deterministic synthesis from the source's
    * measured family (see object scaladoc). Every doc's text is a
    * pure function of a GENERATOR id, so near-twins/exact dups
    * recompute their base's tokens without a join: id % 20 == 19 →
    * predecessor's text + " dup"; id % 625 == 311 → the text of
    * id − 2 (both bases are themselves normal docs). */
  private[graft] def freshDocuments(
      spark: SparkSession, n: Long): org.apache.spark.sql.DataFrame = {
    // the source corpus's 30-word vocabulary (its 31st token is the
    // planted "dup" marker, handled below)
    val words = Seq("spark", "window", "merge", "table", "column",
      "vector", "stream", "value", "data", "small", "join", "filter",
      "big", "group", "hash", "customer", "sort", "order", "slow",
      "line", "part", "fast", "the", "row", "agg", "key", "query",
      "a", "scan", "batch")
    val vocab = array(words.map(lit): _*)
    val id = col("id")
    // generator id: whose token stream this doc carries. The exact
    // dup must copy a NORMAL doc — when id − 2 is itself a twin
    // ((id−2) % 20 == 19, so its text carries the " dup" marker the
    // plain token stream can't reproduce), step back one more.
    val dupBase = when(pmod(id - 2, lit(20)) === 19, id - 3)
      .otherwise(id - 2)
    val gid = when(pmod(id, lit(20)) === 19, id - 1)
      .when(pmod(id, lit(625)) === 311, dupBase)
      .otherwise(id)
    // token count: uniform [10, 100], a function of the GENERATOR
    val len = (pmod(xxhash64(gid, lit(1L)), lit(91)) + 10).cast("int")
    val toks = transform(sequence(lit(1), len),
      j => element_at(vocab,
        (pmod(xxhash64(gid, j, lit(2L)), lit(30)) + 1).cast("int")))
    val baseText = array_join(toks, " ")
    val text = when(pmod(id, lit(20)) === 19, concat(baseText, lit(" dup")))
      .otherwise(baseText)
    // lang: measured multinomial (en 0.41, others ~0.1475); source:
    // uniform over 20 — both functions of the DOC id (twins carry
    // their own metadata)
    val lr = u01(3L, id)
    val lang = when(lr < 0.41, "en").when(lr < 0.5575, "zh")
      .when(lr < 0.705, "es").when(lr < 0.8525, "fr").otherwise("de")
    spark.range(n).select(
      id.as("doc_id"),
      text.as("text"),
      lang.as("lang"),
      concat(lit("src"), pmod(xxhash64(id, lit(4L)), lit(20))).as("source"),
      length(text).cast("long").as("n_chars"))
  }

  /** Fresh embeddings table: unit-norm 64-dim Box-Muller gaussians
    * from (id, component, seed) hashes; id % 50 == 49 is a noisy
    * twin of its predecessor (cos ≈ 0.95 by construction: 0.95·base
    * + 0.312·own-noise, renormalized). */
  private[graft] def freshEmbeddings(
      spark: SparkSession, n: Long): org.apache.spark.sql.DataFrame = {
    val id = col("id")
    def gauss(gid: org.apache.spark.sql.Column,
        i: org.apache.spark.sql.Column) = {
      // Box-Muller; clamp u1 away from 0 so ln stays finite
      val u1 = greatest(u01(10L, gid, i), lit(1e-9))
      val u2 = u01(11L, gid, i)
      sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2)
    }
    val isTwin = pmod(id, lit(50)) === 49
    val raw = transform(sequence(lit(0), lit(63)), i => {
      val own = gauss(id, i)
      when(isTwin, gauss(id - 1, i) * 0.95 + own * 0.31201922)
        .otherwise(own)
    })
    val norm = sqrt(aggregate(raw, lit(0.0), (acc, x) => acc + x * x))
    spark.range(n).select(
      id.as("vec_id"),
      transform(raw, x => (x / norm).cast("float")).as("embedding"),
      pmod(xxhash64(id, lit(12L)), lit(10)).cast("int").as("label"))
  }
}
