package graft

import org.apache.spark.sql.functions._
import scala.util.Random

import graft.functions.Normalize
import graft.operators.Percentiles
import graft.plans.TopKBuffer

/** Randomized property specs (seeded — reproducible) for the
  * deterministic cores: normalization idempotence/shape, heap top-k
  * vs sort, heap merge associativity, percentile parity. */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private val rnd = new Random(4242)

  private def randomString(): String = {
    val len = rnd.nextInt(30)
    (0 until len).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
  }

  test("cleanText is idempotent and zip5 yields 5 digits or empty (500 random inputs)") {
    val inputs = (0 until 500).map(_ => randomString())
    val rows = inputs.toDF("x").select(
      Normalize.cleanText(col("x")).as("c1"),
      Normalize.cleanText(Normalize.cleanText(col("x"))).as("c2"),
      Normalize.zip5(col("x")).as("z")).collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1), "cleanText not idempotent")
      val z = r.getString(2)
      assert(z == "" || (z.length == 5 && z.forall(_.isDigit)),
        s"bad zip5: '$z'")
    }
  }

  test("featureBucket: in [0, dim), deterministic, matches JVM md5") {
    import graft.functions.TextFns
    val words = (0 until 200).map(_ => randomString()).filter(_.nonEmpty)
    val got = words.toDF("w")
      .select(col("w"), TextFns.featureBucket(col("w"), 32).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    words.foreach { w =>
      val hex = md.digest(w.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val expect = java.lang.Long.parseLong(hex, 16) % 32
      assert(got(w) == expect, s"bucket mismatch for '$w'")
      assert(got(w) >= 0 && got(w) < 32)
    }
  }

  test("rangeJoin equals naive inequality join on random windows (5 trials)") {
    import graft.operators.Temporal
    (1 to 5).foreach { _ =>
      val n = 120
      val span = 1000000L * (60 + rnd.nextInt(600)) // up to 11 min of us
      val lRows = (0 until n).map(i =>
        (i.toLong, new java.sql.Timestamp(1704067200000L +
          (rnd.nextLong().abs % span) / 1000)))
      val rRows = (0 until n).map(i =>
        (1000L + i, new java.sql.Timestamp(1704067200000L +
          (rnd.nextLong().abs % span) / 1000)))
      val l = lRows.toDF("lid", "ts")
      val r = rRows.toDF("rid", "r_ts")
      val lower = -1000000L * rnd.nextInt(120)
      val upper = lower + 1000000L * (1 + rnd.nextInt(180))
      val binned = Temporal.rangeJoin(l, "ts", r, "r_ts", lower, upper)
        .select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      val naive = l.join(r,
          unix_micros(col("r_ts")) >= unix_micros(col("ts")) + lower &&
            unix_micros(col("r_ts")) <= unix_micros(col("ts")) + upper)
        .select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(binned == naive,
        s"window [$lower,$upper]: missing=${naive -- binned} " +
          s"extra=${binned -- naive}")
    }
  }

  test("TopKBuffer equals sort-take-k on random inputs (200 trials)") {
    (0 until 200).foreach { _ =>
      val n = rnd.nextInt(40)
      val pairs = List.fill(n)(
        (rnd.nextInt(20).toDouble, rnd.nextInt(30).toLong)) // many ties
      val k = 1 + rnd.nextInt(6)
      val buf = new TopKBuffer(k)
      pairs.foreach { case (s, i) => buf.add(s, i) }
      val viaSort = pairs
        .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
        .take(k)
      assert(buf.sortedDesc.toList == viaSort,
        s"heap ${buf.sortedDesc.toList} vs sort $viaSort for $pairs k=$k")
    }
  }

  test("heap merge equals bulk insert (200 trials)") {
    (0 until 200).foreach { _ =>
      val p1 = List.fill(rnd.nextInt(20))(
        (rnd.nextInt(15).toDouble, rnd.nextInt(20).toLong))
      val p2 = List.fill(rnd.nextInt(20))(
        (rnd.nextInt(15).toDouble, rnd.nextInt(20).toLong))
      val merged = new TopKBuffer(4)
      p1.foreach { case (s, i) => merged.add(s, i) }
      val other = new TopKBuffer(4)
      p2.foreach { case (s, i) => other.add(s, i) }
      merged.addAll(other)
      val bulk = new TopKBuffer(4)
      (p1 ++ p2).foreach { case (s, i) => bulk.add(s, i) }
      assert(merged.sortedDesc.toList == bulk.sortedDesc.toList)
    }
  }

  test("LowerBound equals a linear scan under Spark double ordering (incl NaN, ±0.0)") {
    // reference: count of boundaries strictly below v under Spark SQL
    // ordering (NaN largest, -0.0 == 0.0)
    def ref(bnds: Array[Double], v: Double): Int =
      bnds.count(b => org.apache.spark.sql.catalyst.util.SQLOrderingUtil
        .compareDoubles(b, v) < 0)
    val special = Array(Double.NaN, 0.0, -0.0, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.MinPositiveValue)
    val cases = (0 until 120).map { _ =>
      val n = rnd.nextInt(8)
      val bnds = Array.fill(n)(
        if (rnd.nextInt(4) == 0) special(rnd.nextInt(special.length))
        else rnd.nextInt(10).toDouble)
        .sortWith((a, b) => org.apache.spark.sql.catalyst.util
          .SQLOrderingUtil.compareDoubles(a, b) < 0)
      val v = if (rnd.nextInt(3) == 0) special(rnd.nextInt(special.length))
        else rnd.nextInt(10).toDouble
      (bnds, v)
    }
    val got = cases.toDF("bnds", "v")
      .select(org.apache.spark.sql.GraftBridge.column(
        graft.plans.LowerBound(
          org.apache.spark.sql.GraftBridge.expression(col("bnds")),
          org.apache.spark.sql.GraftBridge.expression(col("v")))))
      .collect().map(_.getInt(0))
    cases.zip(got).foreach { case ((bnds, v), g) =>
      assert(g == ref(bnds, v),
        s"lower_bound(${bnds.mkString(",")}, $v) = $g, want ${ref(bnds, v)}")
    }
  }

  // ---- adversarial oracle-parity fuzzing: the DuckDB gate runs on
  // fixed synthetic data; these drive the same deterministic cores
  // with hostile random inputs (unicode, invalid dates, IEEE edges)
  // against independent JVM reference models.

  private def randomUnicode(): String = {
    val combining = "̧́̈̃̊" // ́ ̈ ̧ ̃ ̊
    val len = rnd.nextInt(24)
    (0 until len).map { _ =>
      rnd.nextInt(5) match {
        case 0 => combining(rnd.nextInt(combining.length))
        case 1 => (0xc0 + rnd.nextInt(0x17f - 0xc0)).toChar // latin supp/ext
        case 2 => (0x3b1 + rnd.nextInt(24)).toChar // greek
        case 3 => " \t\n".charAt(rnd.nextInt(3))
        case _ => (32 + rnd.nextInt(95)).toChar
      }
    }.mkString
  }

  test("nfc matches JDK Normalizer on hostile unicode (300 random inputs)") {
    val inputs = (0 until 300).map(_ => randomUnicode())
    val got = inputs.toDF("x")
      .select(col("x"), Normalize.nfc(col("x")).as("n"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    inputs.foreach { s =>
      val expect = java.text.Normalizer
        .normalize(s, java.text.Normalizer.Form.NFC)
      assert(got(s) == expect,
        s"NFC mismatch for ${s.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("fingerprint md5 matches JVM digest over UTF-8 on unicode inputs") {
    import graft.functions.TextFns
    val inputs = (0 until 200).map(_ => randomUnicode())
    val got = inputs.toDF("x")
      .select(col("x"), TextFns.fingerprint(col("x")).as("f"),
        Normalize.cleanText(col("x")).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val md = java.security.MessageDigest.getInstance("MD5")
    got.foreach { case (s, f, cleaned) =>
      val expect = md.digest(cleaned.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(f == expect, s"md5 mismatch for '$s'")
    }
  }

  test("parseYyyymmdd: valid ints round-trip via LocalDate, invalid are null") {
    // mix of genuinely valid dates, structurally-8-digit-but-invalid
    // (month 13, day 32, Feb 30), and junk magnitudes
    val inputs = (0 until 400).map { _ =>
      rnd.nextInt(4) match {
        case 0 => 19000101 + rnd.nextInt(1100000)
        case 1 => 20000000 + rnd.nextInt(10000) // often invalid m/d
        case 2 => rnd.nextInt(99999999)
        case _ => Seq(0, -1, 20231301, 20230230, 20230732,
          99999999)(rnd.nextInt(6))
      }
    }
    val got = inputs.toDF("x")
      .select(col("x"), Normalize.parseYyyymmdd(col("x")).as("d"))
      .collect()
      .map(r => r.getInt(0) ->
        Option(r.getDate(1)).map(_.toString)).toMap
    inputs.foreach { i =>
      val expect =
        try {
          val s = i.toString
          if (s.length != 8) None
          else Some(java.time.LocalDate.parse(s,
            // Spark's CORRECTED parser = java.time STRICT with 'y'
            // rewritten to 'u' (no era), so the JVM model uses uuuu
            java.time.format.DateTimeFormatter.ofPattern("uuuuMMdd")
              .withResolverStyle(java.time.format.ResolverStyle.STRICT)
              .withLocale(java.util.Locale.ROOT))
            .toString)
        } catch { case _: Exception => None }
      assert(got(i) == expect,
        s"date parse mismatch for $i: got ${got(i)}, expected $expect")
    }
  }

  test("histogram bucket arithmetic matches a JVM IEEE model (5 random trials)") {
    import graft.operators.Quality
    (1 to 5).foreach { _ =>
      val n = 200 + rnd.nextInt(300)
      val scale = math.pow(10, rnd.nextInt(6) - 3)
      val vals = (0 until n).map(_ =>
        (rnd.nextDouble() - 0.5) * scale)
      val nBuckets = 1 + rnd.nextInt(12)
      val got = vals.toDF("v")
        .select(col("v"))
        .transform(df => Quality.histogram(df, col("v"), nBuckets))
        .collect()
        .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("n")).toMap
      // same fixed IEEE shape as the operator: w = (mx-mn)/n,
      // bucket = min(floor((v-mn)/w), n-1)
      val mn = vals.min; val mx = vals.max
      val w = (mx - mn) / nBuckets
      val expect = vals.groupBy { v =>
        if (mx == mn) 0L
        else math.min(math.floor((v - mn) / w).toLong, nBuckets - 1L)
      }.map { case (b, vs) => b -> vs.size.toLong }
      assert(got == expect,
        s"histogram mismatch: nBuckets=$nBuckets got=$got expect=$expect")
    }
  }

  test("tokensLower matches a JVM split model on hostile whitespace") {
    import graft.functions.TextFns
    val inputs = (0 until 300).map(_ => randomUnicode())
    val got = inputs.toDF("x")
      .select(col("x"), TextFns.tokensLower(col("x")).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    inputs.foreach { s =>
      // Spark's trim strips ONLY ASCII spaces (0x20); String.trim
      // would also strip \t\n and silently diverge — model Spark
      val t = s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
      // Spark's split keeps empty fields (Java limit=-1): an
      // all-whitespace string tokenizes to ["", ""], not [] —
      // default Java split would silently drop the trailing empties
      val expect = t.toLowerCase(java.util.Locale.ROOT)
        .split("\\s+", -1).toSeq
      assert(got(s) == expect,
        s"token mismatch for ${s.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("redactPii matches java.util.regex on randomized PII-laced text") {
    import graft.functions.TextFns
    def piiText(): String = {
      val parts = (0 until rnd.nextInt(6)).map { _ =>
        rnd.nextInt(4) match {
          case 0 => s"u${rnd.nextInt(999)}@ex${rnd.nextInt(99)}.com"
          case 1 => f"${rnd.nextInt(1000)}%03d-${rnd.nextInt(1000)}%03d-${rnd.nextInt(10000)}%04d"
          case 2 => randomString()
          // adversarial near-misses: missing TLD, short groups
          case _ => Seq("a@b", "12-345-6789", "user@@x.com",
            "@nodomain", "999-999-99999")(rnd.nextInt(5))
        }
      }
      parts.mkString(" ")
    }
    val inputs = (0 until 300).map(_ => piiText())
    val got = inputs.toDF("x")
      .select(col("x"), TextFns.redactPii(col("x")).as("r"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    inputs.foreach { s =>
      val expect = s.replaceAll(TextFns.EmailRe, "<EMAIL>")
        .replaceAll(TextFns.PhoneRe, "<PHONE>")
      assert(got(s) == expect, s"redaction mismatch for '$s'")
    }
  }

  test("wordNgrams matches a JVM sliding-window model (300 random docs)") {
    import graft.functions.TextFns
    // random word-ish docs incl. empty / single-token / repeated-token
    def doc(): String = (0 until rnd.nextInt(8))
      .map(_ => Seq("aa", "bb", "cc", "dd")(rnd.nextInt(4))).mkString(" ")
    val inputs = (0 until 300).map(_ => doc())
    (2 to 3).foreach { n =>
      val got = inputs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "x")
        .select(col("id"),
          TextFns.wordNgrams(TextFns.tokensLower(col("x")), n).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      inputs.zipWithIndex.foreach { case (s, i) =>
        val toks = s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ')
          .reverse.toLowerCase(java.util.Locale.ROOT).split("\\s+", -1).toSeq
        val expect =
          if (toks.size >= n) toks.sliding(n).map(_.mkString(" ")).toSeq
          else Seq.empty
        assert(got(i.toLong) == expect, s"n=$n mismatch for '$s'")
      }
    }
  }

  test("containment and jaccard on pairs match JVM set models (100 random pairs)") {
    import graft.operators.Dedup
    def doc(): String = (0 until rnd.nextInt(12))
      .map(_ => Seq("w1", "w2", "w3", "w4", "w5")(rnd.nextInt(5)))
      .mkString(" ")
    val docs = (0 until 200).map(i => (i.toLong, doc())).toDF("doc_id", "text")
    val pairs = (0 until 100).map(i => (2L * i, 2L * i + 1)).toDF("a_id", "b_id")
    def bigrams(s: String): Set[String] = {
      val t = s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ')
        .reverse.toLowerCase(java.util.Locale.ROOT).split("\\s+", -1).toSeq
      if (t.size >= 2) t.sliding(2).map(_.mkString(" ")).toSet else Set.empty
    }
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val gotC = Dedup.containmentOnPairs(pairs, docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_inter")))
      .toMap
    val gotJ = Dedup.jaccardOnPairs(pairs, docs, col("doc_id"), col("text"),
        ngram = 2)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        (r.getAs[Long]("n_inter"), r.getAs[Long]("n_union")))
      .toMap
    (0 until 100).foreach { i =>
      val (a, b) = (2L * i, 2L * i + 1)
      val (ba, bb) = (bigrams(texts(a)), bigrams(texts(b)))
      assert(gotC((a, b)) == ((ba.size.toLong, (ba & bb).size.toLong)),
        s"containment counts diverge for pair ($a,$b)")
      assert(gotJ((a, b)) == (((ba & bb).size.toLong, (ba | bb).size.toLong)),
        s"jaccard counts diverge for pair ($a,$b)")
    }
  }

  test("langId + wordSetHits match a JVM argmax model on salted token streams") {
    import graft.functions.TextFns
    // docs salted with real stopwords from several languages (forcing
    // ties and near-ties), hostile unicode words, and empty tokens
    val allStops = TextFns.LangStopwords.flatMap(_._2)
    def doc(): String = (0 until rnd.nextInt(14)).map { _ =>
      rnd.nextInt(3) match {
        case 0 => allStops(rnd.nextInt(allStops.size))
        case 1 => randomUnicode().replaceAll("\\s", "") match {
          case "" => "x"
          case w => w
        }
        case _ => "word" + rnd.nextInt(5)
      }
    }.mkString(" ")
    val inputs = (0 until 300).map(_ => doc())
    val got = inputs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "x")
      .select(col("id"),
        TextFns.langId(TextFns.tokensLower(col("x"))).as("lang"),
        TextFns.wordSetHits(TextFns.tokensLower(col("x")),
          TextFns.LangStopwords.head._2).as("en_hits"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    inputs.zipWithIndex.foreach { case (s, i) =>
      val toks = s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ')
        .reverse.toLowerCase(java.util.Locale.ROOT).split("\\s+", -1).toSeq
      val hits = TextFns.LangStopwords.map { case (l, ws) =>
        l -> toks.count(ws.contains) }
      // argmax with ties resolving to the EARLIER language; all-zero -> und
      val expect =
        if (hits.forall(_._2 == 0)) "und"
        else hits.maxBy(_._2)._1 // stable maxBy = first max, same rule
      val (gl, ge) = got(i.toLong)
      assert(gl == expect, s"langId mismatch for '$s': $gl vs $expect")
      assert(ge == hits.head._2, s"wordSetHits mismatch for '$s'")
    }
  }

  test("tokensBpeish matches java.util.regex split on punctuation-dense text") {
    import graft.functions.TextFns
    def doc(): String = (0 until rnd.nextInt(30)).map { _ =>
      rnd.nextInt(4) match {
        case 0 => ".,!?;:".charAt(rnd.nextInt(6)).toString
        case 1 => " "
        case 2 => ('a' + rnd.nextInt(26)).toChar.toString
        case _ => (0xc0 + rnd.nextInt(0x100)).toChar.toString
      }
    }.mkString
    val inputs = (0 until 300).map(_ => doc())
    val got = inputs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "x")
      .select(col("id"), TextFns.tokensBpeish(col("x")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    inputs.zipWithIndex.foreach { case (s, i) =>
      // Spark trim strips ASCII space only; split keeps empty fields
      val t = s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
      val expect = t.split("\\s+|(?=[.,!?;:])|(?<=[.,!?;:])", -1).toSeq
      assert(got(i.toLong) == expect,
        s"bpeish mismatch for '$s': ${got(i.toLong)} vs $expect")
    }
  }

  test("topElementCount matches a JVM max-multiplicity model (400 arrays)") {
    import graft.functions.TextFns
    def arr(): Seq[String] = (0 until rnd.nextInt(12)).map { _ =>
      rnd.nextInt(4) match {
        case 0 => "" // empty-string elements exercise the init sentinel
        case 1 => "é" + rnd.nextInt(3)
        case _ => "w" + rnd.nextInt(4)
      }
    }
    val inputs = (0 until 400).map(_ => arr())
    val got = inputs.zipWithIndex.map { case (a, i) => (i.toLong, a) }
      .toDF("id", "a")
      .select(col("id"), TextFns.topElementCount(col("a")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    inputs.zipWithIndex.foreach { case (a, i) =>
      val expect =
        if (a.isEmpty) 0 else a.groupBy(identity).values.map(_.size).max
      assert(got(i.toLong) == expect,
        s"topElementCount mismatch for $a: ${got(i.toLong)} vs $expect")
    }
  }

  test("punct count stays code-point correct under surrogate pairs") {
    // t02's punct feature: length(x) - length(regexp_replace(x, cls, ''))
    // Spark length() counts CODE POINTS; a JVM model using String.length
    // (UTF-16 units) diverges on emoji — model with codePointCount.
    def doc(): String = (0 until rnd.nextInt(20)).map { _ =>
      rnd.nextInt(4) match {
        case 0 => ".,!?;:".charAt(rnd.nextInt(6)).toString
        case 1 => new String(Character.toChars(0x1F600 + rnd.nextInt(48)))
        case 2 => ('a' + rnd.nextInt(26)).toChar.toString
        case _ => "é"
      }
    }.mkString
    val inputs = (0 until 300).map(_ => doc())
    val got = inputs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "x")
      .select(col("id"),
        (length(col("x")) -
          length(regexp_replace(col("x"), "[.,!?;:]", ""))).as("p"),
        length(col("x")).as("len"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    inputs.zipWithIndex.foreach { case (s, i) =>
      val punct = s.codePoints().toArray.count(".,!?;:".map(_.toInt).contains)
      val cps = s.codePointCount(0, s.length)
      assert(got(i.toLong) == ((punct, cps)),
        s"punct/len mismatch for '$s': ${got(i.toLong)} vs ($punct, $cps)")
    }
  }

  test("trunc4 rounding matches the JVM IEEE model on adversarial doubles") {
    // floor(x*10000)/10000 is the cross-engine rounding convention in
    // nearly every oracle. FOUND BY THIS FUZZ: Spark's floor(double)
    // returns BIGINT, so the result CLAMPS at ±Long.Max — beyond
    // |x| ≈ 9.2e14 Spark diverges from DuckDB's double-typed floor.
    // The convention is only ever applied to ratios/averages/prices
    // (far inside the boundary), and the JVM model below mirrors the
    // clamp so the boundary stays documented and pinned.
    val inputs = (0 until 500).map { _ =>
      rnd.nextInt(5) match {
        case 0 => (rnd.nextInt(20000) - 10000) / 10000.0 // exact 1e-4 grid
        case 1 => rnd.nextDouble() * 1e-8
        case 2 => -rnd.nextDouble()
        case 3 => rnd.nextDouble() * 1e12
        case _ => java.lang.Double.longBitsToDouble(rnd.nextLong()) match {
          case d if d.isNaN || d.isInfinite => 0.56789999
          case d => d
        }
      }
    }
    val got = inputs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
      .select(col("id"), (floor(col("v") * 10000) / 10000).as("t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    inputs.zipWithIndex.foreach { case (v, i) =>
      // Spark: Math.floor to double, cast to long (clamping), then
      // long/int division promotes to double
      val expect = math.floor(v * 10000).toLong.toDouble / 10000.0
      assert(java.lang.Double.compare(got(i.toLong), expect) == 0,
        s"trunc4 mismatch for $v: ${got(i.toLong)} vs $expect")
    }
  }

  test("sort-based percentiles match Spark's percentile aggregate (random groups)") {
    val data = (0 until 12).flatMap { g =>
      val n = 1 + rnd.nextInt(50)
      (0 until n).map(_ => (s"g$g", rnd.nextDouble() * 10000))
    }
    val df = data.toDF("grp", "v")
    val mine = Percentiles.exactByGroup(df, "grp", "v", Seq(0.5, 0.9))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val ref = df.groupBy("grp").agg(
        percentile(col("v"), lit(0.5)).as("p50"),
        percentile(col("v"), lit(0.9)).as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    ref.foreach { case (g, (p50, p90)) =>
      assert(math.abs(mine(g)._1 - p50) < 1e-9, s"$g p50")
      assert(math.abs(mine(g)._2 - p90) < 1e-9, s"$g p90")
    }
  }
}
