package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSuite {

  test("stub decoder derives deterministic metadata from bytes") {
    val stub = Multimodal.Md5PrefixDecoder()
    assert(stub.decode(Array[Byte](65, 66, 67)) ==
      Some((256L + 65, 256L + 66)))
    assert(stub.decode(Array.emptyByteArray) == Some((256L, 256L)))
  }

  test("BmpHeaderDecoder parses real headers, rejects corrupt (None)") {
    // minimal BMP header: "BM" + 16 filler bytes + width/height LE
    def bmp(w: Int, h: Int): Array[Byte] = {
      val b = new Array[Byte](26)
      b(0) = 'B'; b(1) = 'M'
      for (i <- 0 until 4) {
        b(18 + i) = ((w >> (8 * i)) & 0xff).toByte
        b(22 + i) = ((h >> (8 * i)) & 0xff).toByte
      }
      b
    }
    assert(Multimodal.BmpHeaderDecoder.decode(bmp(640, 480)) ==
      Some((640L, 480L)))
    assert(Multimodal.BmpHeaderDecoder.decode(bmp(1, 1 << 20)) ==
      Some((1L, (1 << 20).toLong)))
    // corrupt: wrong magic, truncated header, empty
    assert(Multimodal.BmpHeaderDecoder.decode(
      "XX not a bmp at all.......".getBytes) == None)
    assert(Multimodal.BmpHeaderDecoder.decode(Array[Byte]('B', 'M')) ==
      None)
    assert(Multimodal.BmpHeaderDecoder.decode(Array.emptyByteArray) ==
      None)
  }

  test("decodeFeatures honors the corrupt->null contract per decoder") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "not a bmp, long enough to pass length"),
      (2L, "BM" + ("x" * 30))).toDF("doc_id", "text")
    // stub: everything decodes
    val stub = Multimodal.decodeFeatures(docs, "doc_id", "text")
    assert(stub.filter(col("width").isNull).count() == 0)
    // bmp: row 1 is corrupt -> null dims, row kept with byte length
    val bmp = Multimodal.decodeFeatures(docs, "doc_id", "text",
      Multimodal.BmpHeaderDecoder)
    val r1 = bmp.filter(col("doc_id") === 1).collect().head
    assert(r1.isNullAt(r1.fieldIndex("width")) &&
      r1.isNullAt(r1.fieldIndex("height")))
    assert(r1.getLong(r1.fieldIndex("n_bytes")) > 0)
    val r2 = bmp.filter(col("doc_id") === 2).collect().head
    assert(!r2.isNullAt(r2.fieldIndex("width")))
  }

  test("payloadDedup plan shape is decoder-invariant: signatures " +
      "shuffle, payload bytes never do") {
    // parquet-backed so the optimizer cannot collapse the plan to a
    // LocalTableScan (local relations constant-fold the whole dedup)
    val docs = Tables.load(spark, sfDir, "documents")
    for (dec <- Seq[Multimodal.PayloadDecoder](
        Multimodal.Md5PrefixDecoder(32), Multimodal.BmpHeaderDecoder)) {
      val plan = Multimodal.payloadDedupWith(docs, "doc_id", "text", dec)
        .queryExecution.executedPlan.toString
      // the signature aggregate's exchange carries (fp, ...) — the
      // payload column must be projected away before any exchange
      val exchanges = plan.split("Exchange").drop(1)
      assert(exchanges.nonEmpty, s"[$dec] no exchange found:\n$plan")
      assert(!exchanges.exists(_.split("\n").head.contains("text")),
        s"[${dec.name}] payload column reached an exchange:\n$plan")
      // no UDF anywhere: the fingerprint is a codegen'd expression
      assert(!plan.toLowerCase.contains("batchevalpython") &&
        !plan.contains("ScalaUDF"), s"[${dec.name}] UDF in plan")
    }
  }

  test("payloadDedup: corrupt payloads (null fp) never dedup together") {
    import spark.implicits._
    // two IDENTICAL corrupt payloads + one BMP pair sharing bytes
    val bm = "BM" + ("z" * 40)
    val docs = Seq((1L, "corrupt equal"), (2L, "corrupt equal"),
      (3L, bm), (4L, bm)).toDF("doc_id", "text")
    val got = Multimodal.payloadDedupWith(docs, "doc_id", "text",
        Multimodal.BmpHeaderDecoder)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(1L) == (1L, 1L) && got(2L) == (1L, 1L),
      s"corrupt payloads must stay kept singletons: $got")
    assert(got(3L) == (2L, 1L) && got(4L) == (2L, 0L),
      s"valid identical BMPs must dedup to the min id: $got")
  }

  test("decodeFeatures preserves rows and byte lengths end-to-end") {
    val docs = Tables.load(spark, sfDir, "documents")
    val res = Multimodal.decodeFeatures(docs, "doc_id", "text")
    assert(res.count() == docs.count())
    import org.apache.spark.sql.functions._
    val mismatch = res.join(docs, "doc_id")
      .filter(col("n_bytes") =!= length(col("text"))).count()
    assert(mismatch == 0)
  }

  test("sampleFrames explodes each payload into k frames covering all bytes") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sfDir, "documents")
    val frames = Multimodal.sampleFrames(docs, "doc_id", "text", 4)
    // exactly k frames per doc, indices 0..k-1
    val perDoc = frames.groupBy("doc_id")
      .agg(count(lit(1)).as("n"),
        sum("n_frame_bytes").as("covered"),
        min("frame_idx").as("lo"), max("frame_idx").as("hi"))
    assert(perDoc.filter(col("n") =!= 4 || col("lo") =!= 0 ||
      col("hi") =!= 3).count() == 0)
    // frame slices tile the payload exactly: lengths sum to n_bytes
    val meta = Multimodal.decodeFeatures(docs, "doc_id", "text")
    assert(perDoc.join(meta, "doc_id")
      .filter(col("covered") =!= col("n_bytes")).count() == 0)
    // mean byte of printable ASCII text must land in [32, 127)
    assert(frames.filter(col("n_frame_bytes") > 0 &&
      (col("mean_byte") < 32 || col("mean_byte") >= 127)).count() == 0)
  }

  test("chunkPayload: stride-overlapping chunks cover every byte, tail kept") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sfDir, "documents")
    val (window, stride) = (100, 60)
    val chunks = Multimodal.chunkPayload(docs, "doc_id", "text",
      window, stride)
    val meta = Multimodal.decodeFeatures(docs, "doc_id", "text")
    val agg = chunks.groupBy("doc_id")
      .agg(count(lit(1)).as("k"), max("byte_start").as("last_start"),
        max(col("byte_start") + col("n_chunk_bytes")).as("covered_to"),
        min("n_chunk_bytes").as("min_len"), max("n_chunk_bytes").as("max_len"))
      .join(meta, "doc_id")
    // chunk count matches the closed form; coverage reaches the end
    val bad = agg.filter(
      col("k") =!= when(col("n_bytes") <= window, 1L)
        .otherwise(floor((col("n_bytes") - window + stride - 1) / stride) + 1)
      || col("covered_to") =!= col("n_bytes")
      || col("max_len") > window)
    assert(bad.count() == 0, bad.limit(3).collect().mkString("; "))
    // every byte position is inside at least one chunk: consecutive
    // starts differ by stride < window, so [0, covered_to) is gapless
    val gaps = chunks.select(col("doc_id"), col("byte_start"))
      .withColumn("gap", col("byte_start") -
        lag(col("byte_start"), 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("doc_id").orderBy("byte_start")))
    assert(gaps.filter(col("gap") > stride).count() == 0)
  }

  test("payloadDedup collapses shared signatures, keeps the min id") {
    import spark.implicits._
    val prefix = "A" * 32
    val docs = Seq(
      // same 32-byte prefix, different tails: the "re-encode" pair
      (10L, prefix + " tail one"),
      (3L, prefix + " a completely different continuation"),
      // differs inside the prefix window: distinct signature
      (5L, "B" + prefix.drop(1) + " tail")
    ).toDF("doc_id", "text")
    val got = Multimodal.payloadDedup(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got(3L) == (2L, 1L)) // min id of the pair is the keeper
    assert(got(10L) == (2L, 0L))
    assert(got(5L) == (1L, 1L)) // singleton keeps itself
  }

  test("frameDupProfile flags shared segments, not whole-payload equality") {
    import spark.implicits._
    // 32-byte payloads, 4 frames of 8 bytes each
    val intro = "INTROXYZ" // shared first frame
    val docs = Seq(
      (1L, intro + "aaaaaaaa" + "bbbbbbbb" + "cccccccc"),
      (2L, intro + "dddddddd" + "eeeeeeee" + "ffffffff"),
      (3L, "gggggggg" + "hhhhhhhh" + "iiiiiiii" + "jjjjjjjj")
    ).toDF("doc_id", "text")
    val got = Multimodal.frameDupProfile(docs, "doc_id", "text", 4)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // docs 1 and 2 share exactly the intro frame; doc 3 shares nothing
    assert(got(1L) == (4L, 1L, 0.25), s"doc1: ${got(1L)}")
    assert(got(2L) == (4L, 1L, 0.25), s"doc2: ${got(2L)}")
    assert(got(3L) == (4L, 0L, 0.0), s"doc3: ${got(3L)}")
  }

  test("frameDupProfile matches sampleFrames' slice boundaries") {
    import spark.implicits._
    // a 10-byte payload over 4 frames: uneven slices 2/3/2/3 — the
    // signature arithmetic must cover every byte exactly once, the
    // same [f*n/k, (f+1)*n/k) arithmetic sampleFrames uses
    val docs = Seq((1L, "0123456789")).toDF("doc_id", "text")
    val lens = Multimodal.sampleFrames(docs, "doc_id", "text", 4)
      .collect().map(r => r.getAs[Long]("frame_idx") ->
        r.getAs[Long]("n_frame_bytes")).toMap
    assert(lens == Map(0L -> 2L, 1L -> 3L, 2L -> 2L, 3L -> 3L), s"$lens")
    val prof = Multimodal.frameDupProfile(docs, "doc_id", "text", 4)
      .collect().head
    assert(prof.getAs[Long]("n_frames") == 4L)
    assert(prof.getAs[Long]("n_dup") == 0L) // all four slices distinct
  }

  // ---- content-defined chunking (m08 / plans.CdcChunks) ----

  /** Deterministic pseudo-random printable text (no RNG object —
    * splitmix-ish arithmetic on the index). */
  private def synthText(n: Int, seed: Long): String = {
    val sb = new StringBuilder(n)
    var i = 0
    while (i < n) {
      var z = (seed + i) * 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      sb.append((33 + (math.abs(z) % 94)).toChar)
      i += 1
    }
    sb.toString
  }

  private def chunksOf(texts: Seq[(Long, String)]) = {
    import spark.implicits._
    Multimodal.cdcChunks(texts.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .groupBy(_.getLong(0)).view.mapValues(
        _.sortBy(_.getLong(1)).map(r =>
          (r.getLong(2), r.getLong(3), r.getString(4))).toSeq).toMap
  }

  test("CDC chunks tile the payload and honor min/max bounds") {
    val text = synthText(20000, 7L)
    val ch = chunksOf(Seq((1L, text)))(1L)
    assert(ch.nonEmpty)
    // contiguous tiling: starts chain and lengths sum to the payload
    var expectStart = 0L
    for ((start, len, _) <- ch) {
      assert(start == expectStart, s"gap at $start")
      expectStart = start + len
    }
    assert(expectStart == text.length.toLong)
    // bounds: every chunk <= max; every non-final chunk >= min
    assert(ch.forall(_._2 <= 1024))
    assert(ch.init.forall(_._2 >= 64),
      s"non-final chunk under minLen: ${ch.map(_._2)}")
    // content-defined: more than one chunk and not all maxLen-forced
    assert(ch.size > 4 && ch.map(_._2).distinct.size > 2)
  }

  test("CDC boundaries re-synchronize after an insertion; a fixed " +
      "grid shares nothing") {
    val base = synthText(20000, 11L)
    val shifted = synthText(137, 13L) + base
    val m = chunksOf(Seq((1L, base), (2L, shifted)))
    val baseHashes = m(1L).map(_._3)
    val shiftedHashes = m(2L).map(_._3).toSet
    // every base chunk except the first few (pre-resync) and the
    // forced tail must reappear verbatim in the shifted payload
    val shared = baseHashes.count(shiftedHashes)
    assert(shared >= baseHashes.size - 4,
      s"CDC resync failed: ${shared}/${baseHashes.size} chunks shared")
    // the fixed-grid contrast: m03-style 256-byte windows of the
    // same two payloads share NO window hashes (insertion shifts
    // every grid cell's content)
    val grid = Multimodal.chunkPayload(
      { import spark.implicits._
        Seq((1L, base), (2L, shifted)).toDF("doc_id", "text") },
      "doc_id", "text", window = 256, stride = 256)
      .collect().groupBy(_.getAs[Long]("doc_id"))
    def gridSigs(rows: Array[org.apache.spark.sql.Row], text: String) =
      rows.map { r =>
        val st = r.getAs[Long]("byte_start").toInt
        val len = r.getAs[Long]("n_chunk_bytes").toInt
        text.substring(st, st + len)
      }.toSet
    val g1 = gridSigs(grid(1L), base)
    val g2 = gridSigs(grid(2L), shifted)
    // the only possible collisions are accidental; with 137 not a
    // multiple of 256 the grids are fully misaligned
    assert(g1.intersect(g2).isEmpty,
      "fixed grid unexpectedly aligned after insertion")
  }

  test("CDC chunking is deterministic and per-row independent " +
      "(same text -> same cuts regardless of neighbors)") {
    val t = synthText(5000, 3L)
    val alone = chunksOf(Seq((1L, t)))(1L)
    val crowded = chunksOf(Seq((7L, synthText(900, 5L)), (8L, t),
      (9L, "")))(8L)
    assert(alone == crowded)
  }

  test("CDC edge payloads: empty text yields zero chunks, tiny text " +
      "yields one sub-min final chunk") {
    val m = chunksOf(Seq((1L, ""), (2L, "abc")))
    assert(!m.contains(1L) || m(1L).isEmpty)
    assert(m(2L).size == 1)
    val (st, len, sig) = m(2L).head
    assert(st == 0L && len == 3L)
    // the signature is md5 of the whole tiny payload
    assert(sig == java.security.MessageDigest.getInstance("MD5")
      .digest("abc".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString)
  }
}
