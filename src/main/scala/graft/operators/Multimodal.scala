package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata, and decode/feature-extraction runs as
  * a partition-wise batch transform (the Scala analog of a
  * `mapInPandas` batch UDF: one iterator per partition, streaming,
  * no driver involvement).
  *
  * The codec work is behind the typed [[PayloadDecoder]] seam: the
  * default [[Md5PrefixDecoder]] instance is a declared STUB (no
  * codec libraries in this environment) deriving deterministic fake
  * dimensions/signatures from the payload bytes; [[BmpHeaderDecoder]]
  * is a real pure-JVM drop-in proving the seam's contracts. The
  * Spark-side plumbing — schema, binary encoding, partition batch
  * shape, typed output — is real and oracle-checked either way.
  */
object Multimodal {

  /** THE decoder seam — the typed boundary between the engine's
    * multimodal plumbing (schema, partition batching, shuffle shape,
    * which is real and oracle-checked) and the codec work this
    * container cannot run. Implementations MUST uphold two contracts
    * the operators depend on:
    *
    *   1. corrupt -> null: [[PayloadDecoder.fingerprint]] yields a
    *      NULL column value and [[PayloadDecoder.decode]] yields None
    *      on payloads the decoder cannot parse — corrupt media must
    *      neither crash the pipeline nor dedup together;
    *   2. plan-shape preservation: fingerprint and frameSignature are
    *      COLUMN functions (codegen'd expressions, no UDF), so
    *      swapping decoders cannot change the dedup operators'
    *      exchanges — only payload SIGNATURES ever shuffle, never
    *      payload bytes; decode runs partition-wise (mapPartitions),
    *      so a heavyweight codec stays streaming with no driver
    *      involvement.
    *
    * [[Md5PrefixDecoder]] is the declared STUB instance (deterministic
    * fake dimensions, prefix-md5 signature — no codec libraries ship
    * in this environment); [[BmpHeaderDecoder]] is a REAL pure-JVM
    * decoder (BMP header parse) proving a drop-in honors both
    * contracts. MultimodalSpec drives both through the same
    * plan-shape asserts. */
  trait PayloadDecoder extends Serializable {
    def name: String

    /** Content signature for whole-payload dedup (pHash/chromaprint
      * in a real pipeline); corrupt -> NULL. Column-level so the
      * dedup plan stays codegen'd. */
    def fingerprint(payload: Column): Column

    /** Signature of one frame/segment slice (per-frame perceptual
      * hash in a real pipeline); corrupt -> NULL. */
    def frameSignature(slice: Column): Column = md5(slice)

    /** Typed metadata decode: (width, height) — or the modality's
      * equivalent — from the payload bytes; corrupt -> None. */
    def decode(blob: Array[Byte]): Option[(Long, Long)]
  }

  /** The STUB decoder: deterministic fake dimensions from the first
    * payload bytes, prefix-md5 signature. Every payload "decodes"
    * (the stub cannot detect corruption) — its value is exercising
    * the pipeline shape end-to-end with oracle-checkable outputs. */
  case class Md5PrefixDecoder(prefixBytes: Int = 32) extends PayloadDecoder {
    require(prefixBytes > 0, s"prefixBytes must be positive: $prefixBytes")
    override def name: String = s"md5-stub-$prefixBytes"
    override def fingerprint(payload: Column): Column =
      md5(substring(payload, 1, prefixBytes))
    override def decode(blob: Array[Byte]): Option[(Long, Long)] = {
      val b0 = if (blob.length > 0) blob(0) & 0xff else 0
      val b1 = if (blob.length > 1) blob(1) & 0xff else 0
      Some((256L + b0, 256L + b1))
    }
  }

  /** A REAL (if deliberately tiny) pure-JVM decoder: parses the BMP
    * file header — magic "BM", pixel width at byte offset 18 and
    * height at 22, both little-endian int32 (the BITMAPINFOHEADER
    * layout). Anything without the magic or too short for the header
    * is corrupt -> None/NULL. Exists to prove the [[PayloadDecoder]]
    * seam is a working drop-in point, not a comment: the fingerprint
    * stays a codegen'd column expression (magic check + md5), the
    * decode a plain byte parse. */
  case object BmpHeaderDecoder extends PayloadDecoder {
    override def name: String = "bmp-header"
    private val HeaderLen = 26
    override def fingerprint(payload: Column): Column =
      when(length(payload) >= HeaderLen &&
        substring(payload, 1, 2) === lit("BM".getBytes), md5(payload))
    override def decode(blob: Array[Byte]): Option[(Long, Long)] = {
      if (blob.length < HeaderLen || blob(0) != 'B' || blob(1) != 'M')
        return None
      def le32(o: Int): Long =
        (blob(o) & 0xffL) | ((blob(o + 1) & 0xffL) << 8) |
          ((blob(o + 2) & 0xffL) << 16) | ((blob(o + 3) & 0xffL) << 24)
      Some((le32(18), le32(22)))
    }
  }

  /** Decoded-media record (what a real image decode yields); width
    * and height are None when the decoder rejects the payload — the
    * corrupt->null contract made visible in the schema. */
  case class MediaFeatures(
      doc_id: Long, n_bytes: Long, width: Option[Long],
      height: Option[Long])

  /** Attach a binary payload column (here: utf-8 encoded text stands
    * in for media bytes) and run the partition-wise decode through
    * the given [[PayloadDecoder]] (default: the stub). Corrupt
    * payloads keep their row — id and byte length are payload facts,
    * the decoded dimensions are null. */
  def decodeFeatures(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      decoder: PayloadDecoder = Md5PrefixDecoder()): DataFrame = {
    val withBlob = df.select(col(idCol).cast("long").as("id"),
      encode(col(payloadCol), "UTF-8").as("blob"))
    val ds: Dataset[(Long, Array[Byte])] =
      withBlob.as[(Long, Array[Byte])](
        Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { it: Iterator[(Long, Array[Byte])] =>
      it.map { case (id, blob) =>
        val wh = decoder.decode(blob)
        MediaFeatures(id, blob.length.toLong, wh.map(_._1), wh.map(_._2))
      }
    }(Encoders.product[MediaFeatures]).toDF()
  }

  /** One sampled frame: index within the payload, the frame's byte
    * slice (what a real decoder would hand to the model), and a
    * per-frame scalar feature (here: mean byte, standing in for e.g.
    * mean luminance). */
  case class Frame(
      doc_id: Long, frame_idx: Long, n_frame_bytes: Long, mean_byte: Double)

  /** Frame sampling — the video-pipeline row-EXPANDING shape: each
    * binary payload yields `frames` evenly spaced frame records via
    * the same partition-wise batch transform (mapPartitions with a
    * flatMap iterator: streaming, one row in → k rows out, no
    * collect, no memory spike beyond one payload).
    *
    * A real implementation would seek to keyframes via the container
    * index; the STUB slices the payload into `frames` even chunks and
    * derives a deterministic per-frame feature from the bytes, so the
    * expansion plumbing (schema, ordering, partition batching) is
    * exercised and oracle-checkable in SQL. */
  def sampleFrames(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      frames: Int): DataFrame = {
    require(frames > 0, s"frames must be positive: $frames")
    val withBlob = df.select(col(idCol).cast("long").as("id"),
      encode(col(payloadCol), "UTF-8").as("blob"))
    val ds: Dataset[(Long, Array[Byte])] =
      withBlob.as[(Long, Array[Byte])](
        Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { it: Iterator[(Long, Array[Byte])] =>
      it.flatMap { case (id, blob) =>
        val n = blob.length
        (0 until frames).iterator.map { f =>
          // frame f covers bytes [f*n/frames, (f+1)*n/frames)
          val start = (f.toLong * n / frames).toInt
          val end = ((f + 1).toLong * n / frames).toInt
          val len = end - start
          var sum = 0L
          var i = start
          while (i < end) { sum += (blob(i) & 0xff); i += 1 }
          Frame(id, f.toLong, len.toLong,
            if (len == 0) 0.0 else sum.toDouble / len)
        }
      }
    }(Encoders.product[Frame]).toDF()
  }

  /** One overlapping chunk of a payload — the audio-segmentation
    * record (offset bookkeeping is what a real STT/embedding stage
    * consumes alongside the bytes). */
  case class Chunk(
      doc_id: Long, chunk_idx: Long, byte_start: Long, n_chunk_bytes: Long,
      mean_byte: Double)

  /** Overlapping payload chunking — the audio-pipeline shape (fixed
    * window, fixed stride, tail kept): chunk i covers bytes
    * [i·stride, i·stride + window), the last chunk may be short, and
    * a payload shorter than one window still yields exactly one
    * chunk. VARIABLE per-row expansion (⌈max(n−window,0)/stride⌉+1 —
    * unlike [[sampleFrames]]' fixed k), streamed through the same
    * partition-wise flatMap: bytes out ≈ bytes in × window/stride,
    * bounded regardless of payload count.
    *
    * A real implementation would resample PCM and hand chunks to an
    * encoder; the STUB derives the per-chunk mean byte so the
    * variable expansion plumbing is exercised and oracle-checkable
    * (generate_series over the same offset arithmetic). */
  def chunkPayload(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      window: Int,
      stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window: window=$window stride=$stride")
    val withBlob = df.select(col(idCol).cast("long").as("id"),
      encode(col(payloadCol), "UTF-8").as("blob"))
    val ds: Dataset[(Long, Array[Byte])] =
      withBlob.as[(Long, Array[Byte])](
        Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { it: Iterator[(Long, Array[Byte])] =>
      it.flatMap { case (id, blob) =>
        val n = blob.length
        val nChunks = if (n <= window) 1
          else ((n - window + stride - 1) / stride) + 1
        (0 until nChunks).iterator.map { c =>
          val start = c * stride
          val end = math.min(start + window, n)
          val len = math.max(end - start, 0)
          var sum = 0L
          var i = start
          while (i < end) { sum += (blob(i) & 0xff); i += 1 }
          Chunk(id, c.toLong, start.toLong, len.toLong,
            if (len == 0) 0.0 else sum.toDouble / len)
        }
      }
    }(Encoders.product[Chunk]).toDF()
  }

  /** Content-defined chunking of a payload column — the
    * insertion-robust sibling of [[chunkPayload]]'s fixed grid,
    * computed by the [[graft.plans.CdcChunks]] gear-hash expression
    * (FastCDC-style rolling cut; see its scaladoc for the
    * re-synchronization property that makes chunk-level dedup
    * survive edits). One row per chunk: (doc_id, chunk_idx,
    * byte_start, n_chunk_bytes, chunk_md5).
    *
    * Shape at 100 TB: the cut array and every chunk signature are
    * computed in the scan's stage (codegen byte loop + substr +
    * md5 — no UDF, no shuffle of payload bytes); only the scalar
    * chunk rows (16-byte md5, three ints) ever reach an exchange.
    * Downstream chunk-level dedup is d01's exact-dedup shape on
    * `chunk_md5`. */
  def cdcChunks(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      minLen: Int = 64,
      maxLen: Int = 1024,
      maskBits: Int = 8): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val blob = encode(col(payloadCol), "UTF-8")
    val cuts = GraftBridge.column(graft.plans.CdcChunks(
      GraftBridge.expression(blob), minLen, maxLen, maskBits))
    df.select(col(idCol).cast("long").as("doc_id"),
        blob.as("__p"), cuts.as("__cuts"))
      .select(col("doc_id"), col("__p"), col("__cuts"),
        posexplode(col("__cuts")).as(Seq("chunk_idx", "__end")))
      // element_at is 1-indexed: for 0-based chunk_idx, element
      // chunk_idx IS the previous cut (and index 0 = start of blob)
      .withColumn("__start",
        when(col("chunk_idx") === 0, lit(0))
          .otherwise(element_at(col("__cuts"), col("chunk_idx"))))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("__start").cast("long").as("byte_start"),
        (col("__end") - col("__start")).cast("long").as("n_chunk_bytes"),
        md5(col("__p").substr(col("__start") + 1,
          col("__end") - col("__start"))).as("chunk_md5"))
  }

  /** Per-payload duplicated-FRAME profile — [[payloadDedup]] pushed
    * to frame granularity (d16's duplicated-span shape on media):
    * each payload is sliced into `frames` even segments with
    * [[sampleFrames]]' offset arithmetic, each segment gets a
    * signature (STUB: md5 of the slice — a real pipeline computes a
    * per-frame perceptual hash), and a frame position counts as
    * duplicated when its signature occurs at ≥2 positions
    * corpus-wide: shared intros/outros/watermark segments surface
    * even when the payloads as wholes differ. Unlike the decode
    * stubs this needs no mapPartitions — fixed-k slicing is pure
    * column arithmetic (`Column.substr` with computed offsets), so
    * the whole path stays in codegen and ONLY 16-byte signatures
    * shuffle, never payload bytes.
    *
    * Payloads shorter than `frames` bytes yield empty tail slices,
    * which dedup together by design (an empty frame is the same
    * empty frame everywhere). */
  def frameDupProfile(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      frames: Int = 8,
      decoder: PayloadDecoder = Md5PrefixDecoder()): DataFrame = {
    require(frames > 0, s"frames must be positive: $frames")
    val k = frames
    val sigs = df
      .select(col(idCol).cast("long").as("doc_id"),
        col(payloadCol).as("__p"), length(col(payloadCol)).as("__n"),
        explode(sequence(lit(0), lit(k - 1))).as("fr"))
      .select(col("doc_id"), col("fr"),
        decoder.frameSignature(col("__p").substr(
          floor(col("fr") * col("__n") / k).cast("int") + 1,
          (floor((col("fr") + 1) * col("__n") / k) -
            floor(col("fr") * col("__n") / k)).cast("int"))).as("sig"))
    // null signature = undecodable frame: LEFT join keeps its row,
    // null never equi-joins, so corrupt frames count as unique
    val counts = sigs.where(col("sig").isNotNull)
      .groupBy("sig").agg(count(lit(1)).as("__c"))
    sigs.join(counts, Seq("sig"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("__c") >= 2, 1L).otherwise(0L)).as("n_dup"),
        (floor(sum(when(col("__c") >= 2, 1L).otherwise(0L)) /
          count(lit(1)) * 10000) / 10000).as("dup_frac"))
  }

  /** Media payload dedup on the decoder's content signature: real
    * pipelines collapse near-identical media on a signature a
    * decoder computes (pHash for images, chromaprint for audio) —
    * byte-exact hashing misses every re-encode. The default
    * [[Md5PrefixDecoder]] signature is md5 of the first prefixBytes
    * (deterministic, oracle-checkable); any [[PayloadDecoder]] drops
    * in with the dedup shape unchanged (MultimodalSpec asserts both).
    *
    * Shape at 100 TB: one map-side fingerprint per payload (the
    * bytes never shuffle — only the 16-byte signature does), one
    * hash-agg on the signature, one signature-keyed join back for
    * the verdict; AQE broadcasts the group table when it fits.
    * Keeper = min doc id, as every dedup family member. Corrupt
    * payloads (null fingerprint) never match the LEFT join back, so
    * each stays a kept singleton — corrupt media must not dedup
    * together. */
  def payloadDedup(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      prefixBytes: Int = 32): DataFrame =
    payloadDedupWith(df, idCol, payloadCol, Md5PrefixDecoder(prefixBytes))

  def payloadDedupWith(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      decoder: PayloadDecoder): DataFrame = {
    val fp = df.select(col(idCol).cast("long").as("doc_id"),
      decoder.fingerprint(encode(col(payloadCol), "UTF-8")).as("fp"))
    val g = fp.where(col("fp").isNotNull)
      .groupBy("fp").agg(count(lit(1)).as("n_copies"),
        min(col("doc_id")).as("__keeper"))
    fp.join(g, Seq("fp"), "left")
      .select(col("doc_id"), col("fp"),
        coalesce(col("n_copies"), lit(1L)).as("n_copies"),
        coalesce(col("doc_id") === col("__keeper"), lit(true))
          .cast("long").as("keep"))
  }
}
