package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata, and decode/feature-extraction runs as
  * a partition-wise batch transform (the Scala analog of a
  * `mapInPandas` batch UDF: one iterator per partition, streaming,
  * no driver involvement).
  *
  * The actual image/audio decode is STUBBED (no codec libraries in
  * this environment): [[decodeStub]] derives deterministic fake
  * dimensions from the payload bytes. The Spark-side plumbing —
  * schema, binary encoding, partition batch shape, typed output — is
  * real and oracle-checked.
  */
object Multimodal {

  /** Decoded-media record (what a real image decode would yield). */
  case class MediaFeatures(
      doc_id: Long, n_bytes: Long, width: Long, height: Long)

  /** STUB decode: a real implementation would parse the codec header;
    * this derives deterministic dimensions from the first bytes so
    * the pipeline shape is testable end-to-end. */
  def decodeStub(id: Long, blob: Array[Byte]): MediaFeatures = {
    val b0 = if (blob.length > 0) blob(0) & 0xff else 0
    val b1 = if (blob.length > 1) blob(1) & 0xff else 0
    MediaFeatures(id, blob.length.toLong, 256L + b0, 256L + b1)
  }

  /** Attach a binary payload column (here: utf-8 encoded text stands
    * in for media bytes) and run the partition-wise decode. */
  def decodeFeatures(
      df: DataFrame,
      idCol: String,
      payloadCol: String): DataFrame = {
    val withBlob = df.select(col(idCol).cast("long").as("id"),
      encode(col(payloadCol), "UTF-8").as("blob"))
    val ds: Dataset[(Long, Array[Byte])] =
      withBlob.as[(Long, Array[Byte])](
        Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { it: Iterator[(Long, Array[Byte])] =>
      it.map { case (id, blob) => decodeStub(id, blob) }
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
      frames: Int = 8): DataFrame = {
    require(frames > 0, s"frames must be positive: $frames")
    val k = frames
    val sigs = df
      .select(col(idCol).cast("long").as("doc_id"),
        col(payloadCol).as("__p"), length(col(payloadCol)).as("__n"),
        explode(sequence(lit(0), lit(k - 1))).as("fr"))
      .select(col("doc_id"), col("fr"),
        md5(col("__p").substr(
          floor(col("fr") * col("__n") / k).cast("int") + 1,
          (floor((col("fr") + 1) * col("__n") / k) -
            floor(col("fr") * col("__n") / k)).cast("int"))).as("sig"))
    val counts = sigs.groupBy("sig").agg(count(lit(1)).as("__c"))
    sigs.join(counts, Seq("sig"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("__c") >= 2, 1L).otherwise(0L)).as("n_dup"),
        (floor(sum(when(col("__c") >= 2, 1L).otherwise(0L)) /
          count(lit(1)) * 10000) / 10000).as("dup_frac"))
  }

  /** Media payload dedup on a perceptual-signature STUB: real
    * pipelines collapse near-identical media on a content signature
    * a decoder computes (pHash for images, chromaprint for audio) —
    * byte-exact hashing misses every re-encode. Here the signature
    * is md5 of the first `prefixBytes` payload bytes (deterministic,
    * oracle-checkable); swap [[fingerprintStub]] for a real
    * perceptual hash and the dedup shape is unchanged.
    *
    * Shape at 100 TB: one map-side fingerprint per payload (the
    * bytes never shuffle — only the 16-byte signature does), one
    * hash-agg on the signature, one signature-keyed join back for
    * the verdict; AQE broadcasts the group table when it fits.
    * Keeper = min doc id, as every dedup family member. */
  def fingerprintStub(payload: Column, prefixBytes: Int): Column =
    md5(substring(payload, 1, prefixBytes))

  def payloadDedup(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      prefixBytes: Int = 32): DataFrame = {
    require(prefixBytes > 0, s"prefixBytes must be positive: $prefixBytes")
    val fp = df.select(col(idCol).cast("long").as("doc_id"),
      fingerprintStub(encode(col(payloadCol), "UTF-8"), prefixBytes)
        .as("fp"))
    val g = fp.groupBy("fp").agg(count(lit(1)).as("n_copies"),
      min(col("doc_id")).as("__keeper"))
    fp.join(g, Seq("fp"))
      .select(col("doc_id"), col("fp"), col("n_copies"),
        (col("doc_id") === col("__keeper")).cast("long").as("keep"))
  }
}
