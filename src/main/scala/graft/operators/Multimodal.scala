package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
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
}
