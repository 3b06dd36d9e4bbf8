package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSuite {

  test("decodeStub derives deterministic metadata from bytes") {
    val f = Multimodal.decodeStub(7L, Array[Byte](65, 66, 67))
    assert(f == Multimodal.MediaFeatures(7L, 3L, 256L + 65, 256L + 66))
    val empty = Multimodal.decodeStub(8L, Array.emptyByteArray)
    assert(empty == Multimodal.MediaFeatures(8L, 0L, 256L, 256L))
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
}
