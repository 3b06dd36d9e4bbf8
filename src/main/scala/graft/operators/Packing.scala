package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Training-sequence packing: assign variable-length documents to
  * fixed token-budget sequences (the "pack short docs into 2k/4k/8k
  * context windows" step every LLM pre-training pipeline runs between
  * cleaning and tokenized-shard writing).
  *
  * Semantics are GREEDY SEQUENTIAL per group: docs are scanned in
  * `orderCol` order within each `keyCol` group, accumulating token
  * counts; a doc that would overflow `budget` starts the next
  * sequence. A doc larger than the whole budget gets a sequence of
  * its own (callers chunk oversized docs upstream — see
  * Multimodal.chunkPayload for the splitting shape). Packing is a
  * data-dependent running reset, which no window function expresses —
  * this is the genuine per-partition imperative case: one hash
  * shuffle on the group key, an in-order scan per group with O(1)
  * state, nothing held in memory.
  *
  * Scale note (100 TB): the sequential scan serializes WITHIN a
  * group, so the group key must be chosen with bounded group size —
  * (source, day) or (source, shard) rather than a whole corpus under
  * one key. Groups are independent, so width comes from the number of
  * groups, exactly like every keyed operator here. Packing quality is
  * unaffected by sharding: greedy sequential fill wastes at most one
  * doc's tokens per sequence boundary regardless of how groups are
  * cut.
  *
  * Reference analog: none (the reference has no training-data layer);
  * this extends the corpus-pipeline family (SURVEY §2 t-keys).
  */
object Packing {

  // NOT private: the row encoder's generated code instantiates it.
  case class Packed(
      key: String, ord: Long, n_tok: Long, seq_id: Long, seq_fill: Long)

  /** One row per input doc: its group key, order, token count, the
    * 0-based sequence index within the group, and the sequence's
    * running fill AFTER placing the doc (the last doc of a sequence
    * carries its final fill). Deterministic for a total `orderCol`
    * order within groups. */
  def packSequences(
      docs: DataFrame,
      keyCol: String,
      orderCol: String,
      tokCol: String,
      budget: Long): DataFrame = {
    require(budget >= 1, s"packSequences needs budget >= 1, got $budget")
    val in: Dataset[(String, Long, Long)] = docs
      .select(col(keyCol).cast("string"), col(orderCol).cast("long"),
        col(tokCol).cast("long"))
      .repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(orderCol))
      .as[(String, Long, Long)](Encoders.tuple(
        Encoders.STRING, Encoders.scalaLong, Encoders.scalaLong))
    in.mapPartitions { it =>
      // A partition holds whole groups (hash partitioning on key),
      // sorted by (key, ord): stream it with one counter pair,
      // resetting at group boundaries.
      var curKey: String = null
      var seq = 0L
      var fill = 0L
      it.map { case (k, o, t) =>
        if (k != curKey) { curKey = k; seq = 0L; fill = t }
        else if (fill + t > budget) { seq += 1L; fill = t }
        else fill += t
        Packed(k, o, t, seq, fill)
      }
    }(Encoders.product[Packed]).toDF()
      .select(col("ord").as(orderCol), col("key").as(keyCol),
        col("n_tok"), col("seq_id"), col("seq_fill"))
  }

  /** Roll the per-doc assignment up to one row per packed sequence:
    * doc count, token fill, and budget utilization. */
  def sequenceSummary(packed: DataFrame, keyCol: String, budget: Long): DataFrame =
    packed.groupBy(col(keyCol), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("fill"))
      .withColumn("utilization",
        floor(col("fill") / lit(budget.toDouble) * 10000) / 10000)
}
