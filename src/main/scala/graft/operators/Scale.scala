package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-out utilities: skew-salted joins and pruned data layouts.
  *
  * AQE handles moderate skew at runtime (skew-join splitting); the
  * salted join is the explicit form for pathological hot keys where
  * one key exceeds a single executor's memory — the standard recipe
  * on a 1000-executor cluster.
  */
object Scale {

  /** Skew-salted equi-join: the big (skewed) side gets a
    * deterministic salt derived from a secondary column, the small
    * side is replicated numSalts times, and the join key becomes
    * (key, salt) — splitting each hot key's rows across numSalts
    * reducers. Results are identical to a plain inner join on `key`.
    *
    * `saltSource` must be a column of the big side (any
    * high-cardinality column; a row id is ideal) — using a hash of it
    * keeps the salt deterministic across retries, unlike rand(). */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltSource: Column,
      numSalts: Int = 8): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(numSalts)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until numSalts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Write a table partitioned by low-cardinality columns and sorted
    * within files — the layout that turns full scans into pruned
    * scans (PartitionFilters) and enables row-group skipping on the
    * sort key at 100 TB. */
  def partitionedWrite(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      sortCols: Seq[String]): Unit =
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.partitionBy(partitionCols: _*)
      .mode("overwrite").parquet(path)
}
