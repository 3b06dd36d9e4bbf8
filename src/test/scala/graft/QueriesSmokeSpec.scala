package graft

/** Every registered query runs and yields rows at sf0.001 (the
  * driver's t1-style smoke, locally enforced for all entries). */
class QueriesSmokeSpec extends SparkSuite {

  test("every oracle key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries impl: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name returns rows") {
      assert(fn(spark, sfDir).count() > 0, s"$name returned 0 rows")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
