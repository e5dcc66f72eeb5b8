package graft

/** Driver-contract smoke: entry() non-empty, every query runs at sf0.001,
  * every oracle key has a query (and vice versa where SQL-expressible). */
class EntrySpec extends SparkSuite {

  test("entry() returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys exactly match queries keys") {
    assert(SparkEntry.oracleSql.keySet === SparkEntry.queries.keySet)
  }

  test("every query executes and is non-empty at sf0.001") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (n == 0) Some(name) else None
    }
    // q24 (LSH pairs) may legitimately be empty on a tiny corpus; everything
    // else must produce rows.
    assert(empties.filterNot(_ == "q24_minhash_lsh").isEmpty, s"empty: $empties")
  }
}
