package graft

/** Driver-contract invariants: every oracle has a query, names are
  * gate-safe, and the flagship entry returns rows. */
class ContractSpec extends SparkFunSuite {
  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("query names are stable identifiers") {
    SparkEntry.queries.keys.foreach(k =>
      assert(k.matches("[a-z0-9_]+"), s"bad query name: $k"))
  }

  test("entry (driver smoke) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all queries run at sf0.001 (fast sanity for the smallest scale)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sf()).limit(1).collect()
      catch { case e: Throwable => fail(s"$name failed at sf0.001: ${e.getMessage}") }
    }
  }
}
