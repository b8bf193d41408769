package graft

/** Smoke coverage of the driver contract surface: entry() and every
  * SparkEntry.queries entry runs and (where meaningful) returns rows at
  * sf0.001. Value-level correctness is covered by the DuckDB oracle at
  * sf0.01 (driver t2) and tools/check_oracle.py locally.
  */
class EntrySpec extends SparkSpecBase {

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("all queries execute at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sfDir).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
