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

  test("no query output carries a non-atomic column (driver-harness sortability)") {
    // The driver's oracle compare loads each result into pandas and sorts
    // by ALL columns before hashing; an array/map/struct cell is unhashable
    // as a pandas sort key and crashes the gate (seen round 3:
    // emb_quantize_sq8, inverted_shingle_index). Contract: every
    // SparkEntry.queries output column must be an atomic type — encode
    // lists as ordered comma-joined strings / JSON instead.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      fn(spark, sfDir).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
                  f.dataType.isInstanceOf[MapType] ||
                  f.dataType.isInstanceOf[StructType] =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty,
      s"non-atomic output columns crash the driver's pandas sort:\n${offenders.mkString("\n")}")
  }
}
