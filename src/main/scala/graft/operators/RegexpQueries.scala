package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft
import graft.Graft.regexp_extract_ref
import graft.Tables._

/** Query pack exercising the reference's one operator — `regexp_extract_ref`
  * (reference: src/regexp-extract.rs:25-115, readme.md:60-76) — through the
  * engine, over the driver fixtures.
  *
  * The divergence cases where DuckDB's `regexp_extract` *throws* while the
  * reference returns "" (invalid regex, out-of-range group — SURVEY.md §2.2)
  * deliberately have NO oracle entry and are covered by ScalaTest instead
  * (rows-only driver check, as the contract permits).
  */
object RegexpQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Basic group-1 extraction over a JSON-ish string column.
    "regexp_basic" -> { (s, d) =>
      Graft.init(s)
      events(s, d).select(col("event_id"),
        regexp_extract_ref(col("props"), lit("\"k\": (\\d+)"), lit(1)).as("k_str"))
        .orderBy("event_id")
    },

    // Multi-group: second word of each document.
    "regexp_group2" -> { (s, d) =>
      Graft.init(s)
      documents(s, d).select(col("doc_id"),
        regexp_extract_ref(col("text"), lit("(\\w+) (\\w+)"), lit(2)).as("second_word"))
        .orderBy("doc_id")
    },

    // Group 0 = whole match (reference: src/regexp-extract.rs:101).
    "regexp_group0" -> { (s, d) =>
      Graft.init(s)
      events(s, d).select(col("event_id"),
        regexp_extract_ref(col("props"), lit("\\d+"), lit(0)).as("whole"))
        .orderBy("event_id")
    },

    // No-match rows produce "" not NULL (reference: src/regexp-extract.rs:103).
    "regexp_no_match" -> { (s, d) =>
      Graft.init(s)
      part(s, d).select(col("p_partkey"),
        regexp_extract_ref(col("p_name"), lit("(\\d+)-(\\d+)"), lit(1)).as("extracted"))
        .orderBy("p_partkey")
    },

    // NULL input -> NULL output, via the reference's CASE WHEN shape
    // (reference: tests/regexp-tests.rs:75-99).
    "regexp_null_case" -> { (s, d) =>
      Graft.init(s)
      events(s, d).select(col("event_id"),
        regexp_extract_ref(
          when(col("event_id") % 2 === 0, col("props")).otherwise(lit(null)),
          lit("\"k\": (\\d+)"), lit(1)).as("k_str"))
        .orderBy("event_id")
    },

    // SQL entry point + inline VALUES + derived CASE/CAST, all through
    // spark.sql with the registered function (reference: tests/regexp-tests.rs:75-86).
    "regexp_sql_values" -> { (s, d) =>
      Graft.init(s)
      s.sql(
        """SELECT id, regexp_extract_ref(
          |  CASE WHEN id % 2 = 0 THEN CAST(id AS STRING) ELSE NULL END,
          |  '(\\d+)', 1) AS extracted
          |FROM VALUES (1),(2),(3),(4) AS t(id) ORDER BY id""".stripMargin)
    },

    // Invalid regex -> "" (reference: src/regexp-extract.rs:106-109). DuckDB
    // would throw at bind time -> no oracle; ScalaTest covers the values.
    "regexp_invalid_pattern" -> { (s, d) =>
      Graft.init(s)
      documents(s, d).select(col("doc_id"),
        regexp_extract_ref(col("text"), lit("[invalid"), lit(1)).as("extracted"))
        .orderBy("doc_id")
    },

    // Out-of-range / negative group index -> "" (reference: src/regexp-extract.rs:94-103).
    // DuckDB throws -> no oracle; ScalaTest covers the values.
    "regexp_invalid_group" -> { (s, d) =>
      Graft.init(s)
      documents(s, d).select(col("doc_id"),
        regexp_extract_ref(col("text"), lit("(\\w+) (\\w+)"), lit(9)).as("g9"),
        regexp_extract_ref(col("text"), lit("(\\w+)"), lit(-1)).as("gneg"))
        .orderBy("doc_id")
    }
  )

  val oracles: Map[String, String] = Map(
    "regexp_basic" ->
      """SELECT event_id, regexp_extract(props, '"k": (\d+)', 1) AS k_str
        |FROM events ORDER BY event_id""".stripMargin,

    "regexp_group2" ->
      """SELECT doc_id, regexp_extract(text, '(\w+) (\w+)', 2) AS second_word
        |FROM documents ORDER BY doc_id""".stripMargin,

    "regexp_group0" ->
      """SELECT event_id, regexp_extract(props, '\d+', 0) AS whole
        |FROM events ORDER BY event_id""".stripMargin,

    "regexp_no_match" ->
      """SELECT p_partkey, regexp_extract(p_name, '(\d+)-(\d+)', 1) AS extracted
        |FROM part ORDER BY p_partkey""".stripMargin,

    "regexp_null_case" ->
      """SELECT event_id, regexp_extract(
        |  CASE WHEN event_id % 2 = 0 THEN props ELSE NULL END,
        |  '"k": (\d+)', 1) AS k_str
        |FROM events ORDER BY event_id""".stripMargin,

    "regexp_sql_values" ->
      """SELECT id, regexp_extract(
        |  CASE WHEN id % 2 = 0 THEN CAST(id AS VARCHAR) ELSE NULL END,
        |  '(\d+)', 1) AS extracted
        |FROM (VALUES (1),(2),(3),(4)) t(id) ORDER BY id""".stripMargin
  )
}
