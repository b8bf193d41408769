package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Source/sink pack: every batch format the engine speaks, exercised as
  * write -> read-back round trips (the reference only reads CSV,
  * SURVEY.md §2.5 — this is the full matrix a real pipeline needs).
  *
  * Round-trip queries return the re-read data so the DuckDB oracle can
  * compare against the ORIGINAL parquet fixture — value-exact round-trip
  * is the assertion. Sinks write under java.io.tmpdir, never into the
  * read-only fixture tree.
  *
  * Scale notes: writes are distributed (one file per task; no coalesce(1)
  * on the data path), partitioned parquet gets partition pruning on read
  * (verified in SourcesSpec via the file-listing plan), CSV/JSON carry
  * explicit schemas on read-back — schema inference is a correctness trap
  * at scale.
  */
object Sources {

  // per-process sink root: two concurrent runs (sbt test alongside Verify)
  // must not overwrite each other's round-trip data between write and read
  private lazy val base = Files.createTempDirectory("graft_io_")

  private def tmpDir(name: String): String = base.resolve(name).toString

  /** CSV: doubles survive via Java shortest-repr toString; timestamps are
    * excluded (CSV has no type fidelity for them without format pinning).
    */
  def csvRoundtrip(s: SparkSession, d: String): DataFrame = {
    val out = tmpDir("part_csv")
    val src = part(s, d).select("p_partkey", "p_name", "p_brand", "p_type", "p_retailprice")
    src.write.mode(SaveMode.Overwrite).option("header", "true").csv(out)
    s.read.schema(src.schema).option("header", "true").csv(out)
      .orderBy("p_partkey")
  }

  def jsonRoundtrip(s: SparkSession, d: String): DataFrame = {
    val out = tmpDir("supplier_json")
    val src = supplier(s, d).select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    src.write.mode(SaveMode.Overwrite).json(out)
    s.read.schema(src.schema).json(out).orderBy("s_suppkey")
  }

  /** Built-in XML source (Spark 4 absorbed spark-xml into spark-sql):
    * nation rows as <nation> elements. Explicit schema on read-back —
    * the same inference-trap rule as CSV/JSON; text fields with XML
    * metacharacters survive via entity escaping.
    */
  def xmlRoundtrip(s: SparkSession, d: String): DataFrame = {
    val out = tmpDir("nation_xml")
    val src = nation(s, d)
    src.write.mode(SaveMode.Overwrite).option("rowTag", "nation").xml(out)
    s.read.schema(src.schema).option("rowTag", "nation").xml(out)
      .orderBy("n_nationkey")
  }

  def orcRoundtrip(s: SparkSession, d: String): DataFrame = {
    val out = tmpDir("nation_orc")
    val src = nation(s, d)
    src.write.mode(SaveMode.Overwrite).orc(out)
    s.read.orc(out).orderBy("n_nationkey")
  }

  /** Plain-text source: one line per document (the rawest ingestion format
    * a text pipeline meets). Line files carry no ids, so the roundtrip
    * assertion is on the sorted value multiset.
    */
  def textRoundtrip(s: SparkSession, d: String): DataFrame = {
    val out = tmpDir("documents_text")
    documents(s, d).select(col("text").as("value"))
      .write.mode(SaveMode.Overwrite).text(out)
    s.read.text(out).orderBy("value")
  }

  /** Custom V2 sink round trip: documents.text through [[GraftLinesSource]]
    * (distributed write, two-phase staged commit, `_SUCCESS` stamp) and
    * back through its file-per-shard reader. Same multiset assertion as
    * the built-in text source — the oracle never sees the sink, only that
    * the data survived it exactly.
    */
  def linesRoundtrip(s: SparkSession, d: String): DataFrame = {
    val out = tmpDir("documents_graftlines")
    documents(s, d).select(col("text").as("value"))
      .write.format("graft.sources.GraftLinesSource")
      .mode(SaveMode.Overwrite).option("path", out).save()
    s.read.format("graft.sources.GraftLinesSource").option("path", out).load()
      .orderBy("value")
  }

  /** Parquet partitioned by a low-cardinality column; the read-back filter
    * prunes to a single partition directory (no full scan).
    */
  def partitionedParquet(s: SparkSession, d: String): DataFrame = {
    val out = tmpDir("events_parquet_parts")
    events(s, d).select("event_id", "user_id", "event_type")
      .write.mode(SaveMode.Overwrite).partitionBy("event_type").parquet(out)
    s.read.parquet(out)
      .where(col("event_type") === "click")
      .groupBy("event_type").agg(count(lit(1)).as("n"))
  }

  /** Bucketed tables + co-located join — THE shuffle-elimination tool for
    * repeated fact-fact joins at 100 TB: both tables are written
    * pre-hash-partitioned (bucketBy) and pre-sorted on the join key, so the
    * join reads bucket i against bucket i directly — no Exchange on either
    * side of the SortMergeJoin (PlanSpec-locked). Pay the shuffle once at
    * write time, amortize it over every subsequent join.
    */
  def bucketedJoin(s: SparkSession, d: String): DataFrame = {
    val nBuckets = 8
    val path = tmpDir("bucketed")
    // prune to the two consumed columns before the bucketed write — the
    // write cost is the dominant term, and bucketing a 9-column table to
    // serve a 2-column join is wasted IO at any scale
    orders(s, d).select("o_orderkey", "o_orderpriority")
      .write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$path/orders").saveAsTable("graft_b_orders")
    lineitem(s, d).select("l_orderkey", "l_extendedprice", "l_quantity")
      .write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$path/lineitem").saveAsTable("graft_b_lineitem")
    s.table("graft_b_lineitem")
      .join(s.table("graft_b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(12, 2)))
          .cast("double").as("total_price"))
      .orderBy("o_orderpriority")
  }

  /** Rows/slices for the synthetic DSv2 source queries. */
  val SynthRows = 2000L
  val SynthSlices = 8

  private def synthRead(s: SparkSession): DataFrame =
    s.read.format("graft.sources.SynthDocsSource")
      .option("rows", SynthRows.toString)
      .option("slices", SynthSlices.toString)
      .load()

  /** Custom DSv2 source, aggregate face: the doc_id range filter is
    * absorbed by the generator (pushed filter — SourcesSpec locks the scan
    * description) and `text` is pruned at the source (never generated).
    */
  def synthPushdown(s: SparkSession, d: String): DataFrame =
    synthRead(s)
      .where(col("doc_id") >= 100L && col("doc_id") < 1100L)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum("n_tokens").as("total_tokens"))
      .orderBy("lang")

  /** Custom DSv2 source, aggregate-PUSHDOWN face: ungrouped
    * count/min/max(doc_id) over a filter-narrowed id range are answered by
    * the scan in closed form — zero rows generated, one row returned
    * (SourcesSpec locks the `agg=pushed` scan plus the absence of any
    * aggregate operator in the plan).
    */
  def synthAggPushdown(s: SparkSession, d: String): DataFrame =
    synthRead(s)
      .where(col("doc_id") >= 100L && col("doc_id") < 1500L)
      .agg(count(lit(1)).as("n"), min("doc_id").as("min_id"),
        max("doc_id").as("max_id"))

  /** Custom DSv2 source, CATALOG face: the same table addressed from pure
    * SQL through the GraftCatalog plugin — filter + column pushdown ride
    * along (same ScanBuilder). The catalog conf is registered lazily on
    * first use, so setting it here is enough.
    */
  def synthCatalogSql(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.catalog.graft_cat", classOf[GraftCatalog].getName)
    s.sql(s"""SELECT lang, count(*) AS n, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
             |FROM graft_cat.synth.docs_$SynthRows
             |WHERE doc_id >= 100 AND doc_id < 1100
             |GROUP BY lang ORDER BY lang""".stripMargin)
  }

  /** Custom DSv2 catalog FUNCTION face: the library's portable 60-bit hash
    * invoked from pure SQL through the V2 FunctionCatalog (magic-method
    * bound — codegen, no per-row reflection), oracled against the same
    * md5 expression DuckDB computes.
    */
  def catalogFunctionHash(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.catalog.graft_cat", classOf[GraftCatalog].getName)
    documents(s, d).createOrReplaceTempView("graft_docs_v")
    s.sql("""SELECT doc_id, graft_cat.fns.h60(text) AS h
            |FROM graft_docs_v ORDER BY doc_id""".stripMargin)
  }

  /** Custom DSv2 source, row face: full columns incl. generated text for a
    * pushed-down id slice — the oracle regenerates every field from
    * doc_id, so the generator itself is hash-verified.
    */
  def synthRows(s: SparkSession, d: String): DataFrame =
    synthRead(s)
      .where(col("doc_id") < 25L)
      .orderBy("doc_id")

  /** Custom DSv2 source, limit/TopN-pushdown face: ORDER BY doc_id LIMIT n
    * reaches the scan as a pushed TopN, which the generator answers in
    * closed form — [lo, lo+n) of the filter-narrowed range, never the
    * remainder (SourcesSpec locks the scan's output-rows metric at n).
    */
  def synthLimitPushdown(s: SparkSession, d: String): DataFrame =
    synthRead(s)
      .select("doc_id", "lang", "n_tokens")
      .where(col("doc_id") >= 100L)
      .orderBy("doc_id")
      .limit(10)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_csv_roundtrip" -> csvRoundtrip,
    "src_json_roundtrip" -> jsonRoundtrip,
    "src_orc_roundtrip" -> orcRoundtrip,
    "src_text_roundtrip" -> textRoundtrip,
    "src_lines_roundtrip" -> linesRoundtrip,
    "src_partitioned_parquet" -> partitionedParquet,
    "src_xml_roundtrip" -> xmlRoundtrip,
    "src_bucketed_join" -> bucketedJoin,
    "src_synth_pushdown" -> synthPushdown,
    "src_synth_agg_pushdown" -> synthAggPushdown,
    "src_synth_catalog_sql" -> synthCatalogSql,
    "src_catalog_function" -> catalogFunctionHash,
    "src_synth_rows" -> synthRows,
    "src_synth_limit_pushdown" -> synthLimitPushdown
  )

  val oracles: Map[String, String] = Map(
    "src_csv_roundtrip" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_retailprice
        |FROM part ORDER BY p_partkey""".stripMargin,
    "src_json_roundtrip" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "src_orc_roundtrip" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "src_xml_roundtrip" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "src_text_roundtrip" ->
      "SELECT text AS value FROM documents ORDER BY text",
    "src_lines_roundtrip" ->
      "SELECT text AS value FROM documents ORDER BY text",
    "src_partitioned_parquet" ->
      """SELECT event_type, count(*) AS n FROM events
        |WHERE event_type = 'click' GROUP BY event_type""".stripMargin,
    "src_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "src_synth_pushdown" ->
      s"""WITH $synthCtes
         |SELECT lang, count(*) AS n, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
         |FROM x WHERE doc_id >= 100 AND doc_id < 1100
         |GROUP BY lang ORDER BY lang""".stripMargin,

    "src_synth_agg_pushdown" ->
      s"""SELECT count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
         |FROM (SELECT unnest(range(100, 1500)) AS doc_id)""".stripMargin,

    "src_catalog_function" ->
      s"""SELECT doc_id, ${graft.operators.TextHash.h60Sql("text")} AS h
         |FROM documents ORDER BY doc_id""".stripMargin,

    // identical semantics to src_synth_pushdown, reached via the catalog
    "src_synth_catalog_sql" ->
      s"""WITH $synthCtes
         |SELECT lang, count(*) AS n, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
         |FROM x WHERE doc_id >= 100 AND doc_id < 1100
         |GROUP BY lang ORDER BY lang""".stripMargin,

    "src_synth_rows" ->
      s"""WITH $synthCtes,
         |t AS (SELECT doc_id, lang, n_tokens,
         |  array_to_string(list_transform(range(0, CAST(n_tokens AS INTEGER)),
         |    i -> 'tok' || CAST(${h60i("'t:' || CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)")} % ${SynthDocs.Vocab} AS VARCHAR)), ' ') AS text
         |  FROM x WHERE doc_id < 25)
         |SELECT doc_id, lang, text, n_tokens FROM t ORDER BY doc_id""".stripMargin,

    "src_synth_limit_pushdown" ->
      s"""WITH $synthCtes
         |SELECT doc_id, lang, n_tokens FROM x WHERE doc_id >= 100
         |ORDER BY doc_id LIMIT 10""".stripMargin
  )

  /** h60 over an expression (same construction as TextHash.h60Sql, local
    * copy to keep graft.sources free of the operators package).
    */
  private def h60i(x: String): String =
    s"CAST(('0x' || substr(md5($x),1,15)) AS BIGINT)"

  private def langListSql: String =
    SynthDocs.Langs.map(l => s"'$l'").mkString("[", ", ", "]")

  /** The synthetic table regenerated purely in SQL from range(rows). */
  private def synthCtes: String =
    s"""ids AS (SELECT unnest(range(0, ${SynthRows})) AS doc_id),
       |x AS (SELECT doc_id,
       |  ($langListSql)[CAST(${h60i("'lang:' || CAST(doc_id AS VARCHAR)")} % ${SynthDocs.Langs.length} AS INTEGER) + 1] AS lang,
       |  ${SynthDocs.MinToks} + ${h60i("'len:' || CAST(doc_id AS VARCHAR)")} % ${SynthDocs.TokSpread} AS n_tokens
       |  FROM ids)""".stripMargin
}
