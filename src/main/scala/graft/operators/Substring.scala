package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import TextHash._

/** Substring-level exact-duplication analysis — the signal behind
  * "deduplicating training data" substring dedup (repeated boilerplate /
  * templated spans that document-level dedup misses because the documents
  * differ elsewhere).
  *
  * Every document emits the 60-bit hashes of its `SpanLen`-char windows at
  * stride `SpanStride` (stride < span length, so any repeated region of
  * length ≥ SpanLen + SpanStride − 1 is guaranteed to contribute at least
  * one sampled window on both sides). Windows repeating across ≥ 2 distinct
  * documents mark duplicated spans.
  *
  * 100 TB shape: span emission is a pure per-row explode (no shuffle, stays
  * in codegen); the only exchanges are hash-keyed aggregations — 8-byte
  * span hashes cross the wire, never the text. The per-span stats relation
  * is corpus-vocabulary-sized and joins back to span rows on its hash key
  * (shuffle equi-join; NOT broadcast — at real scale the distinct-span set
  * is large). The final per-doc profile reuses the doc_id key. No all-pairs
  * joins anywhere.
  */
object Substring {

  val SpanLen = 40
  val SpanStride = 20
  private val TopSpans = 20

  /** (doc_id, s, span, h): sampled character windows + 60-bit hash.
    * Docs shorter than SpanLen emit nothing (fixture min 48 chars).
    */
  private def spanRows(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .where(col("n_chars") >= SpanLen)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), col("n_chars") - SpanLen, lit(SpanStride))).as("s"))
      .select(col("doc_id"), col("s"),
        col("text").substr(col("s") + 1, lit(SpanLen)).as("span"))
      .withColumn("h", h60(col("span")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-document duplication profile: how many of a doc's sampled spans
    // also occur in at least one OTHER document.
    "dup_span_profile" -> { (s, d) =>
      val spans = spanRows(s, d)
      val stats = spans.groupBy("h")
        .agg(countDistinct(col("doc_id")).as("n_docs_h"))
      spans.join(stats, "h")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"),
          sum(when(col("n_docs_h") >= 2, 1L).otherwise(0L)).as("n_dup_spans"))
        .withColumn("dup_ratio",
          round(col("n_dup_spans").cast("double") / col("n_spans").cast("double"), 6))
        .orderBy("doc_id")
    },

    // Most-repeated spans across the corpus: top-20 by occurrence count.
    // Grouping key is the 60-bit hash (what would cross the wire at scale);
    // min(span) recovers a deterministic representative text.
    "dup_span_top" -> { (s, d) =>
      spanRows(s, d)
        .groupBy("h")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occ"),
          min(col("span")).as("span"))
        .select("span", "n_docs", "n_occ")
        .orderBy(col("n_occ").desc, col("n_docs").desc, col("span"))
        .limit(TopSpans)
    }
  )

  // -------------------------------------------------------------- oracles

  /** DuckDB range() is end-exclusive vs Spark sequence() end-inclusive:
    * range(0, n_chars - SpanLen + 1, stride) == sequence(0, n_chars - SpanLen, stride).
    */
  private val spanCte =
    s"""sp AS (SELECT doc_id, s,
       |    substr(text, CAST(s + 1 AS INTEGER), $SpanLen) AS span
       |  FROM (SELECT doc_id, text,
       |          unnest(range(0, n_chars - ${SpanLen - 1}, $SpanStride)) AS s
       |        FROM documents WHERE n_chars >= $SpanLen)),
       |sh AS (SELECT doc_id, s, span, ${h60Sql("span")} AS h FROM sp)""".stripMargin

  val oracles: Map[String, String] = Map(
    "dup_span_profile" ->
      s"""WITH $spanCte,
         |st AS (SELECT h, count(DISTINCT doc_id) AS n_docs_h FROM sh GROUP BY h),
         |j AS (SELECT doc_id, n_docs_h FROM sh JOIN st USING (h)),
         |p AS (SELECT doc_id, count(*) AS n_spans,
         |    CAST(sum(CASE WHEN n_docs_h >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans
         |  FROM j GROUP BY doc_id)
         |SELECT doc_id, n_spans, n_dup_spans,
         |  round(CAST(n_dup_spans AS DOUBLE) / CAST(n_spans AS DOUBLE), 6) AS dup_ratio
         |FROM p ORDER BY doc_id""".stripMargin,

    "dup_span_top" ->
      s"""WITH $spanCte,
         |g AS (SELECT h, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ,
         |    min(span) AS span
         |  FROM sh GROUP BY h)
         |SELECT span, n_docs, n_occ FROM g
         |ORDER BY n_occ DESC, n_docs DESC, span LIMIT $TopSpans""".stripMargin
  )
}
