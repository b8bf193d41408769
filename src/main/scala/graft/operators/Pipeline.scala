package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** End-to-end corpus-cleaning pipeline — the composition a pretraining
  * data pipeline actually runs, built from the library's own stages:
  *
  *   1. quality gate    (TextAnalysis.stats: quality_score >= threshold)
  *   2. exact dedup     (keep the smallest doc_id per identical text)
  *   3. near-dup dedup  (MinHash-LSH pairs; drop the larger id of each
  *                       pair — a deterministic "keep first" policy)
  *   4. percentile stats over the surviving corpus
  *
  * Every stage is the oracled operator from its own pack, so the whole
  * composition is DuckDB-verifiable end to end. At 100 TB each stage is a
  * bounded shuffle (md5 keys / LSH buckets / doc_id), never a cross join.
  */
object Pipeline {

  val QualityThreshold = 0.5

  /** doc_ids surviving quality gate + exact dedup + minhash near-dedup. */
  def cleanCorpus(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select("doc_id", "text")
    val qualityOk = TextAnalysis.stats(docs)
      .where(col("quality_score") >= QualityThreshold)
      .select("doc_id")
    val exactKeep = docs
      .groupBy(md5(col("text")).as("h")).agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val nearDupDrop = Dedup.minhashPairs(s, d).select(col("doc_b").as("doc_id"))
    docs.select("doc_id")
      .join(qualityOk, Seq("doc_id"), "left_semi")
      .join(exactKeep, Seq("doc_id"), "left_semi")
      .join(nearDupDrop, Seq("doc_id"), "left_anti")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The surviving corpus (ids), plus corpus-level size accounting.
    "pipeline_clean_corpus" -> { (s, d) =>
      cleanCorpus(s, d).orderBy("doc_id")
    },

    // Exact percentiles over surviving doc lengths — interpolated
    // percentile matches DuckDB quantile_cont bit-for-bit on these
    // integer-valued inputs.
    "pipeline_survivor_stats" -> { (s, d) =>
      val clean = cleanCorpus(s, d)
      documents(s, d).join(clean, Seq("doc_id"), "left_semi")
        .select(size(split(lower(col("text")), "\\s+")).cast("double").as("n_tokens"))
        .agg(count(lit(1)).as("n_docs"),
          expr("percentile(n_tokens, 0.5)").as("median_tokens"),
          expr("percentile(n_tokens, 0.9)").as("p90_tokens"),
          min("n_tokens").cast("double").as("min_tokens"),
          max("n_tokens").cast("double").as("max_tokens"))
    }
  )

  val oracles: Map[String, String] = Map(
    "pipeline_clean_corpus" -> {
      s"""${Dedup.sigSqlCte},
         |pairs AS (${Dedup.minhashPairsSqlSelect}),
         |qtok AS (SELECT doc_id, text, ${TextHash.toksSql("text")} AS t FROM documents),
         |q AS (SELECT doc_id,
         |  round(least(1.0, CAST(len(t) AS DOUBLE) / 100.0) * 0.5 +
         |        (1.0 - CAST(len(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS DOUBLE) / len(text)) * 0.3 +
         |        least(1.0, (CAST(len(list_filter(t, x -> x IN (${TextAnalysis.stopwords.map(w => s"'$w'").mkString(", ")}))) AS DOUBLE) / len(t)) * 5.0) * 0.2, 6) AS quality
         |  FROM qtok),
         |exact_keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text))
         |SELECT d.doc_id FROM documents d
         |WHERE d.doc_id IN (SELECT doc_id FROM q WHERE quality >= $QualityThreshold)
         |  AND d.doc_id IN (SELECT doc_id FROM exact_keep)
         |  AND d.doc_id NOT IN (SELECT doc_b FROM pairs)
         |ORDER BY d.doc_id""".stripMargin
    },

    "pipeline_survivor_stats" -> {
      s"""${Dedup.sigSqlCte},
         |pairs AS (${Dedup.minhashPairsSqlSelect}),
         |qtok AS (SELECT doc_id, text, ${TextHash.toksSql("text")} AS t FROM documents),
         |q AS (SELECT doc_id,
         |  round(least(1.0, CAST(len(t) AS DOUBLE) / 100.0) * 0.5 +
         |        (1.0 - CAST(len(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS DOUBLE) / len(text)) * 0.3 +
         |        least(1.0, (CAST(len(list_filter(t, x -> x IN (${TextAnalysis.stopwords.map(w => s"'$w'").mkString(", ")}))) AS DOUBLE) / len(t)) * 5.0) * 0.2, 6) AS quality
         |  FROM qtok),
         |exact_keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         |clean AS (
         |  SELECT d.doc_id, CAST(len(${TextHash.toksSql("d.text")}) AS DOUBLE) AS n_tokens
         |  FROM documents d
         |  WHERE d.doc_id IN (SELECT doc_id FROM q WHERE quality >= $QualityThreshold)
         |    AND d.doc_id IN (SELECT doc_id FROM exact_keep)
         |    AND d.doc_id NOT IN (SELECT doc_b FROM pairs))
         |SELECT count(*) AS n_docs,
         |  CAST(quantile_cont(n_tokens, 0.5) AS DOUBLE) AS median_tokens,
         |  CAST(quantile_cont(n_tokens, 0.9) AS DOUBLE) AS p90_tokens,
         |  min(n_tokens) AS min_tokens,
         |  max(n_tokens) AS max_tokens
         |FROM clean""".stripMargin
    }
  )
}
