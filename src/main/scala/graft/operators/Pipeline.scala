package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** End-to-end corpus-cleaning pipeline — the composition a pretraining
  * data pipeline actually runs, built from the library's own stages:
  *
  *   1. quality gate    (TextAnalysis.stats: quality_score >= threshold)
  *   2. exact dedup     (Dedup.exactKeepIds: smallest doc_id per text)
  *   3. near-dup dedup  (Dedup.minhashPairsFor over the GATED corpus;
  *                       drop the larger id of each pair). Running minhash
  *                       after the gates matters: pairing against already-
  *                       removed docs would drop both copies of content
  *                       whose keeper failed an earlier gate.
  *
  * Every stage is the oracled operator from its own pack, so the whole
  * composition is DuckDB-verifiable end to end. At 100 TB each stage is a
  * bounded shuffle (md5 keys / LSH buckets / doc_id), never a cross join.
  */
object Pipeline {

  val QualityThreshold = 0.5

  /** doc_ids surviving quality gate + exact dedup + minhash near-dedup,
    * over any (doc_id, text) corpus.
    */
  def cleanCorpusFor(docs: DataFrame): DataFrame = {
    val base = docs.select("doc_id", "text")
    val qualityOk = TextAnalysis.stats(base)
      .where(col("quality_score") >= QualityThreshold)
      .select("doc_id")
    // persist: gated feeds the minhash signature subtree AND the final
    // anti-join base — without it the quality gate + both semi-joins run
    // twice. Caller owns release (Graft.releaseCaches; the driver mains
    // call it after each materialized query).
    val gated = base
      .join(qualityOk, Seq("doc_id"), "left_semi")
      .join(Dedup.exactKeepIds(base), Seq("doc_id"), "left_semi")
      .persist()
    val nearDupDrop = Dedup.minhashPairsFor(gated).select(col("doc_b").as("doc_id"))
    gated.select("doc_id").join(nearDupDrop, Seq("doc_id"), "left_anti")
  }

  def cleanCorpus(s: SparkSession, d: String): DataFrame =
    cleanCorpusFor(documents(s, d))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The surviving corpus: ordered doc_ids (size accounting lives in
    // pipeline_survivor_stats).
    "pipeline_clean_corpus" -> { (s, d) =>
      cleanCorpus(s, d).orderBy("doc_id")
    },

    // Exact percentiles over surviving doc lengths — interpolated
    // percentile matches DuckDB quantile_cont bit-for-bit on these
    // integer-valued inputs.
    "pipeline_survivor_stats" -> { (s, d) =>
      val clean = cleanCorpus(s, d)
      documents(s, d).join(clean, Seq("doc_id"), "left_semi")
        .select(size(TextHash.toks(col("text"))).cast("double").as("n_tokens"))
        .agg(count(lit(1)).as("n_docs"),
          expr("percentile(n_tokens, 0.5)").as("median_tokens"),
          expr("percentile(n_tokens, 0.9)").as("p90_tokens"),
          min("n_tokens").cast("double").as("min_tokens"),
          max("n_tokens").cast("double").as("max_tokens"))
    },

    // Web-curation funnel — the PROVENANCE+content gate composition a
    // crawl pipeline runs before the dedup stages above, built from the
    // library's own oracled steps and reported as cumulative survivor
    // counts: well-formed URL -> registrable-domain cap -> word blocklist
    // -> Latin-dominant script routing. Each flag is a per-doc projection
    // or one bounded agg (cap = GroupTopK-shape ranking, blocklist =
    // broadcast left join), joined back on doc_id — no stage rescans
    // another stage's work.
    "pipeline_web_curation" -> { (s, d) =>
      graft.Graft.init(s)
      val docs = documents(s, d).select("doc_id", "source", "text")
      // every stage flag comes from the SHARED helper its standalone
      // query uses (UrlOps.domainCapRank, TextAnalysis.blocklistCounts /
      // dominantScript) — a salt, tiebreak or threshold change cannot
      // desynchronize the funnel from the queries the spec reconciles
      // it against
      val urlFlags = UrlOps.domainCapRank(docs.select("doc_id", "source"))
        .select(col("doc_id"), (col("host") =!= "").as("url_ok"),
          (col("rn") <= UrlOps.DomainCap).as("cap_ok"))
      val blFlags = TextAnalysis
        .blocklistCounts(s, docs.select("doc_id", "text"))
        .select(col("doc_id"),
          (!(col("n_blocked").cast("double") / col("n_tokens").cast("double") >
            TextAnalysis.BlockThreshold)).as("bl_ok"))
      val scFlags = docs.select(col("doc_id"),
        (TextAnalysis.dominantScript === "latin").as("sc_ok"))
      urlFlags.join(blFlags, "doc_id").join(scFlags, "doc_id")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("url_ok"), 1L).otherwise(0L)).as("after_url"),
          sum(when(col("url_ok") && col("cap_ok"), 1L).otherwise(0L))
            .as("after_cap"),
          sum(when(col("url_ok") && col("cap_ok") && col("bl_ok"), 1L)
            .otherwise(0L)).as("after_blocklist"),
          sum(when(col("url_ok") && col("cap_ok") && col("bl_ok") &&
            col("sc_ok"), 1L).otherwise(0L)).as("after_script"))
    }
  )

  /** Shared CTE chain ending in `clean(doc_id)` — the gated corpus minus
    * near-dup drops, mirroring [[cleanCorpus]] stage for stage.
    */
  private def cleanCtes: String =
    s"""WITH qtok AS (SELECT doc_id, text, ${TextHash.toksSql("text")} AS t FROM documents),
       |q AS (SELECT doc_id, ${TextAnalysis.qualitySql("t", "text")} AS quality FROM qtok),
       |exact_keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
       |gated AS (SELECT d.doc_id, d.text FROM documents d
       |  WHERE d.doc_id IN (SELECT doc_id FROM q WHERE quality >= $QualityThreshold)
       |    AND d.doc_id IN (SELECT doc_id FROM exact_keep)),
       |${Dedup.sigCtes("gated")},
       |pairs AS (${Dedup.minhashPairsSqlSelect}),
       |clean AS (SELECT doc_id FROM gated
       |  WHERE doc_id NOT IN (SELECT doc_b FROM pairs))""".stripMargin

  val oracles: Map[String, String] = Map(
    "pipeline_clean_corpus" ->
      s"""$cleanCtes
         |SELECT doc_id FROM clean ORDER BY doc_id""".stripMargin,

    "pipeline_survivor_stats" ->
      s"""$cleanCtes
         |SELECT count(*) AS n_docs,
         |  CAST(quantile_cont(n_tokens, 0.5) AS DOUBLE) AS median_tokens,
         |  CAST(quantile_cont(n_tokens, 0.9) AS DOUBLE) AS p90_tokens,
         |  min(n_tokens) AS min_tokens,
         |  max(n_tokens) AS max_tokens
         |FROM (SELECT CAST(len(${TextHash.toksSql("d.text")}) AS DOUBLE) AS n_tokens
         |      FROM documents d WHERE d.doc_id IN (SELECT doc_id FROM clean))""".stripMargin,

    "pipeline_web_curation" ->
      s"""WITH ${UrlOps.domainCapRankSql},
         |uf AS (SELECT doc_id, host <> '' AS url_ok,
         |  rn <= ${UrlOps.DomainCap} AS cap_ok FROM rr),
         |${TextAnalysis.blocklistCountsSql},
         |bf AS (SELECT doc_id,
         |  NOT (CAST(n_blocked AS DOUBLE)
         |    / CAST(n_tokens AS DOUBLE) > ${TextAnalysis.BlockThreshold}) AS bl_ok
         |  FROM bcnt),
         |${TextAnalysis.scriptProfileCte},
         |sf AS (SELECT doc_id, dominant_script = 'latin' AS sc_ok FROM dom)
         |SELECT count(*) AS n_docs,
         |  CAST(sum(CASE WHEN url_ok THEN 1 ELSE 0 END) AS BIGINT) AS after_url,
         |  CAST(sum(CASE WHEN url_ok AND cap_ok THEN 1 ELSE 0 END) AS BIGINT)
         |    AS after_cap,
         |  CAST(sum(CASE WHEN url_ok AND cap_ok AND bl_ok THEN 1 ELSE 0 END)
         |    AS BIGINT) AS after_blocklist,
         |  CAST(sum(CASE WHEN url_ok AND cap_ok AND bl_ok AND sc_ok THEN 1
         |    ELSE 0 END) AS BIGINT) AS after_script
         |FROM uf JOIN bf USING (doc_id) JOIN sf USING (doc_id)""".stripMargin
  )
}
