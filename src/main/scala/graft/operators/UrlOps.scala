package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import TextHash.{h60, h60Sql}

/** URL curation operators — the provenance-side half of web-corpus
  * cleaning (C4 / RefinedWeb style): parse URLs into components, extract
  * the registrable domain, cap documents per domain, and canonicalize
  * URL variants so near-identical fetches dedup. The reference has no
  * category for this (SURVEY.md §2.5); at 100 TB every step here is a
  * pure per-row projection plus one bounded aggregation — the per-domain
  * cap rides the GroupTopK bounded-heap path so a hot domain (half the
  * web is on a handful of hosts) never sorts its full partition.
  *
  * The fixture's documents carry no URL column, so — exactly like the
  * planted-PII battery (Corpus.withPlantedPii) — a deterministic URL is
  * synthesized per doc from (doc_id, source) in BOTH engines, making
  * redaction^W parsing verifiable non-vacuously with hash-matched
  * oracles. The parsing itself never sees the generator: it works on the
  * string URL alone.
  */
object UrlOps {

  /** Documents kept per registrable domain by `url_domain_caps` — below
    * the fixture's per-domain doc count at every SF (sf0.01 yields ~100
    * docs/domain), so the cap provably bites in the driver's check.
    */
  val DomainCap = 80

  // ------------------------------------------------------------ synth URL

  /** Deterministic per-doc URL with scheme/subdomain/domain/port/path/
    * query/fragment variety, including two-level public suffixes
    * (co.uk / ac.uk) that naive "last two labels" registrable-domain
    * extraction gets wrong — and a planted MALFORMED slice (doc_id % 19:
    * scheme-less relative references, as crawl link-extraction emits) on
    * which every component extractor must degrade to ''/NULL, never
    * misparse.
    */
  private def synthUrl: Column = {
    val id = col("doc_id")
    val scheme = when(id % 11 === 0, "http").otherwise("https")
    val sub = element_at(
      array(lit(""), lit("www."), lit("cdn."), lit("blog.")),
      (id % 4).cast("int") + 1)
    val dom = element_at(
      array(lit("example.com"), lit("data.org"), lit("files.net"),
        lit("archive.co.uk"), lit("mirror.ac.uk")),
      (id % 5).cast("int") + 1)
    val port = when(id % 7 === 0, ":8080").otherwise("")
    val path = concat(lit("/"), lower(col("source")), lit("/doc"),
      id.cast("string"))
    val query = when(id % 3 === 1,
        concat(lit("?utm_source=feed&id="), id.cast("string")))
      .when(id % 3 === 2, concat(lit("?id="), id.cast("string"), lit("&ref=rss")))
      .otherwise("")
    val frag = when(id % 6 === 0, "#sec2").otherwise("")
    when(id % 19 === 0, concat(lit("/relative/doc"), id.cast("string")))
      .otherwise(concat(scheme, lit("://"), sub, dom, port, path, query, frag))
  }

  /** DuckDB mirror of [[synthUrl]]. */
  private def synthUrlSql: String =
    """(CASE WHEN doc_id % 19 = 0 THEN '/relative/doc' || CAST(doc_id AS VARCHAR) ELSE
      | CASE WHEN doc_id % 11 = 0 THEN 'http' ELSE 'https' END || '://' ||
      | (['', 'www.', 'cdn.', 'blog.'])[CAST(doc_id % 4 AS INTEGER) + 1] ||
      | (['example.com', 'data.org', 'files.net', 'archive.co.uk',
      |   'mirror.ac.uk'])[CAST(doc_id % 5 AS INTEGER) + 1] ||
      | CASE WHEN doc_id % 7 = 0 THEN ':8080' ELSE '' END ||
      | '/' || lower(source) || '/doc' || CAST(doc_id AS VARCHAR) ||
      | CASE WHEN doc_id % 3 = 1 THEN '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR)
      |      WHEN doc_id % 3 = 2 THEN '?id=' || CAST(doc_id AS VARCHAR) || '&ref=rss'
      |      ELSE '' END ||
      | CASE WHEN doc_id % 6 = 0 THEN '#sec2' ELSE '' END END)"""
      .stripMargin.replace("\n", " ")

  // ------------------------------------------------------------- parsing

  // Component regexes in the RE2 ∩ java.util.regex common subset (the
  // library-wide dialect rule), applied to the URL string only — both
  // engines' regexp_extract return "" on no match, which the CASE guards
  // turn into typed NULLs where a component is genuinely absent.
  private[graft] val SchemeRe = "^([a-z][a-z0-9+.-]*)://"
  private[graft] val HostPortRe = "^[a-z][a-z0-9+.-]*://([^/?#]*)"
  private[graft] val PathRe = "^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)"
  private[graft] val QueryRe = "\\?([^#]*)"
  private[graft] val FragRe = "#(.*)$"
  // registrable domain: last 3 labels under a 2-level public suffix
  // (a stand-in slice of the public-suffix list), else last 2
  private[graft] val Reg3Re = "([a-z0-9-]+\\.(?:co|ac)\\.uk)$"
  private[graft] val Reg2Re = "([a-z0-9-]+\\.[a-z]+)$"
  private[graft] val TldRe = "\\.([a-z]+)$"

  /** Canonical form of a URL column: lowercase host, https default port
    * and one trailing slash stripped, utm_* tracking params and the
    * fragment dropped — the normalization `url_normalize_dedup` groups on
    * and the streaming canonical-dedup gate keys its state on (pure
    * per-row expression, reusable on batch or stream).
    *
    * The scheme is DELIBERATELY rewritten to https (the https-upgrade
    * canonicalization: http://x and https://x are the same fetch target
    * for dedup purposes). An UNPARSEABLE input (no scheme://host —
    * HostPortRe fails) canonicalizes to ITSELF: every extractor returns
    * '' there, and collapsing all malformed refs onto one constant key
    * would make the dedup gate drop every malformed doc after the first.
    */
  def canonicalUrl(url: Column): Column = {
    val hostPart = regexp_extract(url, HostPortRe, 1)
    val q0 = regexp_extract(url, QueryRe, 1)
    // strip utm_ params: interior '&utm_x=y' first, then a leading
    // 'utm_x=y&' / lone 'utm_x=y' (replace-all in BOTH engines)
    val q1 = regexp_replace(regexp_replace(q0, "&utm_[^&]*", ""),
      "^utm_[^&]*&?", "")
    val path0 = regexp_extract(url, PathRe, 1)
    when(hostPart === "", url)
      .otherwise(concat(lit("https://"),
        regexp_replace(lower(hostPart), ":443$", ""),
        // "/+$": ALL trailing slashes, so canonical(canonical(u)) ==
        // canonical(u) holds for "//"-terminated paths too
        regexp_replace(path0, "/+$", ""),
        when(q1 =!= "", concat(lit("?"), q1)).otherwise("")))
  }

  /** (doc_id, url, host, reg_domain) — the projection the cap/dedup
    * queries build on.
    */
  private[operators] def withDomain(docs: DataFrame): DataFrame = {
    val hp = regexp_extract(col("url"), HostPortRe, 1)
    val host = regexp_extract(hp, "^([^:]*)", 1)
    val r3 = regexp_extract(host, Reg3Re, 1)
    val r2 = regexp_extract(host, Reg2Re, 1)
    // A corpus that CARRIES a url column curates on it (the real-world
    // shape — crawled docs arrive with their URL); the url-less fixture
    // synthesizes the deterministic one the oracles mirror. The funnel
    // forwards url when present, so the domain-cap stage is no longer
    // pinned to the fixture's 5 synthetic domains (r11: lets the scale
    // probe run the cap NON-binding).
    val withUrl =
      if (docs.columns.contains("url")) docs
      else docs.withColumn("url", synthUrl)
    withUrl
      .withColumn("host", host)
      .withColumn("reg_domain", when(r3 =!= "", r3).otherwise(r2))
  }

  /** (doc_id, host, reg_domain, rn) — the deterministic per-domain cap
    * rank (salted-md5 order through the GroupTopK-shape window), the ONE
    * definition `url_domain_caps` and the web-curation funnel both rank
    * with (a salt/tiebreak change can't desynchronize them).
    */
  private[graft] def domainCapRank(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("reg_domain").orderBy(col("k"), col("doc_id"))
    withDomain(docs)
      .withColumn("k",
        h60(concat(lit("urlcap"), col("doc_id").cast("string"))))
      .withColumn("rn", row_number().over(w))
      .select("doc_id", "host", "reg_domain", "rn")
  }

  /** CTE chain ending in `rr(doc_id, host, reg_domain, rn)` — the DuckDB
    * mirror of [[domainCapRank]].
    */
  private[graft] def domainCapRankSql: String =
    s"""$withDomainSql,
       |kk AS (SELECT doc_id, reg_domain, host,
       |  ${h60Sql("'urlcap' || CAST(doc_id AS VARCHAR)")} AS k FROM wd),
       |rr AS (SELECT doc_id, host, reg_domain,
       |  row_number() OVER (PARTITION BY reg_domain ORDER BY k, doc_id) AS rn
       |  FROM kk)""".stripMargin

  private[operators] def withDomainSql: String =
    s"""u AS (SELECT doc_id, $synthUrlSql AS url FROM documents),
       |h AS (SELECT doc_id, url,
       |  regexp_extract(regexp_extract(url, '$HostPortRe', 1), '^([^:]*)', 1)
       |    AS host FROM u),
       |wd AS (SELECT doc_id, url, host,
       |  CASE WHEN regexp_extract(host, '$Reg3Re', 1) <> ''
       |       THEN regexp_extract(host, '$Reg3Re', 1)
       |       ELSE regexp_extract(host, '$Reg2Re', 1) END AS reg_domain
       |  FROM h)""".stripMargin

  // ------------------------------------------------------------- queries

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Full component split of every URL: scheme, host, port (typed NULL
    // when absent), path, query, fragment, registrable domain, TLD. Pure
    // per-row regex projection — no shuffle at any scale.
    "url_parse" -> { (s, d) =>
      val url = col("url")
      val hp = regexp_extract(url, HostPortRe, 1)
      val host = regexp_extract(hp, "^([^:]*)", 1)
      val portS = regexp_extract(hp, ":([0-9]+)$", 1)
      val r3 = regexp_extract(host, Reg3Re, 1)
      val r2 = regexp_extract(host, Reg2Re, 1)
      documents(s, d).select(col("doc_id"), synthUrl.as("url"))
        .select(col("doc_id"), url,
          regexp_extract(url, SchemeRe, 1).as("scheme"),
          host.as("host"),
          when(portS === "", lit(null).cast("int"))
            .otherwise(portS.cast("int")).as("port"),
          regexp_extract(url, PathRe, 1).as("path"),
          regexp_extract(url, QueryRe, 1).as("query"),
          regexp_extract(url, FragRe, 1).as("fragment"),
          when(r3 =!= "", r3).otherwise(r2).as("reg_domain"),
          regexp_extract(host, TldRe, 1).as("tld"))
        .orderBy("doc_id")
    },

    // RefinedWeb-style per-domain document cap: keep at most DomainCap
    // docs per registrable domain, selected by a deterministic md5 draw
    // (salted doc_id) so both engines keep the identical subset. The
    // row_number ≤ cap filter is exactly the GroupTopK whole-operator
    // shape: per-partition bounded heaps, ≤ cap rows per domain cross the
    // shuffle — a billion-doc hot domain never materializes, let alone
    // sorts, its full partition.
    "url_domain_caps" -> { (s, d) =>
      graft.Graft.init(s) // injects RewriteGroupTopK (idempotent)
      domainCapRank(documents(s, d).select("doc_id", "source"))
        .where(col("rn") <= DomainCap)
        .select(col("doc_id"), col("reg_domain"))
        .orderBy("doc_id")
    },

    // Per-domain retention profile of the same cap — the audit view
    // (bounded: one row per domain).
    "url_domain_cap_stats" -> { (s, d) =>
      withDomain(documents(s, d).select("doc_id", "source"))
        .groupBy("reg_domain")
        .agg(count(lit(1)).as("n_docs"),
          least(count(lit(1)), lit(DomainCap.toLong)).as("n_kept"),
          greatest(count(lit(1)) - DomainCap, lit(0L)).as("n_dropped"))
        .orderBy("reg_domain")
    },

    // URL canonicalization + dedup: lowercase host, strip the https
    // default port, strip one trailing slash, drop utm_* tracking params
    // and the fragment — then group. The fixture plants PAIRS (docs 2k and
    // 2k+1 derive their URL content from the shared even id; the odd twin
    // gets an uppercased host, a :443 port, a trailing slash, utm_ params
    // and a fragment), so every canonical group must collapse exactly two
    // raw variants — a planted-truth check, like the PII battery. Pure
    // per-row normalization + one md5-key-sized groupBy.
    "url_normalize_dedup" -> { (s, d) =>
      val base = col("doc_id") - (col("doc_id") % 2)
      val odd = col("doc_id") % 2 === 1
      val host0 = concat(
        element_at(array(lit(""), lit("www."), lit("cdn."), lit("blog.")),
          (base % 4).cast("int") + 1),
        element_at(array(lit("example.com"), lit("data.org"), lit("files.net"),
          lit("archive.co.uk"), lit("mirror.ac.uk")),
          (base % 5).cast("int") + 1))
      val rawUrl = concat(lit("https://"),
        when(odd, upper(host0)).otherwise(host0),
        when(odd, ":443").otherwise(""),
        lit("/p/doc"), base.cast("string"), when(odd, "/").otherwise(""),
        when(odd, concat(lit("?utm_source=feed&id="), base.cast("string"),
            lit("&utm_campaign=x")))
          .otherwise(concat(lit("?id="), base.cast("string"))),
        when(odd, "#top").otherwise(""))
      val raw = documents(s, d).select(col("doc_id"), rawUrl.as("url"))
      raw.withColumn("canon_url", canonicalUrl(col("url")))
        .groupBy("canon_url")
        .agg(count(lit(1)).as("n_variants"),
          min("doc_id").as("doc_a"), max("doc_id").as("doc_b"))
        .where(col("n_variants") >= 2)
        .orderBy("canon_url")
    }
  )

  // ------------------------------------------------------------- oracles

  val oracles: Map[String, String] = Map(

    "url_parse" ->
      s"""WITH u AS (SELECT doc_id, $synthUrlSql AS url FROM documents),
         |p AS (SELECT doc_id, url,
         |  regexp_extract(url, '$SchemeRe', 1) AS scheme,
         |  regexp_extract(regexp_extract(url, '$HostPortRe', 1), '^([^:]*)', 1) AS host,
         |  regexp_extract(regexp_extract(url, '$HostPortRe', 1), ':([0-9]+)$$', 1) AS ports,
         |  regexp_extract(url, '$PathRe', 1) AS path,
         |  regexp_extract(url, '\\?([^#]*)', 1) AS query,
         |  regexp_extract(url, '#(.*)$$', 1) AS fragment
         |  FROM u)
         |SELECT doc_id, url, scheme, host,
         |  CASE WHEN ports = '' THEN NULL ELSE CAST(ports AS INTEGER) END AS port,
         |  path, query, fragment,
         |  CASE WHEN regexp_extract(host, '$Reg3Re', 1) <> ''
         |       THEN regexp_extract(host, '$Reg3Re', 1)
         |       ELSE regexp_extract(host, '$Reg2Re', 1) END AS reg_domain,
         |  regexp_extract(host, '\\.([a-z]+)$$', 1) AS tld
         |FROM p ORDER BY doc_id""".stripMargin,

    "url_domain_caps" ->
      s"""WITH $domainCapRankSql
         |SELECT doc_id, reg_domain FROM rr WHERE rn <= $DomainCap
         |ORDER BY doc_id""".stripMargin,

    "url_domain_cap_stats" ->
      s"""WITH $withDomainSql
         |SELECT reg_domain, count(*) AS n_docs,
         |  CAST(least(count(*), $DomainCap) AS BIGINT) AS n_kept,
         |  CAST(greatest(count(*) - $DomainCap, 0) AS BIGINT) AS n_dropped
         |FROM wd GROUP BY reg_domain ORDER BY reg_domain""".stripMargin,

    "url_normalize_dedup" ->
      s"""WITH raw AS (SELECT doc_id,
         |  'https://' ||
         |  CASE WHEN doc_id % 2 = 1 THEN upper(h) ELSE h END ||
         |  CASE WHEN doc_id % 2 = 1 THEN ':443' ELSE '' END ||
         |  '/p/doc' || CAST(b AS VARCHAR) ||
         |  CASE WHEN doc_id % 2 = 1 THEN '/' ELSE '' END ||
         |  CASE WHEN doc_id % 2 = 1
         |       THEN '?utm_source=feed&id=' || CAST(b AS VARCHAR) || '&utm_campaign=x'
         |       ELSE '?id=' || CAST(b AS VARCHAR) END ||
         |  CASE WHEN doc_id % 2 = 1 THEN '#top' ELSE '' END AS url
         |  FROM (SELECT doc_id, doc_id - (doc_id % 2) AS b,
         |    (['', 'www.', 'cdn.', 'blog.'])[CAST((doc_id - (doc_id % 2)) % 4 AS INTEGER) + 1] ||
         |    (['example.com', 'data.org', 'files.net', 'archive.co.uk',
         |      'mirror.ac.uk'])[CAST((doc_id - (doc_id % 2)) % 5 AS INTEGER) + 1] AS h
         |   FROM documents)),
         |c AS (SELECT doc_id,
         |  'https://' ||
         |  regexp_replace(lower(regexp_extract(url, '$HostPortRe', 1)), ':443$$', '') ||
         |  regexp_replace(regexp_extract(url, '$PathRe', 1), '/+$$', '') ||
         |  CASE WHEN regexp_replace(regexp_replace(
         |         regexp_extract(url, '\\?([^#]*)', 1), '&utm_[^&]*', '', 'g'),
         |         '^utm_[^&]*&?', '', 'g') <> ''
         |       THEN '?' || regexp_replace(regexp_replace(
         |         regexp_extract(url, '\\?([^#]*)', 1), '&utm_[^&]*', '', 'g'),
         |         '^utm_[^&]*&?', '', 'g')
         |       ELSE '' END AS canon_url
         |  FROM raw)
         |SELECT canon_url, count(*) AS n_variants,
         |  min(doc_id) AS doc_a, max(doc_id) AS doc_b
         |FROM c GROUP BY canon_url HAVING count(*) >= 2
         |ORDER BY canon_url""".stripMargin
  )
}
