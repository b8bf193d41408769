package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Record linkage / fuzzy entity matching — blocked edit-distance join, the
  * standard shape for "find records that are ALMOST the same entity".
  * Nothing in the reference covers this (SURVEY.md §2.5); it rounds out the
  * dedup pack with the string-identity flavor (minhash/simhash cover
  * document content, this covers entity KEYS).
  *
  * Scale shape: candidate generation is an EQUI-join on a blocking key
  * (here length + suffix) — never an all-pairs cross join. Edit distance
  * runs only inside blocks; the block-size histogram query is the
  * diagnostic you run FIRST at scale, because one mega-block (think empty
  * or boilerplate keys) turns the blocked join quadratic — the same
  * hot-bucket failure mode as the n-gram posting-list join, handled the
  * same way (cap or split oversized blocks before matching).
  */
object Linkage {

  /** Maximum Levenshtein distance to call two names a fuzzy match. */
  val MaxDist = 2

  /** Minimum (6-dp-rounded) Jaro-Winkler similarity for `link_jw_best`. */
  val JwThreshold = 0.8

  /** Sorted-neighborhood comparison window (successors per record). */
  val SnWindow = 5

  /** Customers with a deterministic blocking key: name length + 3-char
    * suffix. Both engines compute identical keys (pure string ops).
    *
    * Block granularity is the scale lever: block count grows with key
    * cardinality while PAIRS grow with block size squared, so the suffix
    * must be long enough that block size stays bounded as the table grows
    * (a 2-char suffix at 10x the rows → 10x block size → 100x the
    * Levenshtein calls — measured 11.7s at sf0.1; 3 chars brings it back
    * to ~1s). Like any blocking scheme this trades recall: matches
    * differing inside the suffix are not candidates.
    */
  private def blocked(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(col("c_custkey"), col("c_name"))
      .withColumn("blk",
        concat(length(col("c_name")).cast("string"), lit(":"),
          expr("right(c_name, 3)")))

  // -------------------------------------------------------------- queries

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-record fuzzy-match summary: how many near-identical names exist
    // in my block, and which is closest (total (dist, key) order makes the
    // pick deterministic).
    "link_fuzzy_neighbors" -> { (s, d) =>
      val c = blocked(s, d)
      val pairs = c.as("a")
        .join(c.as("b"),
          col("a.blk") === col("b.blk") && col("a.c_custkey") =!= col("b.c_custkey"))
        .select(col("a.c_custkey").as("ak"), col("b.c_custkey").as("bk"),
          levenshtein(col("a.c_name"), col("b.c_name")).cast("int").as("dist"))
        .where(col("dist") <= MaxDist)
      val w = Window.partitionBy("ak").orderBy(col("dist").asc, col("bk").asc)
      pairs.withColumn("rn", row_number().over(w))
        .groupBy(col("ak").as("custkey"))
        .agg(count(lit(1)).as("n_close"),
          max(when(col("rn") === 1, col("bk"))).as("closest_key"),
          max(when(col("rn") === 1, col("dist"))).as("closest_dist"))
        .orderBy("custkey")
    },

    // Blocking-quality diagnostic: block sizes and the pair count each
    // block will feed the matcher — the skew check that catches a
    // mega-block before it goes quadratic.
    "link_block_stats" -> { (s, d) =>
      blocked(s, d)
        .groupBy("blk")
        .agg(count(lit(1)).as("n"))
        .withColumn("n_pairs", expr("n * (n - 1) DIV 2"))
        .orderBy(desc("n"), asc("blk"))
    },

    // Golden-record consolidation (survivorship): fuzzy pairs -> duplicate
    // CLUSTERS (transitive closure via the shared connected-components
    // kernel, so A~B~C merges even when A!~C) -> one master per cluster
    // (highest account balance, ties to the lowest key) with consolidated
    // fields. The full entity-resolution pipeline a reference user would
    // run: block -> match -> cluster -> survive — every stage reusing an
    // already-oracled kernel, nothing all-pairs, iteration edge-sized.
    "link_golden_record" -> { (s, d) =>
      val c = blocked(s, d)
      val pairs = c.as("a")
        .join(c.as("b"),
          col("a.blk") === col("b.blk") && col("a.c_custkey") < col("b.c_custkey"))
        .where(levenshtein(col("a.c_name"), col("b.c_name")) <= MaxDist)
        .select(col("a.c_custkey").as("src"), col("b.c_custkey").as("dst"))
      val cust = customer(s, d).select("c_custkey", "c_name", "c_acctbal")
      val cc = Components.connectedComponents(cust.select("c_custkey"), pairs)
      val w = Window.partitionBy("cc").orderBy(desc("c_acctbal"), asc("c_custkey"))
      cust.join(cc, cust("c_custkey") === cc("id"))
        .withColumn("rn", row_number().over(w))
        .groupBy(col("cc").as("cluster_id"))
        .agg(count(lit(1)).as("n_members"),
          max(when(col("rn") === 1, col("c_custkey"))).as("master_key"),
          max(when(col("rn") === 1, col("c_name"))).as("master_name"),
          max(col("c_acctbal")).as("max_acctbal"))
        .where(col("n_members") >= 2)
        .orderBy("cluster_id")
    },

    // Best fuzzy match per record under Jaro-Winkler — the ranked-score
    // face of the matcher (Levenshtein above is the boolean gate). Runs on
    // the same blocked candidates; scores come from the codegen'd
    // graft_jaro_winkler / graft_damerau kernels (functions/StringSim
    // .scala), which replicate DuckDB's byte-level semantics exactly, so
    // the similarity VALUES are part of the oracle contract, not just the
    // ranking. Scores round to 6 dp before the threshold and the window so
    // tie-breaks can never straddle an ulp; the row_number()==1 pick rides
    // the GroupTopK rewrite like every other per-key top-1.
    "link_jw_best" -> { (s, d) =>
      graft.Graft.init(s) // registers graft_jaro_winkler / graft_damerau
      val c = blocked(s, d)
      val pairs = c.as("a")
        .join(c.as("b"),
          col("a.blk") === col("b.blk") && col("a.c_custkey") =!= col("b.c_custkey"))
        .select(col("a.c_custkey").as("ak"), col("b.c_custkey").as("bk"),
          round(call_function("graft_jaro_winkler",
            col("a.c_name"), col("b.c_name")), 6).as("jw"),
          call_function("graft_damerau",
            col("a.c_name"), col("b.c_name")).as("dl"))
        .where(col("jw") >= JwThreshold)
      val w = Window.partitionBy("ak").orderBy(col("jw").desc, col("bk").asc)
      pairs.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("ak").as("custkey"), col("bk").as("best_key"),
          col("jw"), col("dl"))
        .orderBy("custkey")
    },

    // Sorted-neighborhood blocking — the OTHER classic linkage candidate
    // generator: rank all records under one global sort key and compare
    // each record only to its `SnWindow` successors in rank order. Catches
    // matches a hash-blocking key splits apart (here: same name stem,
    // different length bucket). Scale shape: Ranking.globalRank avoids the
    // single-partition window, and the rank-difference candidate join is a
    // difference-BETWEEN predicate that RewriteBandJoin turns into a
    // binned equi-join automatically (LinkageSpec locks the plan).
    "link_sorted_neighborhood" -> { (s, d) =>
      graft.Graft.init(s) // RewriteBandJoin
      val ranked = Ranking.globalRank(
        customer(s, d).select("c_custkey", "c_name"),
        Seq(col("c_name"), col("c_custkey")))
      val a = ranked.select(col("c_custkey").as("ak"), col("c_name").as("an"),
        col("rank").as("ra"))
      val b = ranked.select(col("c_custkey").as("bk"), col("c_name").as("bn"),
        col("rank").as("rb"))
      a.join(b, (col("rb") - col("ra")).between(lit(1), lit(SnWindow)))
        .select(col("ak"), col("bk"),
          levenshtein(col("an"), col("bn")).cast("int").as("dist"))
        .where(col("dist") <= MaxDist)
        .orderBy("ak", "bk")
    }
  )

  // -------------------------------------------------------------- oracles

  private def blkSql =
    "CAST(length(c_name) AS VARCHAR) || ':' || right(c_name, 3)"

  val oracles: Map[String, String] = Map(
    "link_fuzzy_neighbors" ->
      s"""WITH c AS (SELECT c_custkey, c_name, $blkSql AS blk FROM customer),
         |p AS (SELECT a.c_custkey AS ak, b.c_custkey AS bk,
         |    CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
         |  FROM c a JOIN c b ON a.blk = b.blk AND a.c_custkey <> b.c_custkey),
         |f AS (SELECT *, row_number() OVER (PARTITION BY ak ORDER BY dist, bk) AS rn
         |  FROM p WHERE dist <= $MaxDist)
         |SELECT ak AS custkey, count(*) AS n_close,
         |  max(CASE WHEN rn = 1 THEN bk END) AS closest_key,
         |  max(CASE WHEN rn = 1 THEN dist END) AS closest_dist
         |FROM f GROUP BY ak ORDER BY custkey""".stripMargin,

    "link_block_stats" ->
      s"""WITH c AS (SELECT $blkSql AS blk FROM customer),
         |g AS (SELECT blk, count(*) AS n FROM c GROUP BY blk)
         |SELECT blk, n, CAST(n * (n - 1) // 2 AS BIGINT) AS n_pairs
         |FROM g ORDER BY n DESC, blk""".stripMargin,

    "link_golden_record" ->
      s"""WITH RECURSIVE c AS (SELECT c_custkey, c_name, c_acctbal, $blkSql AS blk FROM customer),
         |pairs AS (SELECT a.c_custkey AS src, b.c_custkey AS dst
         |  FROM c a JOIN c b ON a.blk = b.blk AND a.c_custkey < b.c_custkey
         |  WHERE levenshtein(a.c_name, b.c_name) <= $MaxDist),
         |und AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),
         |reach AS (SELECT c_custkey AS id, c_custkey AS cc FROM customer
         |          UNION
         |          SELECT u.dst, r.cc FROM reach r JOIN und u ON u.src = r.id),
         |comp AS (SELECT id, min(cc) AS cc FROM reach GROUP BY id),
         |ranked AS (SELECT comp.cc, k.c_custkey, k.c_name, k.c_acctbal,
         |    row_number() OVER (PARTITION BY comp.cc
         |                       ORDER BY k.c_acctbal DESC, k.c_custkey) AS rn
         |  FROM comp JOIN customer k ON k.c_custkey = comp.id)
         |SELECT cc AS cluster_id, count(*) AS n_members,
         |  max(CASE WHEN rn = 1 THEN c_custkey END) AS master_key,
         |  max(CASE WHEN rn = 1 THEN c_name END) AS master_name,
         |  max(c_acctbal) AS max_acctbal
         |FROM ranked GROUP BY cc HAVING count(*) >= 2
         |ORDER BY cluster_id""".stripMargin,

    "link_jw_best" ->
      s"""WITH c AS (SELECT c_custkey, c_name, $blkSql AS blk FROM customer),
         |p AS (SELECT a.c_custkey AS ak, b.c_custkey AS bk,
         |    round(jaro_winkler_similarity(a.c_name, b.c_name), 6) AS jw,
         |    damerau_levenshtein(a.c_name, b.c_name) AS dl
         |  FROM c a JOIN c b ON a.blk = b.blk AND a.c_custkey <> b.c_custkey),
         |f AS (SELECT *, row_number() OVER (PARTITION BY ak ORDER BY jw DESC, bk) AS rn
         |  FROM p WHERE jw >= $JwThreshold)
         |SELECT ak AS custkey, bk AS best_key, jw, dl
         |FROM f WHERE rn = 1 ORDER BY custkey""".stripMargin,

    "link_sorted_neighborhood" ->
      s"""WITH r AS (SELECT c_custkey, c_name,
         |    row_number() OVER (ORDER BY c_name, c_custkey) AS rnk FROM customer),
         |p AS (SELECT a.c_custkey AS ak, b.c_custkey AS bk,
         |    CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
         |  FROM r a JOIN r b ON b.rnk - a.rnk BETWEEN 1 AND $SnWindow)
         |SELECT ak, bk, dist FROM p WHERE dist <= $MaxDist
         |ORDER BY ak, bk""".stripMargin
  )
}
