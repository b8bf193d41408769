package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan assertions: the properties that make these queries hold up
  * at 100 TB — filters reaching the parquet scan, column pruning, broadcast
  * vs shuffle join choices, two-phase aggregation, and exchange reuse.
  * Catching a regression here means a query silently became a full-scan or
  * a shuffle it doesn't need.
  */
class PlanSpec extends SparkSpecBase {

  private def plan(name: String): String = {
    // mirror the driver mains' cache discipline (Verify/Bench call
    // releaseCaches after every query): a persisted subtree left over from
    // a previously-built query (e.g. dedup_embedding_cosine's base
    // relation) would otherwise substitute InMemoryTableScan into THIS
    // query's plan and hide the scan-level properties asserted here
    Graft.releaseCaches(spark)
    val df: DataFrame = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q6: predicates push down to the parquet scan; only needed columns read") {
    val p = plan("q6_forecast_revenue")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("IsNotNull(l_shipdate)") || p.contains("GreaterThanOrEqual(l_shipdate"), p)
    // projection pruning: the scan schema must not include unrelated columns
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("l_orderkey"), s"unpruned scan: $readSchema")
  }

  test("q5: bounded dims join via broadcast") {
    val p = plan("q5_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"), p)
    // Whether the lineitem-orders fact join broadcasts or shuffles is
    // size-dependent (AQE decides from runtime stats); at sf0.001
    // everything legitimately fits under the broadcast threshold, so only
    // the dim-broadcast property is assertable here.
  }

  /** Final physical plan after AQE re-planning (collect() first — before
    * execution AdaptiveSparkPlan is a placeholder and hides its subtree).
    */
  private def finalPlan(name: String): org.apache.spark.sql.execution.SparkPlan = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  test("q1: two-phase (partial + final) hash aggregation inside codegen") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("partial_sum"), s"no partial aggregation:\n$p")
    // '*(n)' prefixes in the final plan mark whole-stage-codegen stages
    val fp = finalPlan("q1_pricing_summary").toString
    assert(fp.contains("*(") && fp.contains("HashAggregate"),
      s"aggregation fell out of whole-stage codegen:\n$fp")
  }

  test("ann_cosine_topk: query batch broadcast, corpus never shuffled before join") {
    val p = plan("ann_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("ann_cosine_topk: the query-batch side scan is pushdown-pruned") {
    // Similarity.base is built twice (query side + corpus side). The two
    // subtrees differ (one filtered, one not) so there is no common
    // Exchange for ReusedExchange to kick in on — the property that
    // actually matters at scale is that the SECOND scan is bounded: the
    // vec_id < QuerySet predicate must reach the parquet scan, making the
    // query-batch read tiny regardless of corpus size.
    val p = plan("ann_cosine_topk")
    assert(p.contains("LessThan(vec_id,"), s"query-batch filter not pushed:\n$p")
  }

  test("dedup_embedding_cosine: candidate generation is equi-join only (no all-pairs)") {
    val p = plan("dedup_embedding_cosine")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join leaked back into the LSH path:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"expected an equi-join:\n$p")
  }

  test("dedup_jaccard_prefix: prefix candidate generation is equi-join only (no all-pairs)") {
    val p = plan("dedup_jaccard_prefix")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"prefix filtering must stay an equi-join on the prefix shingle:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"expected an equi-join:\n$p")
  }

  test("link_fuzzy_neighbors: blocked matching is equi-join only (no all-pairs)") {
    val p = plan("link_fuzzy_neighbors")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"blocking must stay an equi-join on the block key:\n$p")
  }

  test("graph_textrank: corpus collapses before the iteration (edge agg is map-side combined)") {
    val p = plan("graph_textrank")
    // partial aggregation of the edge groupBy: a HashAggregate below the
    // exchange (same lock as the minhash signature agg)
    val firstAgg = p.linesIterator.find(_.contains("HashAggregate"))
    assert(firstAgg.isDefined, s"no hash aggregate in textrank plan:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_histogram: bounds row broadcasts; no shuffle of the fact side before bucketing") {
    val p = plan("q_histogram")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"1-row bounds must broadcast:\n$p")
  }

  test("q21: EXISTS/NOT EXISTS decorrelation stays equi-join (no nested loop)") {
    // The per-order aggregate replaces two correlated self-joins; if the
    // decorrelation regressed to Spark's generic correlated-subquery
    // rewrite, a nested loop would appear and the query would be
    // quadratic per order at scale.
    val p = plan("q21_waiting_suppliers")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"correlated self-join degenerated to a nested loop:\n$p")
  }

  test("q2: correlated-min decorrelation is a key equi-join; dims broadcast") {
    val p = plan("q2_min_cost_ship")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"min-per-part join is not an equi-join:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"dims not broadcast:\n$p")
  }

  test("q17: correlated-avg decorrelation keeps the part filter pushed down") {
    val p = plan("q17_small_qty_revenue")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"per-part avg join is not an equi-join:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(p_brand)") ||
      p.contains("EqualTo(p_brand,Brand#11)"),
      s"part filter not pushed to the scan:\n$p")
  }

  test("q_range_join: binned equi-join, never a nested loop") {
    val p = plan("q_range_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated to a nested loop:\n$p")
  }

  test("src_bucketed_join: co-located SortMergeJoin with no exchange on either side") {
    // broadcast off: at fixture scale AQE would broadcast the small side and
    // hide the property under test (bucket co-location kills the shuffle).
    // Save/restore the session's actual prior value — suites share one
    // JVM-wide session, so a hardcoded restore would leak into later suites.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "-1")
    try {
      val fp = finalPlan("src_bucketed_join").toString
      assert(fp.contains("SortMergeJoin"), s"expected SMJ:\n$fp")
      val hashEx = raw"Exchange hashpartitioning".r.findAllIn(fp).size
      // exactly 1: the groupBy(o_orderpriority) after the join — the join
      // itself reads bucket i vs bucket i with no exchange
      assert(hashEx == 1, s"bucketed join should not shuffle (hash=$hashEx):\n$fp")
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("AQE splits a skewed join partition (skew-join readiness, SURVEY 2.4)") {
    // one hot key carrying ~100k rows vs 9 cold keys; thresholds lowered so
    // fixture-scale skew trips the same OptimizeSkewedJoin path a hot key
    // at 100 TB would
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prior = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions._
      // key 0 carries 90% of the rows; key 9 the rest
      val big = spark.range(110000)
        .select(when(col("id") % 10 < 9, lit(0L)).otherwise(lit(9L)).as("k"),
          concat(lit("payload-payload-payload-"), col("id")).as("pad"))
      val dim = spark.range(10).select(col("id").as("k"), col("id").as("v"))
      // final aggregate is global (no distribution requirement downstream —
      // a groupBy(k) would forbid splitting the join's partitions) and
      // consumes pad so the payload survives column pruning into the join
      val j = big.join(dim, "k").agg(sum(length(col("pad"))).as("bytes"))
      j.collect()
      val fp = j.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(fp.contains("isSkewJoin=true") || fp.contains("skewed"),
        s"AQE did not split the skewed partition:\n$fp")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("CBO: ANALYZE TABLE statistics reach the optimizer (SURVEY 2.4 CBO row)") {
    // the catalog tables written by src_bucketed_join double as the CBO
    // fixture: compute stats, enable CBO, and assert the optimizer sees an
    // exact row count (the signal join reorder / stats-based planning keys
    // off) rather than a size-only estimate
    SparkEntry.queries("src_bucketed_join")(spark, sfDir).collect()
    spark.sql("ANALYZE TABLE graft_b_orders COMPUTE STATISTICS FOR COLUMNS o_orderkey")
    val key = "spark.sql.cbo.enabled"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val stats = spark.table("graft_b_orders")
        .queryExecution.optimizedPlan.stats
      assert(stats.rowCount.isDefined, s"ANALYZE stats not visible to optimizer: $stats")
      val expected = spark.table("graft_b_orders").count()
      assert(stats.rowCount.get.toLong === expected)
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("GroupTopK/MaxPerKey stats: k-bounded row estimate unlocks a broadcast " +
    "join the child's size would veto; kill-switched results identical") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    Graft.init(spark)
    spark.sql("DROP TABLE IF EXISTS graft_stats_docs")
    // a previous JVM's metastore is gone but its warehouse directory can
    // survive, and CREATE validates the location — clear it first
    val wh = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "graft_stats_docs")
    if (java.nio.file.Files.isDirectory(wh)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(wh).iterator.asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists)
    }
    Tables.documents(spark, sfDir).select("doc_id", "source")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable("graft_stats_docs")
    spark.sql("ANALYZE TABLE graft_stats_docs COMPUTE STATISTICS FOR COLUMNS doc_id, source")
    val confs = Seq(
      "spark.sql.cbo.enabled" -> "true",
      // below the base table's size, far above k x distinct(source)
      "spark.sql.autoBroadcastJoinThreshold" -> "2048")
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val base = spark.table("graft_stats_docs")
      def topk = base
        .withColumn("rn", row_number().over(
          Window.partitionBy("source").orderBy("doc_id")))
        .where(col("rn") <= 2)
      def maxk = base
        .withColumn("mx", max("doc_id").over(Window.partitionBy("source")))
        .where(col("doc_id") === col("mx"))
      val probe = spark.table("graft_stats_docs").select(col("doc_id").as("d2"))
      def joinOf(small: DataFrame) =
        probe.join(small, col("d2") === col("doc_id"))

      // sanity: the base table itself is NOT broadcastable at this threshold
      assert(base.queryExecution.optimizedPlan.stats.sizeInBytes > 2048,
        "fixture too small to prove anything")

      for ((small, node) <- Seq((topk, "GroupTopK"), (maxk, "MaxPerKey"))) {
        val j = joinOf(small)
        val p = j.queryExecution.executedPlan.toString
        assert(p.contains(node), s"rewrite did not fire:\n$p")
        assert(p.contains("BroadcastHashJoin"),
          s"$node stats did not unlock the broadcast:\n$p")
        assert(!p.contains("SortMergeJoin"), s"shuffle join survived:\n$p")
      }

      // kill-switched (window path): identical rows — the stats change
      // affects the plan, never the answer
      def rows(df: DataFrame) =
        df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
      val onT = rows(joinOf(topk)); val onM = rows(joinOf(maxk))
      spark.conf.set("spark.graft.groupTopK.enabled", "false")
      spark.conf.set("spark.graft.maxPerKey.enabled", "false")
      try {
        assert(rows(joinOf(topk)) == onT, "topk kill-switch parity broken")
        assert(rows(joinOf(maxk)) == onM, "maxPerKey kill-switch parity broken")
      } finally {
        spark.conf.unset("spark.graft.groupTopK.enabled")
        spark.conf.unset("spark.graft.maxPerKey.enabled")
      }
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("dedup_minhash signature aggregation is map-side combined") {
    val p = plan("dedup_minhash_pairs")
    val nPartial = p.linesIterator.count(_.contains("HashAggregate"))
    assert(nPartial >= 2, s"minhash sig agg should be partial+final:\n$p")
  }

  test("q_sessionize_batch: windows and aggregation share one shuffle on user_id") {
    // AQE wraps shuffles in leaf ShuffleQueryStage nodes (collect() can't
    // recurse into them) — count Exchange nodes in the printed final plan
    val fp = finalPlan("q_sessionize_batch").toString
    val hashEx = raw"Exchange hashpartitioning".r.findAllIn(fp).size
    val rangeEx = raw"Exchange rangepartitioning".r.findAllIn(fp).size
    // 1 hashpartitioning(user_id) feeding lag + running-sum windows AND the
    // groupBy, + 1 rangepartitioning for the final orderBy — nothing else
    assert(hashEx == 1 && rangeEx <= 1, s"unexpected shuffles (hash=$hashEx range=$rangeEx):\n$fp")
  }

  test("runtime bloom filter: selective dim filter injects a bloom probe on the fact side") {
    // Row-level runtime filtering — at 100 TB a selective dim predicate
    // becomes a bloom probe on the fact scan, dropping most fact rows
    // BEFORE the join shuffle. Broadcast is disabled to force the shuffle
    // join this feature exists for.
    import org.apache.spark.sql.functions.col
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prior = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.lineitem(spark, sfDir)
      val ord = Tables.orders(spark, sfDir).where(col("o_orderpriority") === "1-URGENT")
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").count()
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain") || p.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n$p")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bm25_topk: per-term top-k goes through the GroupTopK rewrite") {
    val p = plan("bm25_topk")
    assert(p.contains("GroupTopK"), s"row_number<=k not rewritten:\n$p")
  }

  test("bm25: vocabulary filter survives to the token stream; aggs map-side combine") {
    val p = plan("bm25_scores")
    // the isin(queryTerms) filter exists on the exploded term column (Catalyst
    // keeps filters below exchanges; Generate feeding a Filter feeding a
    // partial HashAggregate is the pruned-before-shuffle shape)
    assert(p.contains("term#") && p.contains(" IN (join,vector,scan,filter)"),
      s"query-vocabulary filter missing:\n$p")
    assert(p.contains("partial_count"), s"no map-side combine:\n$p")
    assert(!p.contains("CartesianProduct"), s"all-pairs leak:\n$p")
  }

  test("chunk_overlap: pure map-side — no Exchange anywhere (sort excepted)") {
    val p = plan("chunk_overlap")
    // the only exchange allowed is the final presentation orderBy's range
    // partitioning; no hash-partitioned (aggregate/join) exchange exists
    assert(!p.contains("hashpartitioning"), s"unexpected shuffle:\n$p")
  }

  test("bloom_gate: the filter row broadcasts; probes never shuffle to meet it") {
    val p = plan("bloom_gate")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"sketch row not broadcast:\n$p")
  }

  test("semdedup_pairs: candidate generation is the cluster-blocked equi-join") {
    val p = plan("semdedup_pairs")
    assert(!p.contains("CartesianProduct"), s"all-pairs leak:\n$p")
  }

  test("src_partitioned_parquet: partition pruning leaves a single partition") {
    val df = SparkEntry.queries("src_partitioned_parquet")(spark, sfDir)
    df.collect() // materialize so FileSourceScan has chosen partitions
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
  }

  test("split_leakage: LSH-banded candidates only — never an all-pairs join") {
    val p = plan("split_leakage")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs leak:\n$p")
  }

  test("graph_triangles: oriented-edge equi-joins, no cartesian") {
    // the 1-row census columns legitimately assemble via broadcast
    // nested-loop crossJoins (same shape as q_histogram's bounds row);
    // the property under test is that the TRIANGLE joins hash — the plan
    // must contain equi-joins and no CartesianProduct
    val p = plan("graph_triangles_by_degree")
    assert(!p.contains("CartesianProduct"), s"all-pairs leak:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"no equi-join in triangle plan:\n$p")
  }

  test("q_band_join_auto: the naive abs-diff join rides RewriteBandJoin into an equi-join") {
    val p = plan("q_band_join_auto")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"band rewrite did not fire:\n$p")
    assert(p.contains("Generate"), s"no bin explode:\n$p")
  }

  test("ts_decay_scores: anchor-date row broadcasts; events never shuffle to meet it") {
    val p = plan("ts_decay_scores")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"anchor not broadcast:\n$p")
    // the per-user rollup is map-side combined
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
  }

  test("fk_orphans: every FK probe is a broadcast anti-join; counts map-side combine") {
    val p = plan("fk_orphans")
    assert(!p.contains("SortMergeJoin"),
      s"dim side shuffled instead of broadcast:\n$p")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"no broadcast anti-join:\n$p")
    assert(p.contains("partial_count"), s"counts not map-side combined:\n$p")
  }

  test("merge_scd2: one key shuffle feeds the version window; no extra exchange") {
    val p = plan("merge_scd2")
    // history union aggregates/windows on the merge key: exactly the
    // change-agg exchange(s) plus the window's key partitioning — the
    // delta aggregation must be map-side combined
    assert(p.contains("partial_sum") || p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("contamination_blast_radius: BFS rounds are equi-joins, never all-pairs") {
    val p = plan("contamination_blast_radius")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs leak in BFS:\n$p")
  }

  test("incr_agg_merge: both phases are hash aggregations with map-side partials") {
    val p = plan("incr_agg_merge")
    assert(p.contains("partial_sum"), s"partials missing:\n$p")
    assert(!p.contains("SortAggregate"), s"hash agg expected:\n$p")
  }

  test("ann_knn_graph: corpus×corpus stays a bucket equi-join, never all-pairs") {
    val p = plan("ann_knn_graph")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"kNN-graph build leaked an all-pairs join:\n$p")
  }

  test("nb_lang_scores: model state broadcasts; the token stream never shuffles to meet it") {
    val p = plan("nb_lang_scores")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"model relations not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_interval_overlap: binned equi-join (the naive overlap predicate is a nested loop)") {
    val p = plan("q_interval_overlap")
    assert(!p.contains("CartesianProduct"), s"interval join went all-pairs:\n$p")
  }

  test("bpe_merges: training runs during construction — the result plan is pure literal rounds") {
    val p = plan("bpe_merges")
    // training ran round-by-round during plan construction (the iterative-
    // kernel discipline); each round's selected pair was driver-folded, so
    // the result plan is a union of literal 1-row projections — no corpus
    // scan, no checkpoint scan, no join at all
    assert(!p.contains("Scan parquet"), s"merges plan should not rescan the corpus:\n$p")
    assert(!p.contains("Join"), s"merges plan should be literal rounds, not joins:\n$p")
    assert(p.contains("Union"), s"expected the per-round union of literal merges:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dup_exact_spans / dup_span_pairs: gram-hash equi-shapes, never all-pairs") {
    val p = plan("dup_exact_spans")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"exact-span dedup leaked an all-pairs join:\n$p")
    // the single-shuffle form: exactly one exchange keyed by the gram hash
    // (the rest are doc_id-keyed for the island windows)
    val p2 = plan("dup_span_pairs")
    assert(!p2.contains("CartesianProduct") && !p2.contains("BroadcastNestedLoopJoin"),
      s"pair provenance leaked an all-pairs join:\n$p2")
    // equi-join on the gram hash; AQE may pick broadcast at tiny SF, but
    // it must be a HASH-KEYED join, never a nested loop
    assert(p2.contains("SortMergeJoin") || p2.contains("ShuffledHashJoin") ||
        p2.contains("BroadcastHashJoin"),
      s"pair join should be an equi-join on the gram hash:\n$p2")
  }

  test("ann_ivfpq_topk: model state broadcasts; candidate join keys on the cell id") {
    val p = plan("ann_ivfpq_topk")
    assert(!p.contains("CartesianProduct"), s"IVF-PQ leaked a cartesian:\n$p")
    // the only nested-loop shapes allowed are broadcasts of model-sized
    // state (8 coarse centroids / per-query LUTs)
    assert(p.contains("BroadcastExchange"), s"expected broadcast model state:\n$p")
  }

  test("ann_rp_rerank_topk / ann_lsh_multiprobe_topk: query side broadcasts, corpus scans once") {
    val p = plan("ann_rp_rerank_topk")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastExchange"), s"query batch should broadcast:\n$p")
    val p2 = plan("ann_lsh_multiprobe_topk")
    assert(!p2.contains("CartesianProduct") && !p2.contains("BroadcastNestedLoopJoin"),
      s"multi-probe must stay a bucket equi-join:\n$p2")
  }

  test("wave-3 queries: equi-join/broadcast shapes, no all-pairs, no stray Expand") {
    // minhash audit: banded candidate join + inverted-index truth join,
    // full-outer on the pair key — all hash-keyed, never nested-loop
    val p = plan("minhash_recall_audit")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"recall audit leaked an all-pairs join:\n$p")
    // CDC chunking: per-position hashing is map-side; the only joins are
    // doc_id-keyed (text re-join) — hash-keyed equi-joins
    val p2 = plan("cdc_chunks")
    assert(!p2.contains("CartesianProduct") && !p2.contains("BroadcastNestedLoopJoin"),
      s"cdc chunking must stay doc_id-keyed:\n$p2")
    // MMD: corpus collapses to (label × dim) stats; the pair join is a
    // broadcast on the tiny stats frame
    val p3 = plan("emb_drift_mmd")
    assert(!p3.contains("CartesianProduct"), p3)
    assert(p3.contains("BroadcastExchange"),
      s"label-pair join should broadcast the stats frame:\n$p3")
    // gopher rules: pure per-row projection — no join anywhere in the plan
    val p4 = plan("quality_gopher_rules")
    assert(!p4.contains("Join"), s"rule battery must not join:\n$p4")
    // k-anonymity: one grouping of the QI tuple; single-column distinct
    // keeps the plan Expand-free
    val p5 = plan("kanon_classes")
    assert(!p5.contains("Join") && !p5.contains("Expand"),
      s"kanon classes should be one groupBy:\n$p5")
  }

  test("vocab_oov_rate: vocab marking is a tok-keyed equi-join, no expand for distincts") {
    val p = plan("vocab_oov_rate")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Expand"),
      s"the (split, tok) pre-aggregate should remove multi-distinct Expand:\n$p")
  }

  test("ulm_word_encoding: training ran at construction — the plan reads the checkpointed decode") {
    val p = plan("ulm_word_encoding")
    // the candidate join + Viterbi decode executed during construction
    // (iterative-kernel discipline, the bpe_merges precedent); the query
    // plan itself is a projection over the checkpointed word table —
    // no corpus rescan, no join, certainly no all-pairs
    assert(!p.contains("Scan parquet"), s"encoding plan should not rescan the corpus:\n$p")
    assert(!p.contains("Join"), s"decode already ran; expected a checkpoint read:\n$p")
    assert(p.contains("ExistingRDD"), s"expected the checkpointed decode scan:\n$p")
  }

  test("wn_overlap_pairs: fingerprint pair join is fph-keyed, never all-pairs") {
    val p = plan("wn_overlap_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the winnow pair join must stay an equi-join on the fingerprint hash:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"expected an fph equi-join:\n$p")
    // the length band is a function predicate (can't push into parquet),
    // but column pruning must: the scan reads ONLY (doc_id, text)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"documents scan should prune to doc_id+text:\n$p")
  }
}
