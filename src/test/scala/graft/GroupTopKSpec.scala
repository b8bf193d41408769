package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{FinalGroupTopKExec, PartialGroupTopKExec}

/** GroupTopK whole-operator extension: the rewrite must be invisible in
  * results (window form and operator form produce identical rows) and very
  * visible in the plan (Window gone, partial+final GroupTopK present, the
  * shuffle fed by the PARTIAL node so it carries at most k rows per key
  * per input partition).
  */
class GroupTopKSpec extends SparkSpecBase {
  import spark.implicits._

  private def topkQuery(k: Int): DataFrame = {
    val w = Window.partitionBy("l_returnflag", "l_linestatus")
      .orderBy(desc("l_extendedprice"), asc("l_orderkey"), asc("l_linenumber"))
    Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber", "l_extendedprice")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .orderBy("l_returnflag", "l_linestatus", "rn")
  }

  private def withRewrite[T](on: Boolean)(body: => T): T = {
    spark.conf.set("spark.graft.groupTopK.enabled", on.toString)
    try body finally spark.conf.unset("spark.graft.groupTopK.enabled")
  }

  private def finalPlan(df: DataFrame): org.apache.spark.sql.execution.SparkPlan = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  test("rewrite preserves results exactly on a total order (k=3)") {
    val want = withRewrite(on = false)(topkQuery(3).collect().toSeq)
    val got = withRewrite(on = true)(topkQuery(3).collect().toSeq)
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("k=1 (rn === 1) rewrites and matches") {
    def q = {
      val w = Window.partitionBy("l_returnflag").orderBy(asc("l_orderkey"), asc("l_linenumber"))
      Tables.lineitem(spark, sfDir)
        .select("l_returnflag", "l_orderkey", "l_linenumber")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .orderBy("l_returnflag")
    }
    val want = withRewrite(on = false)(q.collect().toSeq)
    val (got, plan) = withRewrite(on = true) { val df = q; (df.collect().toSeq, finalPlan(df)) }
    assert(got == want)
    assert(plan.toString.contains("FinalGroupTopK"), s"not rewritten:\n$plan")
  }

  test("residual conjuncts survive as a filter above the operator") {
    def q = {
      val w = Window.partitionBy("l_returnflag").orderBy(desc("l_quantity"), asc("l_orderkey"), asc("l_linenumber"))
      Tables.lineitem(spark, sfDir)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5 && col("rn") > 2) // keep ranks 3..5
        .orderBy("l_returnflag", "rn")
    }
    val want = withRewrite(on = false)(q.collect().toSeq)
    val got = withRewrite(on = true)(q.collect().toSeq)
    assert(got == want)
    assert(got.forall(r => r.getInt(4) >= 3 && r.getInt(4) <= 5))
  }

  test("plan: Window eliminated, partial feeds the exchange, final after it") {
    withRewrite(on = true) {
      val df = topkQuery(3)
      val s = finalPlan(df).toString
      assert(s.contains("FinalGroupTopK"), s"no final node:\n$s")
      assert(s.contains("PartialGroupTopK"), s"no partial node:\n$s")
      assert(!s.contains("WindowGroupLimit") && !s.contains("Window ["),
        s"window machinery survived alongside GroupTopK:\n$s")
      // partial prune must sit BELOW the exchange (map side), final above
      val iPart = s.indexOf("PartialGroupTopK")
      val iFin = s.indexOf("FinalGroupTopK")
      val iEx = s.indexOf("Exchange hashpartitioning")
      assert(iFin < iEx && iEx < iPart, // tree prints top-down
        s"prune is not map-side (final@$iFin ex@$iEx partial@$iPart):\n$s")
    }
  }

  test("rewrite does not fire on non-bounding filters or other window functions") {
    withRewrite(on = true) {
      // rank() instead of row_number(): must stay a window
      val w = Window.partitionBy("l_returnflag").orderBy(desc("l_quantity"))
      val df = Tables.lineitem(spark, sfDir)
        .select("l_returnflag", "l_quantity")
        .withColumn("rk", rank().over(w))
        .where(col("rk") <= 3)
      assert(!finalPlan(df).toString.contains("GroupTopK"))

      // rn >= 2: lower bound only, no top-k semantics
      val w2 = Window.partitionBy("l_returnflag").orderBy(asc("l_orderkey"), asc("l_linenumber"))
      val df2 = Tables.lineitem(spark, sfDir)
        .select("l_returnflag", "l_orderkey", "l_linenumber")
        .withColumn("rn", row_number().over(w2))
        .where(col("rn") >= 2 && col("rn") <= 100000)
      // k > maxK (1024 default) — guard refuses, still correct via window
      assert(!finalPlan(df2).toString.contains("GroupTopK"))
    }
  }

  test("ties at the boundary: per-key kept multiset of order keys matches") {
    // l_quantity has heavy ties; row identity under ties is legitimately
    // input-order-dependent in BOTH executions, so compare the multiset of
    // (key, order-value) pairs instead of rows
    def q = {
      val w = Window.partitionBy("l_returnflag").orderBy(asc("l_quantity"))
      Tables.lineitem(spark, sfDir)
        .select("l_returnflag", "l_quantity")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 50)
    }
    val want = withRewrite(on = false)(
      q.collect().map(r => (r.getString(0), r.get(1).toString)).toSeq.sorted)
    val got = withRewrite(on = true)(
      q.collect().map(r => (r.getString(0), r.get(1).toString)).toSeq.sorted)
    assert(got == want)
  }

  test("memory guard: high key cardinality flushes instead of growing; results exact") {
    // 500k rows over 100k distinct keys with maxKeysPerPartition forced to
    // 1000: every partition flushes its heap map ~25x. A flush emits a
    // superset of the per-partition top-k, which the final operator
    // re-selects — results must stay identical to the window execution.
    def q = {
      val w = Window.partitionBy("key").orderBy(asc("v"), asc("id"))
      spark.range(500000).toDF("id")
        .withColumn("key", col("id") % 100000)
        .withColumn("v", (col("id") * 2654435761L) % 999983)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
    }
    def normalized(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(1), r.getInt(3), r.getLong(0), r.getLong(2))).sorted.toSeq
    val want = withRewrite(on = false)(normalized(q.collect()))
    spark.conf.set("spark.graft.groupTopK.maxKeysPerPartition", "1000")
    try {
      val (got, plan) = withRewrite(on = true) { val df = q; (normalized(df.collect()), finalPlan(df)) }
      assert(plan.toString.contains("FinalGroupTopK"), s"not rewritten:\n$plan")
      assert(got.size == want.size && got == want,
        s"flush path diverged: got ${got.size} rows want ${want.size}")
    } finally spark.conf.unset("spark.graft.groupTopK.maxKeysPerPartition")

    // and at the DEFAULT threshold, ~1e6 near-unique keys complete with
    // bounded memory and exact parity (each key's heap holds its 1 row)
    def q1m = {
      val w = Window.partitionBy("key").orderBy(asc("id"))
      spark.range(1000000).toDF("id")
        .withColumn("key", col("id"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 1)
    }
    val wantN = withRewrite(on = false)(q1m.count())
    val gotN = withRewrite(on = true)(q1m.count())
    assert(gotN == wantN && gotN == 1000000L)
  }

  test("extensions-injected session: init prefers GraftExtensions, adds no experimental wiring") {
    // Build a second session over the SAME SparkContext but with
    // GraftExtensions applied at build time (the supported injection
    // point). Graft.init must detect the injected rules and leave the
    // experimental hooks untouched — each rule registered exactly once —
    // and the rewrite must fire there without the experimental fallback.
    val base = spark
    SparkSpecBase.sessionLock.synchronized {
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val ext = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.plans.GraftExtensions)
        .getOrCreate()
      Graft.init(ext)
      assert(ext.experimental.extraOptimizations.isEmpty,
        "init added experimental rules despite extensions injection")
      assert(ext.experimental.extraStrategies.isEmpty,
        "init added an experimental strategy despite extensions injection")
      // Catalyst appends extended operator-optimization rules to BOTH the
      // pre- and post-"Inferring Filters" fixed-point batches — presence
      // (not count) is the signal that the extensions path is live.
      val nInjected = ext.sessionState.optimizer.batches
        .flatMap(_.rules).count(_ eq graft.plans.RewriteGroupTopK)
      assert(nInjected >= 1, "RewriteGroupTopK not injected via extensions")

      val w = Window.partitionBy("l_returnflag")
        .orderBy(desc("l_extendedprice"), asc("l_orderkey"), asc("l_linenumber"))
      def q(s: org.apache.spark.sql.SparkSession) = Tables.lineitem(s, sfDir)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .orderBy("l_returnflag", "rn")
      val df = q(ext)
      val got = df.collect().toSeq
      assert(finalPlan(df).toString.contains("FinalGroupTopK"),
        s"rewrite did not fire on the extensions session:\n${finalPlan(df)}")
      val want = withRewrite(on = false)(q(base).collect().toSeq)
      assert(got.map(_.toString) == want.map(_.toString))
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
    }
  }

  test("oracled row_number consumers adopt the operator; rank() ones do not") {
    withRewrite(on = true) {
      // row_number + filter: rewritten
      val p1 = finalPlan(SparkEntry.queries("tfidf_top_terms")(spark, sfDir)).toString
      assert(p1.contains("FinalGroupTopK"), s"tfidf_top_terms did not adopt GroupTopK:\n$p1")
      val p2 = finalPlan(SparkEntry.queries("q_min_price_per_part")(spark, sfDir)).toString
      assert(p2.contains("FinalGroupTopK"), s"q_min_price_per_part did not adopt GroupTopK:\n$p2")
      // rank() top-k (q_topk_per_segment): boundary ties can legally exceed
      // k rows — the bounded heap would drop them, so the rule must NOT
      // fire; Spark's own WindowGroupLimit still prunes it
      val p3 = finalPlan(SparkEntry.queries("q_topk_per_segment")(spark, sfDir)).toString
      assert(!p3.contains("GroupTopK") && p3.contains("WindowGroupLimit"), p3)
    }
  }
}
