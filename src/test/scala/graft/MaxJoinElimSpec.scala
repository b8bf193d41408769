package graft

import org.apache.spark.sql.functions._

/** RewriteMaxSelfJoin: the keep-the-group-extreme self-join collapses to a
  * single-pass window filter — result parity with the kill-switched naive
  * plan, join eliminated from the optimized plan, guards hold.
  */
class MaxJoinElimSpec extends SparkSpecBase {

  private val flag = "spark.graft.maxJoinElim.enabled"

  private def naiveSql(fn: String): String =
    s"""SELECT l.l_suppkey, l.l_orderkey, l.l_linenumber, m.mx
       |FROM g_mje_lineitem l
       |JOIN (SELECT l_suppkey, $fn(l_extendedprice) AS mx
       |      FROM g_mje_lineitem GROUP BY l_suppkey) m
       |  ON l.l_suppkey = m.l_suppkey AND l.l_extendedprice = m.mx
       |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin

  private def setup(): Unit = {
    Graft.init(spark)
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("g_mje_lineitem")
  }

  test("max variant: join eliminated, result identical to the naive plan") {
    setup()
    val df = spark.sql(naiveSql("max"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("Join"), s"join survived:\n$opt")
    // the produced window form is further subsumed by the MaxPerKey
    // whole-operator path when that rule is on
    assert(opt.contains("windowspecdefinition") || opt.contains("MaxPerKey"),
      s"neither window nor MaxPerKey introduced:\n$opt")
    val got = df.collect().map(_.toString).toSeq
    spark.conf.set(flag, "false")
    val want = try spark.sql(naiveSql("max")).collect().map(_.toString).toSeq
    finally spark.conf.unset(flag)
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("min variant and agg-on-left variant both rewrite with parity") {
    setup()
    val df = spark.sql(naiveSql("min"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("Join"))
    val flipped = spark.sql(
      """SELECT m.mx, l.l_orderkey
        |FROM (SELECT l_suppkey, max(l_extendedprice) AS mx
        |      FROM g_mje_lineitem GROUP BY l_suppkey) m
        |JOIN g_mje_lineitem l
        |  ON l.l_suppkey = m.l_suppkey AND l.l_extendedprice = m.mx
        |ORDER BY l_orderkey, mx""".stripMargin)
    assert(!flipped.queryExecution.optimizedPlan.toString.contains("Join"))
    val got = flipped.collect().map(_.toString).toSeq
    spark.conf.set(flag, "false")
    val want = try spark.sql(
      """SELECT m.mx, l.l_orderkey
        |FROM (SELECT l_suppkey, max(l_extendedprice) AS mx
        |      FROM g_mje_lineitem GROUP BY l_suppkey) m
        |JOIN g_mje_lineitem l
        |  ON l.l_suppkey = m.l_suppkey AND l.l_extendedprice = m.mx
        |ORDER BY l_orderkey, mx""".stripMargin).collect().map(_.toString).toSeq
    finally spark.conf.unset(flag)
    assert(got === want)
  }

  test("NULL grouping keys are dropped exactly like the null-rejecting join") {
    setup()
    val s2 = spark
    import s2.implicits._
    Seq((Some(1L), 10.0), (Some(1L), 20.0), (None, 99.0), (None, 5.0), (Some(2L), 7.0))
      .toDF("k", "v").createOrReplaceTempView("g_mje_nulls")
    val sql =
      """SELECT t.k, t.v FROM g_mje_nulls t
        |JOIN (SELECT k, max(v) AS mv FROM g_mje_nulls GROUP BY k) m
        |  ON t.k = m.k AND t.v = m.mv ORDER BY t.k, t.v""".stripMargin
    val df = spark.sql(sql)
    assert(!df.queryExecution.optimizedPlan.toString.contains("Join"))
    val got = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === Seq((1L, 20.0), (2L, 7.0)), s"NULL keys must drop: $got")
    spark.conf.set(flag, "false")
    val want = try spark.sql(sql).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    finally spark.conf.unset(flag)
    assert(got === want)
  }

  test("ties: every row achieving the extreme is kept, like the join") {
    setup()
    val s2 = spark
    import s2.implicits._
    // parquet-backed: a LocalRelation would be NARROWED by column pruning
    // into a different relation, which the sameResult guard correctly
    // refuses (the rule targets file-scan subtrees, where pruning keeps
    // the relation and projects instead)
    val dir = java.nio.file.Files.createTempDirectory("mje_ties").toString
    Seq((1L, 5.0, "a"), (1L, 5.0, "b"), (1L, 3.0, "c"), (2L, 1.0, "d"))
      .toDF("k", "v", "tag").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("g_mje_ties")
    val df = spark.sql(
      """SELECT t.tag FROM g_mje_ties t
        |JOIN (SELECT k, max(v) AS mv FROM g_mje_ties GROUP BY k) m
        |  ON t.k = m.k AND t.v = m.mv ORDER BY tag""".stripMargin)
    assert(!df.queryExecution.optimizedPlan.toString.contains("Join"))
    assert(df.collect().map(_.getString(0)).toSeq === Seq("a", "b", "d"))
  }

  test("guard: differing subtrees (extra filter) must NOT rewrite") {
    setup()
    val df = spark.sql(
      """SELECT l.l_orderkey, m.mx
        |FROM g_mje_lineitem l
        |JOIN (SELECT l_suppkey, max(l_extendedprice) AS mx
        |      FROM g_mje_lineitem WHERE l_quantity > 10
        |      GROUP BY l_suppkey) m
        |  ON l.l_suppkey = m.l_suppkey AND l.l_extendedprice = m.mx""".stripMargin)
    assert(df.queryExecution.optimizedPlan.toString.contains("Join"),
      "rule fired across non-equal subtrees")
  }

  test("guard: agg-side-only IsNotNull on the compared column + foreign agg input must NOT rewrite") {
    setup()
    import spark.implicits._
    // Review scenario: the agg side drops y-null rows (y = the compared
    // column) but aggregates a DIFFERENT column x, and constraint
    // propagation is off so the probe side never gains the inferred
    // isnotnull(y). A window over the unfiltered probe would compute
    // max(x)=10 (from the y-null row) instead of the join's 5.
    // parquet-backed, not a LocalRelation: ConvertToLocalRelation would
    // fold the agg-side filter into the relation and break the rule's
    // subtree-equality precondition before the guard is ever reached
    val tmp = java.nio.file.Files.createTempDirectory("mje_nullable").toString
    Seq((1L, 10.0, Option.empty[Double]), (1L, 5.0, Some(10.0)))
      .toDF("k", "x", "y").write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).createOrReplaceTempView("g_mje_nullable")
    val q =
      """SELECT t.k, t.x, t.y, m.mx
        |FROM g_mje_nullable t
        |JOIN (SELECT k, max(x) AS mx FROM g_mje_nullable
        |      WHERE y IS NOT NULL GROUP BY k) m
        |  ON t.k = m.k AND t.y = m.mx""".stripMargin
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    try {
      val df = spark.sql(q)
      assert(df.queryExecution.optimizedPlan.toString.contains("Join"),
        "rule fired with an agg-side-only pv filter and a foreign agg input")
      assert(df.collect().isEmpty, "join semantics: no row's y equals max(x)=5")
      // positive control — same shape but the aggregate input IS the
      // compared column: max/min ignore its nulls, so the rewrite stays on
      val ok = spark.sql(
        """SELECT t.k, t.x, t.y, m.mx
          |FROM g_mje_nullable t
          |JOIN (SELECT k, max(y) AS mx FROM g_mje_nullable
          |      WHERE y IS NOT NULL GROUP BY k) m
          |  ON t.k = m.k AND t.y = m.mx""".stripMargin)
      assert(!ok.queryExecution.optimizedPlan.toString.contains("Join"),
        "sound same-column case should still rewrite")
      assert(ok.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
        Seq((1L, 5.0)))
    } finally spark.conf.unset("spark.sql.constraintPropagation.enabled")
  }

  test("count-extreme: rows matching their group's count rewrite with parity") {
    setup()
    val s2 = spark
    import s2.implicits._
    // k=1 has 3 rows (v=3 twice -> kept), k=2 has 2 rows (v=2 once -> kept)
    val dir = java.nio.file.Files.createTempDirectory("mje_cnt").toString
    Seq((1L, 3L, "a"), (1L, 1L, "b"), (1L, 3L, "c"), (2L, 1L, "d"), (2L, 2L, "e"))
      .toDF("k", "v", "tag").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("g_mje_cnt")
    val sql =
      """SELECT t.tag FROM g_mje_cnt t
        |JOIN (SELECT k, count(*) AS c FROM g_mje_cnt GROUP BY k) m
        |  ON t.k = m.k AND t.v = m.c ORDER BY tag""".stripMargin
    val df = spark.sql(sql)
    assert(!df.queryExecution.optimizedPlan.toString.contains("Join"),
      s"count-extreme should rewrite:\n${df.queryExecution.optimizedPlan}")
    val got = df.collect().map(_.getString(0)).toSeq
    assert(got === Seq("a", "c", "e"))
    spark.conf.set(flag, "false")
    val want = try spark.sql(sql).collect().map(_.getString(0)).toSeq
    finally spark.conf.unset(flag)
    assert(got === want)
  }

  test("sum-extreme: rows matching their group's total rewrite with parity") {
    setup()
    val s2 = spark
    import s2.implicits._
    // k=1 sums to 4.0 (row a matches), k=2 is a singleton (always matches)
    val dir = java.nio.file.Files.createTempDirectory("mje_sum").toString
    Seq((1L, 4.0, "a"), (1L, -2.0, "b"), (1L, 2.0, "c"), (2L, 5.0, "d"))
      .toDF("k", "v", "tag").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("g_mje_sum")
    val sql =
      """SELECT t.tag FROM g_mje_sum t
        |JOIN (SELECT k, sum(v) AS s FROM g_mje_sum GROUP BY k) m
        |  ON t.k = m.k AND t.v = m.s ORDER BY tag""".stripMargin
    val df = spark.sql(sql)
    assert(!df.queryExecution.optimizedPlan.toString.contains("Join"),
      s"sum-extreme should rewrite:\n${df.queryExecution.optimizedPlan}")
    val got = df.collect().map(_.getString(0)).toSeq
    assert(got === Seq("a", "d"))
    spark.conf.set(flag, "false")
    val want = try spark.sql(sql).collect().map(_.getString(0)).toSeq
    finally spark.conf.unset(flag)
    assert(got === want)
  }

  test("guard: DISTINCT aggregate must NOT rewrite") {
    setup()
    val df = spark.sql(
      """SELECT l.l_orderkey FROM g_mje_lineitem l
        |JOIN (SELECT l_suppkey, count(DISTINCT l_extendedprice) AS c
        |      FROM g_mje_lineitem GROUP BY l_suppkey) m
        |  ON l.l_suppkey = m.l_suppkey AND l.l_linenumber = m.c""".stripMargin)
    assert(df.queryExecution.optimizedPlan.toString.contains("Join"),
      "rule fired on a DISTINCT aggregate")
  }

  test("guard: join omitting the grouping key (match-ANY-group's-max) must NOT rewrite") {
    setup()
    val s2 = spark
    import s2.implicits._
    // row b (k=1, v=3.0) equals group 2's max but not its own group's max:
    // the join keeps it, a per-own-group window would silently drop it
    val dir = java.nio.file.Files.createTempDirectory("mje_nogrp").toString
    Seq((1L, 5.0, "a"), (1L, 3.0, "b"), (2L, 3.0, "c"), (2L, 1.0, "d"))
      .toDF("k", "v", "tag").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("g_mje_nogrp")
    val sql =
      """SELECT t.tag FROM g_mje_nogrp t
        |JOIN (SELECT max(v) AS mx FROM g_mje_nogrp GROUP BY k) m
        |  ON t.v = m.mx ORDER BY tag""".stripMargin
    val df = spark.sql(sql)
    assert(df.queryExecution.optimizedPlan.toString.contains("Join"),
      "rule fired on a join that omits the grouping key")
    val got = df.collect().map(_.getString(0)).toSeq
    assert(got === Seq("a", "b", "c"), s"match-any-group semantics broken: $got")
    spark.conf.set(flag, "false")
    val want = try spark.sql(sql).collect().map(_.getString(0)).toSeq
    finally spark.conf.unset(flag)
    assert(got === want)
  }

  test("guard: extra join conjunct or avg aggregate must NOT rewrite") {
    setup()
    val avgDf = spark.sql(
      """SELECT l.l_orderkey FROM g_mje_lineitem l
        |JOIN (SELECT l_suppkey, avg(l_extendedprice) AS mx
        |      FROM g_mje_lineitem GROUP BY l_suppkey) m
        |  ON l.l_suppkey = m.l_suppkey AND l.l_extendedprice = m.mx""".stripMargin)
    assert(avgDf.queryExecution.optimizedPlan.toString.contains("Join"))
    val extraDf = spark.sql(
      """SELECT l.l_orderkey FROM g_mje_lineitem l
        |JOIN (SELECT l_suppkey, max(l_extendedprice) AS mx
        |      FROM g_mje_lineitem GROUP BY l_suppkey) m
        |  ON l.l_suppkey = m.l_suppkey AND l.l_extendedprice = m.mx
        |     AND l.l_orderkey > m.l_suppkey""".stripMargin)
    assert(extraDf.queryExecution.optimizedPlan.toString.contains("Join"))
  }
}
