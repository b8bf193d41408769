package graft

import org.apache.spark.sql.functions._

/** MaxPerKey whole-operator path: the v = max(v)-over-key filter executes
  * as partial/final tie-pruned selection — parity with the kill-switched
  * window plan, ties/NULL semantics, memory-guard flushes, min variant.
  */
class MaxPerKeySpec extends SparkSpecBase {

  private val flag = "spark.graft.maxPerKey.enabled"

  private def windowSql(fn: String): String =
    s"""SELECT l_suppkey, l_orderkey, l_linenumber, mx FROM (
       |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
       |         $fn(l_extendedprice) OVER (PARTITION BY l_suppkey) AS mx
       |  FROM g_mpk_lineitem)
       |WHERE l_extendedprice = mx
       |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin

  private def setup(): Unit = {
    Graft.init(spark)
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("g_mpk_lineitem")
  }

  test("direct window form plans through Partial/FinalMaxPerKeyExec with parity") {
    setup()
    val df = spark.sql(windowSql("max"))
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("PartialMaxPerKey") && phys.contains("FinalMaxPerKey"),
      s"operator missing:\n$phys")
    assert(!phys.contains("WindowExec") && !phys.contains("Window "), s"window survived:\n$phys")
    val got = df.collect().map(_.toString).toSeq
    spark.conf.set(flag, "false")
    val want = try spark.sql(windowSql("max")).collect().map(_.toString).toSeq
    finally spark.conf.unset(flag)
    assert(got === want && got.nonEmpty)
  }

  test("min variant rewrites with parity") {
    setup()
    val df = spark.sql(windowSql("min"))
    assert(df.queryExecution.executedPlan.toString.contains("FinalMaxPerKey"))
    val got = df.collect().map(_.toString).toSeq
    spark.conf.set(flag, "false")
    val want = try spark.sql(windowSql("min")).collect().map(_.toString).toSeq
    finally spark.conf.unset(flag)
    assert(got === want)
  }

  test("ties are all kept; NULL values and all-NULL groups drop") {
    setup()
    val s2 = spark
    import s2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mpk_ties").toString
    Seq((1L, Some(5.0), "a"), (1L, Some(5.0), "b"), (1L, Some(3.0), "c"),
        (1L, None, "d"), (2L, None, "e"), (3L, Some(1.0), "f"))
      .toDF("k", "v", "tag").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("g_mpk_ties")
    val sql =
      """SELECT tag FROM (
        |  SELECT tag, v, max(v) OVER (PARTITION BY k) AS mv FROM g_mpk_ties)
        |WHERE v = mv ORDER BY tag""".stripMargin
    val df = spark.sql(sql)
    assert(df.queryExecution.executedPlan.toString.contains("FinalMaxPerKey"))
    assert(df.collect().map(_.getString(0)).toSeq === Seq("a", "b", "f"))
    spark.conf.set(flag, "false")
    val want = try spark.sql(sql).collect().map(_.getString(0)).toSeq
    finally spark.conf.unset(flag)
    assert(want === Seq("a", "b", "f"))
  }

  test("memory-guard flushes never change the answer") {
    setup()
    val df0 = spark.sql(windowSql("max")).collect().map(_.toString).toSeq
    spark.conf.set("spark.graft.maxPerKey.maxKeysPerPartition", "2")
    spark.conf.set("spark.graft.maxPerKey.maxBufferedRows", "3")
    try {
      val got = spark.sql(windowSql("max")).collect().map(_.toString).toSeq
      assert(got === df0)
    } finally {
      spark.conf.unset("spark.graft.maxPerKey.maxKeysPerPartition")
      spark.conf.unset("spark.graft.maxPerKey.maxBufferedRows")
    }
  }

  test("residual filter conjuncts survive above the operator") {
    setup()
    val sql =
      """SELECT l_orderkey, mx FROM (
        |  SELECT l_orderkey, l_suppkey, l_extendedprice,
        |         max(l_extendedprice) OVER (PARTITION BY l_suppkey) AS mx
        |  FROM g_mpk_lineitem)
        |WHERE l_extendedprice = mx AND l_orderkey % 2 = 0
        |ORDER BY l_orderkey, mx""".stripMargin
    val df = spark.sql(sql)
    assert(df.queryExecution.executedPlan.toString.contains("FinalMaxPerKey"))
    val got = df.collect().map(_.toString).toSeq
    spark.conf.set(flag, "false")
    val want = try spark.sql(sql).collect().map(_.toString).toSeq
    finally spark.conf.unset(flag)
    assert(got === want && got.forall(_ => true))
    assert(got.nonEmpty)
  }
}
