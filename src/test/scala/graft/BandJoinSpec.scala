package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RewriteBandJoin: the naive `abs(l.c - r.c) <= w` inner join — a nested
  * loop in stock Spark — must become a binned equi-join with identical
  * results (duplicates included), for any longs, negatives and NULLs
  * included. Parity oracle: the SAME query with the rule kill-switched.
  */
class BandJoinSpec extends SparkSpecBase {

  private def withRule[T](on: Boolean)(f: => T): T = {
    val key = "spark.graft.bandJoin.enabled"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, on.toString)
    try f
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("pure band join rewrites to an equi-join; kill switch restores the nested loop") {
    val s = spark
    import s.implicits._
    val a = (-40L to 40L by 3).toDF("va")
    val b = (-35L to 50L by 7).toDF("vb")
    val q = a.join(b, abs(col("va") - col("vb")) <= 5L)
    withRule(true) {
      val p = planOf(q)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"rule did not fire:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
        p.contains("BroadcastHashJoin"), p)
      assert(p.contains("Generate"), "no bin explode in plan\n" + p)
    }
    withRule(false) {
      val p = planOf(a.join(b, abs(col("va") - col("vb")) <= 5L))
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct"),
        s"kill switch ignored:\n$p")
    }
  }

  test("result parity vs the kill-switched plan: seeded random longs, negatives, several widths") {
    val s = spark
    import s.implicits._
    var x = 20260813L
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
    // values clustered so bands actually match, including exact-boundary
    // diffs and duplicate values on both sides
    val as = Seq.fill(300)(math.floorMod(next(), 2000L) - 1000L)
    val bs = Seq.fill(300)(math.floorMod(next(), 2000L) - 1000L)
    for (w <- Seq(1L, 7L, 100L)) {
      val q = as.toDF("va").join(bs.toDF("vb"), abs(col("va") - col("vb")) <= w)
      val got = withRule(true)(sortedRows(q))
      val want = withRule(false)(sortedRows(
        as.toDF("va").join(bs.toDF("vb"), abs(col("va") - col("vb")) <= w)))
      assert(got == want, s"w=$w: ${got.size} vs ${want.size} rows")
      assert(want.nonEmpty, s"w=$w parity vacuous")
    }
  }

  test("strict <, NULL band values, and a non-equi residual conjunct") {
    val s = spark
    import s.implicits._
    val a = Seq[(java.lang.Long, Long)]((1L, 10L), (5L, 20L), (null, 30L), (9L, 40L))
      .toDF("va", "pa")
    val b = Seq[(java.lang.Long, Long)]((2L, 1L), (null, 2L), (8L, 3L))
      .toDF("vb", "pb")
    val cond = abs(col("va") - col("vb")) < 4L && col("pa") > col("pb")
    val q = a.join(b, cond)
    val got = withRule(true)(sortedRows(q))
    val want = withRule(false)(sortedRows(a.join(b, cond)))
    assert(got == want && want.nonEmpty)
    // NULL never matches
    assert(!got.exists(_.contains("null")))
    withRule(true) {
      val p = planOf(a.join(b, cond))
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
    }
  }

  test("BETWEEN form, asymmetric and shifted windows: plan + parity") {
    val s = spark
    import s.implicits._
    var x = 777L
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
    val as = Seq.fill(250)(math.floorMod(next(), 1000L) - 500L)
    val bs = Seq.fill(250)(math.floorMod(next(), 1000L) - 500L)
    val a = as.toDF("va"); val b = bs.toDF("vb")
    val conds = Seq(
      // BETWEEN expands to the two offset conjuncts
      col("vb") >= col("va") - 10L && col("vb") <= col("va") + 25L, // asymmetric
      col("va") - col("vb") >= 30L && col("va") - col("vb") <= 80L, // shifted band
      col("vb") > col("va") - 7L && col("vb") < col("va") + 7L)     // strict both ends
    for ((cond, i) <- conds.zipWithIndex) {
      val q = a.join(b, cond)
      withRule(true) {
        val p = planOf(a.join(b, cond))
        assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
          s"case $i did not rewrite:\n$p")
      }
      val got = withRule(true)(sortedRows(q))
      val want = withRule(false)(sortedRows(a.join(b, cond)))
      assert(got == want, s"case $i: ${got.size} vs ${want.size}")
      assert(want.nonEmpty, s"case $i vacuous")
    }
    // SQL BETWEEN spelling end-to-end
    a.createOrReplaceTempView("bj_a"); b.createOrReplaceTempView("bj_b")
    val sql = "SELECT * FROM bj_a JOIN bj_b ON vb BETWEEN va - 3 AND va + 3"
    val got = withRule(true) {
      assert(!planOf(s.sql(sql)).contains("BroadcastNestedLoopJoin"))
      sortedRows(s.sql(sql))
    }
    assert(got == withRule(false)(sortedRows(s.sql(sql))) && got.nonEmpty)
  }

  test("one-sided inequality alone does not fire (no band to bin)") {
    val s = spark
    import s.implicits._
    val a = Seq(1L, 5L).toDF("va"); val b = Seq(2L, 9L).toDF("vb")
    val q = a.join(b, col("va") < col("vb"))
    withRule(true) {
      val p = planOf(q)
      assert(!p.contains("Generate"), s"rule fired on a half-open range:\n$p")
    }
    assert(sortedRows(q).size == 3)
  }

  test("does not fire when an equi conjunct exists (hash join already available)") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, 10L), (2L, 20L)).toDF("k", "va")
    val b = Seq((1L, 12L), (2L, 99L)).toDF("k2", "vb")
    val q = a.join(b, col("k") === col("k2") && abs(col("va") - col("vb")) <= 5L)
    withRule(true) {
      val p = planOf(q)
      assert(!p.contains("Generate"), s"rule fired needlessly:\n$p")
    }
    assert(sortedRows(q).size == 1)
  }

  test("SQL face: band join written in plain SQL gets the binned plan") {
    val s = spark
    s.range(0, 500).selectExpr("id * 3 AS va").createOrReplaceTempView("band_a")
    s.range(0, 500).selectExpr("id * 5 AS vb").createOrReplaceTempView("band_b")
    val q = s.sql("SELECT va, vb FROM band_a JOIN band_b ON abs(va - vb) <= 2")
    withRule(true) {
      assert(!planOf(q).contains("BroadcastNestedLoopJoin"), planOf(q))
      val got = sortedRows(q)
      val want = withRule(false)(sortedRows(
        s.sql("SELECT va, vb FROM band_a JOIN band_b ON abs(va - vb) <= 2")))
      assert(got == want && got.nonEmpty)
    }
  }
}
