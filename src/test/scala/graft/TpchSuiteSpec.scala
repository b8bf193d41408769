package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Semantic edge cases for the TpchSuite decorrelations that the fixture
  * oracle can't isolate: the per-order aggregate in q21 must be exactly
  * equivalent to the EXISTS + NOT EXISTS self-join form on every order
  * topology, and q2's min-join must keep ties.
  */
class TpchSuiteSpec extends SparkSpecBase {

  test("q21 decorrelation == EXISTS/NOT EXISTS on every order topology") {
    import spark.implicits._
    // Crafted orders covering every shape the predicate distinguishes:
    //  o1: single-supplier order, R line        -> excluded (no other supplier)
    //  o2: two suppliers, only s1 has R         -> s1 counted
    //  o3: two suppliers, both have R           -> excluded (another R supplier)
    //  o4: two suppliers, s2's R twice          -> s2 counted twice (two probe rows)
    //  o5: s1 has R line + non-R line, s2 clean -> s1 counted once (one R probe row)
    val lines = Seq(
      (1L, 10L, "R"),
      (2L, 10L, "R"), (2L, 20L, "N"),
      (3L, 10L, "R"), (3L, 20L, "R"),
      (4L, 10L, "N"), (4L, 20L, "R"), (4L, 20L, "R"),
      (5L, 10L, "R"), (5L, 10L, "N"), (5L, 20L, "N")
    ).toDF("l_orderkey", "l_suppkey", "l_returnflag")
    lines.createOrReplaceTempView("t_q21_lines")

    // Reference semantics: literal EXISTS / NOT EXISTS self-joins.
    val expected = spark.sql(
      """SELECT l_suppkey, count(*) AS numwait FROM t_q21_lines l1
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM t_q21_lines l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM t_q21_lines l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin).collect()

    // TpchSuite's decorrelated form (same aggregate construction as
    // q21_waiting_suppliers, minus the orders/supplier enrichment).
    val perOrder = lines.groupBy(col("l_orderkey").as("po_ok"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
          .as("n_rsupp"))
    val actual = lines.where(col("l_returnflag") === "R")
      .join(perOrder, col("l_orderkey") === col("po_ok"))
      .where(col("n_supp") > 1 && col("n_rsupp") === 1)
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("numwait"))
      .orderBy("l_suppkey")
      .collect()

    assert(actual.toSeq == expected.toSeq,
      s"decorrelation diverges:\nexpected ${expected.mkString(",")}\nactual   ${actual.mkString(",")}")
    // And pin the topology outcomes explicitly:
    assert(actual.toSeq == Seq(Row(10L, 2L), Row(20L, 2L)),
      s"unexpected outcome: ${actual.mkString(",")}")
  }

  test("q2 min-price join keeps ties (both tying suppliers survive)") {
    import spark.implicits._
    val ship = Seq(
      (100L, "s1", 5.0), (100L, "s2", 5.0), (100L, "s3", 7.0),
      (200L, "s1", 3.0)
    ).toDF("p_partkey", "s_name", "l_extendedprice")
    val minPrice = ship.groupBy(col("p_partkey").as("mp_partkey"))
      .agg(min("l_extendedprice").as("mp_min"))
    val kept = ship.join(minPrice,
      col("p_partkey") === col("mp_partkey") &&
        col("l_extendedprice") === col("mp_min"))
      .select("p_partkey", "s_name").orderBy("p_partkey", "s_name").collect()
    assert(kept.toSeq == Seq(Row(100L, "s1"), Row(100L, "s2"), Row(200L, "s1")),
      s"tie handling broke: ${kept.mkString(",")}")
  }
}
