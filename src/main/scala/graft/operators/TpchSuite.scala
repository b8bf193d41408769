package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, TimestampType}

import graft.Tables._

/** TPC-H completion pack: the 13 query shapes not already covered by
  * [[Relational]] (which has Q1/Q3/Q5/Q6/Q7/Q10/Q12/Q14/Q18), adapted to the
  * driver's slimmed fixture schema — there is no `partsupp` table and no
  * `l_commitdate`/`l_receiptdate`/`l_shipmode`/`c_phone`/`p_container`
  * columns, so each query keeps its *defining plan shape* (correlated
  * scalar subquery, EXISTS/NOT EXISTS self-join, disjunctive join
  * predicate, double aggregation, …) with an equivalent predicate over the
  * columns that do exist. The reference only analyzes aggregation at scale
  * (reference: spark-groupby-analysis.md:6-123); these queries exercise that
  * roadmap through declarative plans Catalyst can optimize.
  *
  * Oracle-parity rules are identical to [[Relational]]: exact DECIMAL money
  * math summed before one final cast to DOUBLE, integer-valued doubles
  * summed directly (order-independent, exactly representable), and a total
  * ORDER BY on every query.
  *
  * Scale notes (100 TB): dimension sides (part/supplier/nation/region and
  * derived one-row aggregates) are explicitly `broadcast`; every correlated
  * subquery is decorrelated into a key-partitioned aggregate + equi-join
  * (no nested-loop anywhere); fact-fact joins shuffle on join keys and
  * rely on AQE for skew/coalesce.
  */
object TpchSuite {

  import Money.{dec2, dec4, one, ts}

  // Exact discounted revenue, summed before one final double cast.
  private def volume: Column =
    dec2(col("l_extendedprice")) * (one - dec4(col("l_discount")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q2 shape: correlated MIN subquery over a multi-join ("cheapest
    // source per part"). partsupp-less adaptation: shipments (lineitem)
    // stand in for supply offers; the correlated min is decorrelated into
    // a per-part aggregate joined back on (part, price).
    "q2_min_cost_ship" -> { (s, d) =>
      val ship = lineitem(s, d)
        .join(broadcast(part(s, d)
          .where(col("p_type") === "STANDARD" && col("p_size") <= 10)),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d).where(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("p_partkey"), col("p_name"), col("s_name"),
          col("s_acctbal"), col("n_name"), col("l_extendedprice"))
      val minPrice = ship.groupBy(col("p_partkey").as("mp_partkey"))
        .agg(min("l_extendedprice").as("mp_min"))
      ship.join(minPrice,
        col("p_partkey") === col("mp_partkey") &&
          col("l_extendedprice") === col("mp_min"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_name"),
          col("l_extendedprice").as("min_price"))
        // the LIMIT boundary is deterministic: p_name (the one output
        // column not in the sort) is functionally dependent on p_partkey,
        // so rows tying on all five sort keys are fully identical
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"), col("min_price"))
        .limit(100)
    },

    // Q4 shape: EXISTS semi-join feeding a priority histogram. The
    // commit<receipt lateness predicate is replaced by "has a returned
    // line" (no commit/receipt dates in the fixture).
    "q4_order_priority" -> { (s, d) =>
      orders(s, d)
        .where(col("o_orderdate") >= ts("1997-01-01 00:00:00") &&
          col("o_orderdate") < ts("1997-04-01 00:00:00"))
        .join(lineitem(s, d).where(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // Q8 shape: national market share — nation joined on BOTH sides
    // (customer market region, supplier nation), conditional share of a
    // decimal-exact volume sum, one double division per group.
    "q8_market_share" -> { (s, d) =>
      val n1 = nation(s, d).select(col("n_nationkey").as("c_nk"),
        col("n_regionkey").as("c_rk"))
      val n2 = nation(s, d).select(col("n_nationkey").as("s_nk"),
        col("n_name").as("supp_nation"))
      part(s, d).where(col("p_type") === "ECONOMY")
        .join(lineitem(s, d), col("p_partkey") === col("l_partkey"))
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .where(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
          col("o_orderdate") < ts("1998-01-01 00:00:00"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
        .join(broadcast(region(s, d).where(col("r_name") === "ASIA")),
          col("c_rk") === col("r_regionkey"))
        .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_3", volume)
          .otherwise(lit(0).cast(DecimalType(2, 0)))).cast("double") /
          sum(volume).cast("double")).as("mkt_share"))
        .orderBy("o_year")
    },

    // Q9 shape: profit by supplier nation and order year over a LIKE-
    // filtered part join. Without ps_supplycost the profit term is the
    // discounted revenue (the join/agg shape is unchanged).
    "q9_product_profit" -> { (s, d) =>
      lineitem(s, d)
        .join(broadcast(part(s, d).where(col("p_name").like("%blue%"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(round(sum(volume), 2).cast("double").as("profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // Q11 shape: per-key value sum with a HAVING against a scalar subquery
    // of the same aggregate. The fixed TPC-H fraction is replaced by a
    // scale-invariant threshold (2x the average per-part value) so the
    // query is non-degenerate at every SF. SQL entry point, mirroring
    // q_supplier_share's scalar-subquery HAVING.
    "q11_part_value" -> { (s, d) =>
      lineitem(s, d)
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d).where(col("r_name") === "AFRICA")),
          col("n_regionkey") === col("r_regionkey"))
        .createOrReplaceTempView("g_q11_africa_lines")
      s.sql(
        """SELECT l_partkey,
          |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS part_value
          |FROM g_q11_africa_lines
          |GROUP BY l_partkey
          |HAVING CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) >
          |  (SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) * 2.0
          |     / count(DISTINCT l_partkey)
          |   FROM g_q11_africa_lines)
          |ORDER BY part_value DESC, l_partkey""".stripMargin)
    },

    // Q13 shape: LEFT OUTER join with an ON-clause filter, then a
    // two-level aggregation (orders per customer -> customers per count).
    "q13_cust_distribution" -> { (s, d) =>
      customer(s, d).select("c_custkey")
        .join(orders(s, d).where(col("o_orderstatus") =!= "P")
          .select("o_custkey", "o_orderkey"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // Q15 shape: revenue "view" + scalar MAX subquery selecting the top
    // supplier(s). The one-row max is broadcast, not collected.
    "q15_top_supplier" -> { (s, d) =>
      val rev = lineitem(s, d)
        .where(col("l_shipdate") >= ts("1997-01-01 00:00:00") &&
          col("l_shipdate") < ts("1997-04-01 00:00:00"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(round(sum(volume), 2).cast("double").as("total_revenue"))
      supplier(s, d)
        .join(rev, col("s_suppkey") === col("supplier_no"))
        .join(broadcast(rev.agg(max("total_revenue").as("mx"))),
          col("total_revenue") === col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    },

    // Q16 shape: supplier count per part attribute triple, with a NOT IN
    // subquery exclusion (anti join; the comment-LIKE exclusion becomes a
    // negative-balance exclusion).
    "q16_supplier_cnt" -> { (s, d) =>
      lineitem(s, d)
        .join(broadcast(part(s, d).where(col("p_brand") =!= "Brand#1" &&
          col("p_type") =!= "MEDIUM" &&
          col("p_size").isin(1, 4, 9, 16, 25, 36, 49))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(supplier(s, d).where(col("s_acctbal") < 0)
          .select(col("s_suppkey").as("bad_sk"))),
          col("l_suppkey") === col("bad_sk"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("l_suppkey").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },

    // Q17 shape: correlated AVG subquery (per-part quantity threshold),
    // decorrelated into a per-part aggregate + equi-join. Quantities are
    // integer-valued doubles, so sum/avg are exact in any order.
    "q17_small_qty_revenue" -> { (s, d) =>
      val avgQty = lineitem(s, d)
        .groupBy(col("l_partkey").as("aq_pk"))
        .agg(avg("l_quantity").as("avg_qty"))
      lineitem(s, d)
        .join(broadcast(part(s, d)
          .where(col("p_brand") === "Brand#11" && col("p_type") === "SMALL")),
          col("l_partkey") === col("p_partkey"))
        .join(avgQty, col("l_partkey") === col("aq_pk"))
        .where(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((sum(dec2(col("l_extendedprice"))).cast("double") / lit(7.0))
          .as("avg_yearly"))
    },

    // Q19 shape: disjunction of (brand, size, quantity) conjunct bands on
    // top of the part equi-join — Catalyst keeps the equi-join and pushes
    // the OR as a post-join filter (no nested loop).
    "q19_disjunctive_revenue" -> { (s, d) =>
      lineitem(s, d)
        .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
        .where(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#16" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#11" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(round(sum(volume), 2).cast("double").as("revenue"))
    },

    // Q20 shape: nested IN subqueries (suppliers who shipped enough of a
    // LIKE-filtered part), expressed as HAVING aggregate -> semi join.
    // availqty-less adaptation: the 0.5*availqty threshold becomes a fixed
    // shipped-quantity threshold per (supplier, part).
    "q20_part_promotion" -> { (s, d) =>
      val qualified = lineitem(s, d)
        .where(col("l_shipdate") >= ts("1997-01-01 00:00:00") &&
          col("l_shipdate") < ts("1998-01-01 00:00:00"))
        .join(broadcast(part(s, d).where(col("p_name").like("small%"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(sum("l_quantity").as("shipped_qty"))
        .where(col("shipped_qty") > 45)
        .select("l_suppkey")
      supplier(s, d)
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d).where(col("r_name") === "AFRICA")),
          col("n_regionkey") === col("r_regionkey"))
        .join(qualified, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    },

    // Q21 shape: EXISTS + NOT EXISTS self-joins on lineitem ("the only
    // supplier at fault in a multi-supplier order"). Decorrelated into one
    // per-order aggregate: EXISTS(other supplier) <=> distinct suppliers
    // > 1, NOT EXISTS(other R supplier) <=> distinct R-suppliers == 1
    // (the probe row itself is R, so it is always in that set). The
    // lateness predicate (receipt > commit) becomes l_returnflag = 'R'.
    "q21_waiting_suppliers" -> { (s, d) =>
      val perOrder = lineitem(s, d)
        .groupBy(col("l_orderkey").as("po_ok"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
            .as("n_rsupp"))
      lineitem(s, d).where(col("l_returnflag") === "R")
        .join(orders(s, d).where(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .join(perOrder, col("l_orderkey") === col("po_ok"))
        .where(col("n_supp") > 1 && col("n_rsupp") === 1)
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    },

    // Q22 shape: substring-derived country code, acctbal above the
    // positive-balance average (scalar subquery, broadcast one-row cross
    // join), NOT EXISTS recent orders (anti join). c_phone-less
    // adaptation: the code is the last two digits of c_name.
    "q22_global_sales" -> { (s, d) =>
      val codes = Seq("13", "31", "23", "29", "30", "18", "17")
      val cust = customer(s, d)
        .withColumn("cntrycode", substring(col("c_name"), 17, 2))
        .where(col("cntrycode").isin(codes: _*))
      val avgBal = cust.where(col("c_acctbal") > 0.00)
        .agg((sum(dec2(col("c_acctbal"))).cast("double") / count(lit(1)))
          .as("avg_bal"))
      cust.crossJoin(broadcast(avgBal))
        .where(col("c_acctbal") > col("avg_bal"))
        .join(orders(s, d).where(col("o_orderdate") >= ts("1999-01-01 00:00:00"))
          .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(count(lit(1)).as("numcust"),
          round(sum(dec2(col("c_acctbal"))), 2).cast("double").as("totacctbal"))
        .orderBy("cntrycode")
    })

  /** DuckDB equivalents. EXISTS/IN/correlated forms are kept in their
    * natural SQL shape — the engines must agree on VALUES, not plans.
    */
  val oracles: Map[String, String] = Map(

    "q2_min_cost_ship" ->
      """WITH ship AS (
        |  SELECT p_partkey, p_name, s_name, s_acctbal, n_name, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |    JOIN supplier ON l_suppkey = s_suppkey
        |    JOIN nation ON s_nationkey = n_nationkey
        |    JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE' AND p_type = 'STANDARD' AND p_size <= 10)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
        |       l_extendedprice AS min_price
        |FROM ship s1
        |WHERE l_extendedprice =
        |  (SELECT min(l_extendedprice) FROM ship s2 WHERE s2.p_partkey = s1.p_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, min_price
        |LIMIT 100""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q8_market_share" ->
      """SELECT o_year,
        |  CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume
        |                ELSE CAST(0 AS DECIMAL(2,0)) END) AS DOUBLE)
        |  / CAST(sum(volume) AS DOUBLE) AS mkt_share
        |FROM (
        |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |         CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           (CAST(1 AS DECIMAL(2,0)) - CAST(l_discount AS DECIMAL(6,4))) AS volume,
        |         n2.n_name AS nation
        |  FROM part JOIN lineitem ON p_partkey = l_partkey
        |    JOIN supplier ON s_suppkey = l_suppkey
        |    JOIN orders ON l_orderkey = o_orderkey
        |    JOIN customer ON o_custkey = c_custkey
        |    JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |    JOIN region ON n1.n_regionkey = r_regionkey
        |    JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00') all_nations
        |GROUP BY o_year ORDER BY o_year""".stripMargin,

    "q9_product_profit" ->
      """SELECT nation, o_year, CAST(round(sum(volume), 2) AS DOUBLE) AS profit
        |FROM (SELECT n_name AS nation,
        |             CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |             CAST(l_extendedprice AS DECIMAL(12,2)) *
        |               (CAST(1 AS DECIMAL(2,0)) - CAST(l_discount AS DECIMAL(6,4))) AS volume
        |      FROM lineitem JOIN part ON p_partkey = l_partkey
        |        JOIN supplier ON s_suppkey = l_suppkey
        |        JOIN orders ON o_orderkey = l_orderkey
        |        JOIN nation ON s_nationkey = n_nationkey
        |      WHERE p_name LIKE '%blue%') profit
        |GROUP BY nation, o_year ORDER BY nation, o_year DESC""".stripMargin,

    "q11_part_value" ->
      """SELECT l_partkey,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS part_value
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'AFRICA'
        |GROUP BY l_partkey
        |HAVING CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) >
        |  (SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) * 2.0
        |     / count(DISTINCT l_partkey)
        |   FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |     JOIN nation ON s_nationkey = n_nationkey
        |     JOIN region ON n_regionkey = r_regionkey
        |   WHERE r_name = 'AFRICA')
        |ORDER BY part_value DESC, l_partkey""".stripMargin,

    "q13_cust_distribution" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT OUTER JOIN orders
        |        ON c_custkey = o_custkey AND o_orderstatus <> 'P'
        |      GROUP BY c_custkey) c_orders
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q15_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |      (CAST(1 AS DECIMAL(2,0)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE)
        |      AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,

    "q16_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'MEDIUM'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q17_small_qty_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
        |  AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#11' AND p_type = 'SMALL'
        |  AND l_quantity < (SELECT CAST(0.2 AS DOUBLE) * avg(l_quantity)
        |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin,

    "q19_disjunctive_revenue" ->
      """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |  (CAST(1 AS DECIMAL(2,0)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE)
        |  AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#16' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q20_part_promotion" ->
      """SELECT s_suppkey, s_name, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'AFRICA' AND s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'small%'
        |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING sum(l_quantity) > 45)
        |ORDER BY s_suppkey""".stripMargin,

    "q21_waiting_suppliers" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |  JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,

    "q22_global_sales" ->
      """SELECT cntrycode, count(*) AS numcust,
        |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS totacctbal
        |FROM (SELECT substring(c_name, 17, 2) AS cntrycode, c_acctbal
        |      FROM customer
        |      WHERE substring(c_name, 17, 2) IN ('13','31','23','29','30','18','17')
        |        AND c_acctbal >
        |          (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)
        |           FROM customer
        |           WHERE c_acctbal > 0.00
        |             AND substring(c_name, 17, 2) IN ('13','31','23','29','30','18','17'))
        |        AND NOT EXISTS (SELECT 1 FROM orders
        |                        WHERE o_custkey = c_custkey
        |                          AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |     ) custsale
        |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin)
}
