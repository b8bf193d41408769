package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, TimestampType}

import graft.Tables._

/** Relational / TPC-H-style query pack over the driver fixtures.
  *
  * The reference only *analyzes* aggregation at scale
  * (reference: spark-groupby-analysis.md:6-123); every capability it describes
  * (two-phase hash agg, AQE coalesce/skew, spill, vectorized scan, CBO) is
  * stock Spark, so these queries demonstrate the roadmap through plain
  * declarative DataFrame code and let Catalyst/Tungsten pick the physical
  * plan (SURVEY.md §2.4, §4.2).
  *
  * Oracle-parity rules used throughout (see also Verify/driver contract):
  *   - Money math is done in DECIMAL (exact, associative — immune to
  *     distributed summation order), then cast to DOUBLE at the very end.
  *     Both Spark and DuckDB produce bit-identical doubles this way; no
  *     rounding tolerance needed.
  *   - Integer sums are cast to BIGINT in DuckDB (its SUM(int) is HUGEINT).
  *   - Every query ends in a total ORDER BY over a unique key tuple so row
  *     order matches no matter how the driver hashes.
  *
  * Scale notes (100 TB): every query is a declarative plan — scans get
  * vectorized parquet + pushdown + pruning; aggregations are partial/final
  * two-phase; nation/region joins are explicitly broadcast (bounded size);
  * fact-fact joins shuffle on their keys and rely on AQE for skew/coalesce.
  */
object Relational {

  // Decimal-precision discipline lives in Money (one copy — see its
  // scaladoc for the overflow/rounding derivation).
  import Money.{dec2, dec4, one, ts}

  /** Synthetic insert rows for q_upsert_merge (negative keys cannot
    * collide with fixture orders; mirrored verbatim in the oracle VALUES).
    */
  private def spark_range_inserts(s: SparkSession): DataFrame = {
    import s.implicits._
    (1 to 5).map(i => (-i.toLong, "Z-SYNTH", 100.0 * i))
      .toDF("o_orderkey", "u_priority", "u_price")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: two-phase hash aggregate, 4 groups, heavy input.
    "q1_pricing_summary" -> { (s, d) =>
      lineitem(s, d)
        .where(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          round(sum(dec2(col("l_extendedprice")) * (one - dec4(col("l_discount")))), 2)
            .cast("double").as("sum_disc_price"),
          round(sum(dec2(col("l_extendedprice")) * (one - dec4(col("l_discount")))
            * (one + dec4(col("l_tax")))), 2).cast("double").as("sum_charge"),
          (sum(dec2(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(dec2(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
          (sum(dec4(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // TPC-H Q3 shape: 3-way join, agg, top-10. Customer filter lets AQE pick
    // the join strategy; ties broken by l_orderkey for determinism.
    "q3_shipping_priority" -> { (s, d) =>
      customer(s, d).where(col("c_mktsegment") === "BUILDING")
        .join(orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .where(col("o_orderdate") < ts("1998-03-15 00:00:00") &&
          col("l_shipdate") > ts("1998-03-15 00:00:00"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(round(sum(dec2(col("l_extendedprice")) * (one - dec4(col("l_discount")))), 2)
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // TPC-H Q5 shape: 6-way join; region/nation broadcast (bounded dims).
    "q5_revenue_by_nation" -> { (s, d) =>
      region(s, d).where(col("r_name") === "ASIA")
        .join(broadcast(nation(s, d)), col("r_regionkey") === col("n_regionkey"))
        .join(customer(s, d), col("n_nationkey") === col("c_nationkey"))
        .join(orders(s, d), col("c_custkey") === col("o_custkey"))
        .where(col("o_orderdate") >= ts("1997-01-01 00:00:00") &&
          col("o_orderdate") < ts("1999-01-01 00:00:00"))
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(supplier(s, d)),
          col("l_suppkey") === col("s_suppkey") &&
            col("s_nationkey") === col("c_nationkey"))
        .groupBy("n_name")
        .agg(round(sum(dec2(col("l_extendedprice")) * (one - dec4(col("l_discount")))), 2)
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // TPC-H Q6 shape: scan-heavy scalar aggregate; all predicates push to parquet.
    "q6_forecast_revenue" -> { (s, d) =>
      lineitem(s, d)
        .where(col("l_shipdate") >= ts("1997-01-01 00:00:00") &&
          col("l_shipdate") < ts("1998-01-01 00:00:00") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(round(sum(dec2(col("l_extendedprice")) * dec4(col("l_discount"))), 2)
          .cast("double").as("revenue"))
    },

    // TPC-H Q10 shape: returned items ranked by lost revenue.
    "q10_returned_items" -> { (s, d) =>
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(lineitem(s, d).where(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(round(sum(dec2(col("l_extendedprice")) * (one - dec4(col("l_discount")))), 2)
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // TPC-H Q12 shape: join + conditional aggregation (no l_shipmode in the
    // fixture; o_orderpriority carries the urgent/normal split).
    "q12_priority_lines" -> { (s, d) =>
      orders(s, d)
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .where(col("l_shipdate") >= ts("1997-01-01 00:00:00") &&
          col("l_shipdate") < ts("1998-01-01 00:00:00"))
        .groupBy("o_orderpriority")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("high_line_count"),
          count(lit(1)).as("line_count"))
        .orderBy("o_orderpriority")
    },

    // Window: dense top-3 customers per market segment by balance.
    "q_topk_per_segment" -> { (s, d) =>
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      customer(s, d)
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          rank().over(w).as("rnk"))
        .where(col("rnk") <= 3)
        .orderBy("c_mktsegment", "rnk", "c_custkey")
    },

    // Window: per-supplier running quantity. The fixture lineitem key
    // (l_orderkey, l_linenumber) is NOT unique, so the window order includes
    // the measure columns too: rows that still tie are fully interchangeable,
    // making the output multiset deterministic; the final sort includes
    // running_qty to put interchangeable rows in a canonical order.
    "q_running_sum" -> { (s, d) =>
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      lineitem(s, d)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(dec2(col("l_quantity"))).over(w).cast("double").as("running_qty"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("running_qty"))
    },

    // Set ops — distinct union / intersect / except of customer key sets.
    "q_union_custkeys" -> { (s, d) =>
      customer(s, d).where(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
        .union(orders(s, d).where(col("o_totalprice") > 400000.0)
          .select(col("o_custkey").as("custkey")))
        .distinct()
        .orderBy("custkey")
    },
    "q_intersect_custkeys" -> { (s, d) =>
      customer(s, d).where(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
        .intersect(orders(s, d).where(col("o_totalprice") > 400000.0)
          .select(col("o_custkey").as("custkey")))
        .orderBy("custkey")
    },
    "q_except_custkeys" -> { (s, d) =>
      customer(s, d).where(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
        .except(orders(s, d).where(col("o_totalprice") > 400000.0)
          .select(col("o_custkey").as("custkey")))
        .orderBy("custkey")
    },

    // Multi-level aggregates: ROLLUP and CUBE (NULL-filled subtotal rows).
    "q_rollup" -> { (s, d) =>
      lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("l_quantity"))).cast("double").as("qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },
    "q_cube" -> { (s, d) =>
      orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("o_totalprice"))).cast("double").as("total"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
    },

    // Semi / anti joins (EXISTS / NOT EXISTS).
    "q_semi_join" -> { (s, d) =>
      customer(s, d)
        .join(orders(s, d).where(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    // Anti-joined against a date-sliced orders side so the result is
    // non-empty at every fixture SF (every customer has SOME order, so the
    // unrestricted anti join was a vacuous 0-row pass).
    "q_anti_join" -> { (s, d) =>
      customer(s, d)
        .join(orders(s, d).where(col("o_orderdate") < ts("1996-01-01 00:00:00")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // FULL OUTER join: every order with its customer AND every orderless
    // customer (the fixture has no customer-less orders, but the plan shape
    // is the full-outer SortMergeJoin). NULLS FIRST pinned on both engines.
    "q_outer_join" -> { (s, d) =>
      customer(s, d).select("c_custkey", "c_name")
        .join(orders(s, d).select("o_custkey", "o_orderkey", "o_totalprice"),
          col("c_custkey") === col("o_custkey"), "full_outer")
        .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_name"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(asc_nulls_first("custkey"), asc_nulls_first("o_orderkey"))
    },

    // Multiset set ops: INTERSECT ALL / EXCEPT ALL keep duplicate
    // multiplicity (min / difference of per-key counts).
    "q_intersect_all" -> { (s, d) =>
      lineitem(s, d).where(col("l_quantity") > 25).select(col("l_partkey"))
        .intersectAll(
          lineitem(s, d).where(col("l_returnflag") === "R").select(col("l_partkey")))
        .orderBy("l_partkey")
    },
    "q_except_all" -> { (s, d) =>
      lineitem(s, d).where(col("l_quantity") > 25).select(col("l_partkey"))
        .exceptAll(
          lineitem(s, d).where(col("l_returnflag") === "R").select(col("l_partkey")))
        .orderBy("l_partkey")
    },

    // Window battery 2: value-position functions + distribution functions
    // (percent_rank/cume_dist are int-ratio doubles — bit-exact both
    // engines; o_orderkey is unique within the partition order).
    "q_window_funcs2" -> { (s, d) =>
      val w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
      orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"),
          first_value(col("o_orderkey")).over(w).as("first_key"),
          last_value(col("o_orderkey")).over(w).as("last_key"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_key"),
          lead(col("o_orderkey"), 1, -1L).over(w).as("next_key"),
          lag(col("o_orderkey"), 2).over(w).as("prev2_key"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("o_orderkey")
    },

    // NULL-handling battery: coalesce / nullif / ifnull over planted nulls.
    "q_null_funcs" -> { (s, d) =>
      orders(s, d)
        .select(col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("O")).as("status_or_null"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_filled"),
          when(col("o_totalprice") > 300000.0, col("o_totalprice")).as("big_or_null"),
          expr("ifnull(CASE WHEN o_totalprice > 300000.0 THEN o_totalprice END, 0.0)")
            .as("big_or_zero"))
        .orderBy("o_orderkey")
    },

    // Conditional aggregates: count_if / bool_or / bool_and / FILTER'd sum.
    "q_cond_aggs" -> { (s, d) =>
      orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          expr("count_if(o_totalprice > 200000.0)").as("n_big"),
          expr("bool_or(o_orderstatus = 'F')").as("any_f"),
          expr("bool_and(o_totalprice > 0)").as("all_pos"),
          expr("CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE)")
            .as("open_total"))
        .orderBy("o_orderpriority")
    },

    // Batch upsert (MERGE semantics without a table format): base ⟕⟖
    // updates on the key, update wins per column, inserts flow through.
    // The 100 TB shape: one co-partitioned full-outer join on the key —
    // with both sides bucketed on o_orderkey (src_bucketed_join) it is
    // exchange-free. Updates = +10% price on every 10th order; inserts =
    // 5 synthetic orders with negative keys. Verified via a per-priority
    // rollup (count + exact decimal sum) over the merged result.
    "q_upsert_merge" -> { (s, d) =>
      // the +10% uplift runs in EXACT decimal arithmetic — double * 1.1
      // lands on 3-decimal half-way points whose 2-dp rounding tie-breaks
      // differently across engines (shortest-repr HALF_UP vs binary)
      val base = orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("o_price"))
      val updates = base.where(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"),
          col("o_orderpriority").as("u_priority"),
          expr("CAST(o_price * CAST(1.1 AS DECIMAL(3,1)) AS DECIMAL(25,3))").as("u_price"))
        .unionByName(spark_range_inserts(s)
          .select(col("o_orderkey"), col("u_priority"),
            col("u_price").cast(DecimalType(25, 3))))
      base.join(updates, Seq("o_orderkey"), "full_outer")
        .select(
          coalesce(col("u_priority"), col("o_orderpriority")).as("priority"),
          coalesce(col("u_price"), col("o_price").cast(DecimalType(25, 3))).as("price"))
        .groupBy("priority")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("price")).cast("double").as("total_price"))
        .orderBy("priority")
    },

    // Key-skew diagnostic: per-key share of the fact table for the top
    // keys plus the max/mean ratio — the report that decides whether a
    // join needs salting (Joins.saltedJoin) or AQE skew handling. One
    // map-side-combined count; everything downstream is key-cardinality-
    // sized.
    "q_skew_report" -> { (s, d) =>
      val counts = lineitem(s, d).groupBy("l_suppkey").agg(count(lit(1)).as("cnt"))
      val tot = counts.agg(
        sum("cnt").as("total_rows"), count(lit(1)).as("n_keys"), max("cnt").as("max_cnt"))
      counts.crossJoin(broadcast(tot))
        .withColumn("share", round(col("cnt").cast("double") / col("total_rows"), 6))
        .withColumn("skew_ratio",
          round(col("max_cnt").cast("double") / (col("total_rows").cast("double") / col("n_keys").cast("double")), 6))
        .orderBy(desc("cnt"), asc("l_suppkey"))
        .limit(10)
        .select("l_suppkey", "cnt", "share", "skew_ratio")
    },

    // Exact distinct aggregation (expand + two-phase under the hood).
    "q_distinct_counts" -> { (s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    },

    // Date functions + aggregation by calendar month.
    "q_date_agg" -> { (s, d) =>
      orders(s, d)
        .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n_orders"),
          sum(dec2(col("o_totalprice"))).cast("double").as("total"))
        .orderBy("yr", "mo")
    },

    // String function battery over part.
    "q_string_funcs" -> { (s, d) =>
      part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        length(col("p_name")).as("name_len"),
        substring(col("p_type"), 1, 4).as("type_pfx"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        split(col("p_name"), " ").getItem(0).as("first_word"))
        .orderBy("p_partkey")
    },

    // String battery 2: replace/translate/pad/repeat/position functions.
    "q_string_funcs2" -> { (s, d) =>
      part(s, d).select(
        col("p_partkey"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        translate(col("p_brand"), "#", "-").as("brand_dash"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("key_padded"),
        rpad(col("p_type"), 30, ".").as("type_padded"),
        repeat(col("p_brand"), 2).as("brand_twice"),
        expr("right(p_name, 5)").as("name_tail"),
        instr(col("p_name"), "o").as("first_o"),
        ascii(col("p_type")).as("type_ascii0"))
        .orderBy("p_partkey")
    },

    // Datetime battery 2: calendar arithmetic beyond q_datetime_funcs.
    "q_datetime_funcs2" -> { (s, d) =>
      orders(s, d).select(
        col("o_orderkey"),
        last_day(col("o_orderdate")).cast("string").as("month_end"),
        dayofyear(col("o_orderdate")).as("doy"),
        date_add(col("o_orderdate").cast("date"), 45).cast("string").as("plus45"),
        date_sub(col("o_orderdate").cast("date"), 45).cast("string").as("minus45"),
        trunc(col("o_orderdate").cast("date"), "year").cast("string").as("year_start"),
        make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1))
          .cast("string").as("month_start"))
        .orderBy("o_orderkey")
    },

    // String battery 3: edit distance, field splitting, predicates.
    "q_string_funcs3" -> { (s, d) =>
      part(s, d).select(
        col("p_partkey"),
        levenshtein(col("p_brand"), lit("Brand#11")).as("brand_dist"),
        expr("split_part(p_type, ' ', 1)").as("type_first"),
        expr("split_part(p_type, ' ', -1)").as("type_last"),
        col("p_name").startsWith("blue").as("starts_blue"),
        col("p_name").contains("red").as("has_red"),
        col("p_type").endsWith("STEEL").as("ends_steel"))
        .orderBy("p_partkey")
    },

    // Reference EP2 battery: CASE WHEN / CAST / modulo (SURVEY.md §2.3,
    // reference tests/regexp-tests.rs:75-99 shape over a real table).
    "q_case_cast_modulo" -> { (s, d) =>
      events(s, d).select(
        col("event_id"),
        when(col("event_id") % 2 === 0, col("event_id").cast("string"))
          .otherwise(lit(null)).as("even_str"))
        .orderBy("event_id")
    },

    // TPC-H Q7 shape: trade volume between two nations by year, with the
    // nation dim joined twice (supplier side + customer side, both
    // broadcast) over the fact join.
    "q7_nation_trade" -> { (s, d) =>
      val n1 = nation(s, d).select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = nation(s, d).select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .where((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_8") ||
          (col("supp_nation") === "NATION_8" && col("cust_nation") === "NATION_3"))
        .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
        .agg(round(sum(dec2(col("l_extendedprice")) * (one - dec4(col("l_discount")))), 2)
          .cast("double").as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // TPC-H Q14 shape: promo revenue share — conditional aggregation over a
    // part join; exact decimal sums, one double division at the end.
    "q14_promo_revenue" -> { (s, d) =>
      val disc = dec2(col("l_extendedprice")) * (one - dec4(col("l_discount")))
      lineitem(s, d)
        .where(col("l_shipdate") >= ts("1997-03-01 00:00:00") &&
          col("l_shipdate") < ts("1997-04-01 00:00:00"))
        .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0) *
          sum(when(col("p_type") === "PROMO", disc).otherwise(lit(0).cast(DecimalType(2, 0)))).cast("double") /
          sum(disc).cast("double")).as("promo_revenue_pct"))
    },

    // TPC-H Q18 shape: large orders — groupBy HAVING on the fact table,
    // then enrich with customer/order dims.
    "q18_large_orders" -> { (s, d) =>
      val big = lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(sum(dec2(col("l_quantity"))).as("sum_qty"))
        .where(col("sum_qty") > 150)
      big.join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_totalprice"), col("sum_qty").cast("double").as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(50)
    },

    // Cheapest lineitem per part (window rank-1 per key — the partsupp-less
    // Q2 analog), restricted to one p_size slice.
    "q_min_price_per_part" -> { (s, d) =>
      val w = Window.partitionBy("l_partkey")
        .orderBy(col("l_extendedprice"), col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
      lineitem(s, d)
        .join(broadcast(part(s, d).where(col("p_size") === 5)),
          col("l_partkey") === col("p_partkey"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("p_partkey"), col("p_name"), col("l_suppkey"),
          col("l_extendedprice"))
        .orderBy("p_partkey")
    },

    // Suppliers above a fixed share of total revenue (TPC-H Q11 shape:
    // aggregate HAVING against a scalar subquery of the same aggregate).
    "q_supplier_share" -> { (s, d) =>
      lineitem(s, d).createOrReplaceTempView("g_lineitem_share")
      s.sql(
        """SELECT l_suppkey,
          |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS supp_rev
          |FROM g_lineitem_share
          |GROUP BY l_suppkey
          |HAVING CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) >
          |  (SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) * 0.0055
          |   FROM g_lineitem_share)
          |ORDER BY l_suppkey""".stripMargin)
    },

    // PIVOT: order counts per priority pivoted on status (explicit value
    // list -> deterministic columns).
    "q_pivot_status" -> { (s, d) =>
      orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("o_orderpriority")
    },

    // HLL++ sketch vs exact distinct (no oracle: sketch values are
    // engine-specific — driver does a rows-only check; RelationalSpec
    // asserts <5% relative error against the exact count).
    "q_approx_distinct" -> { (s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .orderBy("l_returnflag")
    },

    // Oracled companion to q_approx_distinct: the exact column hash-matches
    // outright, and the SKETCH is oracled through its accuracy INVARIANT —
    // each engine runs its own HLL sketch and both must land within 5% of
    // the exact count, so the boolean column agrees even though the raw
    // sketch values never could. Only the raw sketch stays rows-only.
    "q_approx_distinct_check" -> { (s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")).cast("double") /
            col("exact_parts") <= 0.05).as("sketch_within_5pct"))
        .orderBy("l_returnflag")
    },

    // Approx percentile oracled through its accuracy invariant (same trick
    // as q_approx_distinct_check): the exact interpolated median
    // hash-matches outright; each engine's own sketch must land within 5%.
    "q_approx_percentile_check" -> { (s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.5)").as("exact_med"),
          expr("approx_percentile(l_quantity, 0.5, 10000)").as("approx_med"))
        .select(col("l_returnflag"), col("exact_med"),
          (abs(col("approx_med") - col("exact_med")) / col("exact_med") <= 0.05)
            .as("sketch_within_5pct"))
        .orderBy("l_returnflag")
    },

    // Modern aggregate battery: exact median, arg-min/arg-max with a
    // unique ordering key (deterministic), and associative bit aggregates.
    "q_more_aggs" -> { (s, d) =>
      orders(s, d)
        .groupBy("o_orderpriority")
        .agg(median(dec2(col("o_totalprice"))).cast("double").as("med_price"),
          max_by(col("o_orderstatus"), col("o_orderkey")).as("latest_status"),
          min_by(col("o_orderstatus"), col("o_orderkey")).as("first_status"),
          expr("bit_and(o_orderkey)").as("key_and"),
          expr("bit_or(o_orderkey)").as("key_or"),
          expr("bit_xor(o_orderkey)").as("key_xor"))
        .orderBy("o_orderpriority")
    },

    // grouping()/grouping_id() over a cube — how a reader distinguishes
    // real NULL group keys from subtotal rows.
    "q_grouping_id" -> { (s, d) =>
      orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          grouping_id().as("gid"),
          grouping(col("o_orderstatus")).as("g_status"))
        .orderBy(col("gid"), asc_nulls_first("o_orderstatus"),
          asc_nulls_first("o_orderpriority"))
    },

    // IGNORE NULLS window navigation: the last known non-null value per
    // partition (gap-fill / forward-fill shape).
    "q_window_ignore_nulls" -> { (s, d) =>
      val w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"),
          when(col("o_orderstatus") === "F", col("o_totalprice")).as("f_price"))
        .withColumn("last_f_price",
          last(col("f_price"), ignoreNulls = true).over(w))
        .orderBy("o_orderkey")
    },

    // GROUPING SETS via SQL (finer than rollup/cube: explicit set list).
    "q_grouping_sets" -> { (s, d) =>
      orders(s, d).createOrReplaceTempView("g_orders_gs")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, count(*) AS n
          |FROM g_orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
    }
  )

  val oracles: Map[String, String] = Map(
    "q_upsert_merge" ->
      """WITH b AS (SELECT o_orderkey, o_orderpriority,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS o_price FROM orders),
        |upd AS (
        |  SELECT o_orderkey, o_orderpriority AS u_priority,
        |    CAST(o_price * CAST(1.1 AS DECIMAL(3,1)) AS DECIMAL(25,3)) AS u_price
        |  FROM b WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey, u_priority, CAST(u_price AS DECIMAL(25,3))
        |  FROM (VALUES (-1, 'Z-SYNTH', 100.0), (-2, 'Z-SYNTH', 200.0),
        |    (-3, 'Z-SYNTH', 300.0), (-4, 'Z-SYNTH', 400.0), (-5, 'Z-SYNTH', 500.0))
        |    t(o_orderkey, u_priority, u_price)),
        |m AS (SELECT COALESCE(u.u_priority, b.o_orderpriority) AS priority,
        |    COALESCE(u.u_price, CAST(b.o_price AS DECIMAL(25,3))) AS price
        |  FROM b FULL OUTER JOIN upd u ON b.o_orderkey = u.o_orderkey)
        |SELECT priority, count(*) AS n_orders,
        |  CAST(sum(price) AS DOUBLE) AS total_price
        |FROM m GROUP BY priority ORDER BY priority""".stripMargin,

    "q_skew_report" ->
      """WITH c AS (SELECT l_suppkey, count(*) AS cnt FROM lineitem GROUP BY l_suppkey),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_rows, count(*) AS n_keys,
        |    CAST(max(cnt) AS BIGINT) AS max_cnt FROM c)
        |SELECT l_suppkey, cnt, round(CAST(cnt AS DOUBLE) / total_rows, 6) AS share,
        |  round(CAST(max_cnt AS DOUBLE) / (CAST(total_rows AS DOUBLE) / CAST(n_keys AS DOUBLE)), 6) AS skew_ratio
        |FROM c CROSS JOIN t ORDER BY cnt DESC, l_suppkey LIMIT 10""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(2,0)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS sum_disc_price,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(2,0)) - CAST(l_discount AS DECIMAL(6,4))) * (CAST(1 AS DECIMAL(2,0)) + CAST(l_tax AS DECIMAL(6,4)))), 2) AS DOUBLE) AS sum_charge,
        | CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
        | CAST(sum(CAST(l_discount AS DECIMAL(6,4))) AS DOUBLE) / count(*) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(2,0)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        | AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        | AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_revenue_by_nation" ->
      """SELECT n_name,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(2,0)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS revenue
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        | JOIN customer ON n_nationkey = c_nationkey
        | JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON o_orderkey = l_orderkey
        | JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |WHERE r_name = 'ASIA'
        | AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        | AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(6,4))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        | AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        | AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(2,0)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON o_orderkey = l_orderkey
        | JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q12_priority_lines" ->
      """SELECT o_orderpriority,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | count(*) AS line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        | AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_topk_per_segment" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal, rnk FROM (
        | SELECT c_mktsegment, c_custkey, c_acctbal,
        |  CAST(rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS rnk
        | FROM customer) t
        |WHERE rnk <= 3 ORDER BY c_mktsegment, rnk, c_custkey""".stripMargin,

    "q_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        | CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) OVER (
        |   PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        |FROM lineitem ORDER BY l_suppkey, l_orderkey, l_linenumber, running_qty""".stripMargin,

    "q_union_custkeys" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION
        |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000.0
        |ORDER BY custkey""".stripMargin,

    "q_intersect_custkeys" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000.0
        |ORDER BY custkey""".stripMargin,

    "q_except_custkeys" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000.0
        |ORDER BY custkey""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,

    "q_outer_join" ->
      """SELECT coalesce(c_custkey, o_custkey) AS custkey, c_name, o_orderkey, o_totalprice
        |FROM customer FULL OUTER JOIN orders ON c_custkey = o_custkey
        |ORDER BY custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin,

    "q_intersect_all" ->
      """SELECT l_partkey FROM lineitem WHERE l_quantity > 25
        |INTERSECT ALL
        |SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
        |ORDER BY l_partkey""".stripMargin,

    "q_except_all" ->
      """SELECT l_partkey FROM lineitem WHERE l_quantity > 25
        |EXCEPT ALL
        |SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
        |ORDER BY l_partkey""".stripMargin,

    "q_window_funcs2" ->
      """SELECT o_orderkey, o_orderpriority,
        |  first_value(o_orderkey) OVER w AS first_key,
        |  last_value(o_orderkey) OVER w AS last_key,
        |  nth_value(o_orderkey, 2) OVER w AS second_key,
        |  lead(o_orderkey, 1, -1) OVER w AS next_key,
        |  lag(o_orderkey, 2) OVER w AS prev2_key,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q_null_funcs" ->
      """SELECT o_orderkey,
        |  nullif(o_orderstatus, 'O') AS status_or_null,
        |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_filled,
        |  CASE WHEN o_totalprice > 300000.0 THEN o_totalprice END AS big_or_null,
        |  ifnull(CASE WHEN o_totalprice > 300000.0 THEN o_totalprice END, 0.0) AS big_or_zero
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_cond_aggs" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_totalprice > 200000.0) AS n_big,
        |  bool_or(o_orderstatus = 'F') AS any_f,
        |  bool_and(o_totalprice > 0) AS all_pos,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS open_total
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_distinct_counts" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_approx_distinct_check" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS exact_parts,
        | CAST(abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey)) AS DOUBLE)
        |   / count(DISTINCT l_partkey) <= 0.05 AS sketch_within_5pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_date_agg" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
        | CAST(month(o_orderdate) AS INTEGER) AS mo,
        | count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY yr, mo ORDER BY yr, mo""".stripMargin,

    "q_string_funcs" ->
      """SELECT p_partkey, upper(p_name) AS uname,
        | CAST(length(p_name) AS INTEGER) AS name_len,
        | substring(p_type, 1, 4) AS type_pfx,
        | p_brand || ':' || p_type AS brand_type,
        | string_split(p_name, ' ')[1] AS first_word
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_string_funcs2" ->
      """SELECT p_partkey,
        | regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        | translate(p_brand, '#', '-') AS brand_dash,
        | lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
        | rpad(p_type, 30, '.') AS type_padded,
        | repeat(p_brand, 2) AS brand_twice,
        | right(p_name, 5) AS name_tail,
        | CAST(strpos(p_name, 'o') AS INTEGER) AS first_o,
        | CAST(ascii(p_type) AS INTEGER) AS type_ascii0
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_datetime_funcs2" ->
      """SELECT o_orderkey,
        | CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
        | CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
        | CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 45 DAY AS DATE) AS VARCHAR) AS plus45,
        | CAST(CAST(CAST(o_orderdate AS DATE) - INTERVAL 45 DAY AS DATE) AS VARCHAR) AS minus45,
        | CAST(CAST(date_trunc('year', o_orderdate) AS DATE) AS VARCHAR) AS year_start,
        | CAST(make_date(CAST(year(o_orderdate) AS INTEGER), CAST(month(o_orderdate) AS INTEGER), 1) AS VARCHAR) AS month_start
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_string_funcs3" ->
      """SELECT p_partkey,
        | CAST(levenshtein(p_brand, 'Brand#11') AS INTEGER) AS brand_dist,
        | split_part(p_type, ' ', 1) AS type_first,
        | split_part(p_type, ' ', -1) AS type_last,
        | starts_with(p_name, 'blue') AS starts_blue,
        | contains(p_name, 'red') AS has_red,
        | ends_with(p_type, 'STEEL') AS ends_steel
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_case_cast_modulo" ->
      """SELECT event_id,
        | CASE WHEN event_id % 2 = 0 THEN CAST(event_id AS VARCHAR) ELSE NULL END AS even_str
        |FROM events ORDER BY event_id""".stripMargin,

    "q7_nation_trade" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        | CAST(year(l_shipdate) AS INTEGER) AS l_year,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(2,0)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation n1 ON s_nationkey = n1.n_nationkey
        | JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
        |   OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3')
        |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q14_promo_revenue" ->
      """SELECT 100.0 *
        | CAST(sum(CASE WHEN p_type = 'PROMO'
        |   THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(2,0)) - CAST(l_discount AS DECIMAL(6,4)))
        |   ELSE CAST(0 AS DECIMAL(2,0)) END) AS DOUBLE) /
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(2,0)) - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE)
        | AS promo_revenue_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 150)
        |SELECT c_custkey, c_name, o_orderkey, o_totalprice,
        |  CAST(sum_qty AS DOUBLE) AS total_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin,

    "q_min_price_per_part" ->
      """SELECT p_partkey, p_name, l_suppkey, l_extendedprice FROM (
        |  SELECT p.p_partkey, p.p_name, l.l_suppkey, l.l_extendedprice,
        |    row_number() OVER (PARTITION BY l.l_partkey
        |      ORDER BY l.l_extendedprice, l.l_suppkey, l.l_orderkey, l.l_linenumber) AS rn
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE p.p_size = 5) t
        |WHERE rn = 1 ORDER BY p_partkey""".stripMargin,

    "q_supplier_share" ->
      """SELECT l_suppkey,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS supp_rev
        |FROM lineitem
        |GROUP BY l_suppkey
        |HAVING CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) >
        |  (SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) * 0.0055
        |   FROM lineitem)
        |ORDER BY l_suppkey""".stripMargin,

    "q_pivot_status" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_more_aggs" ->
      """SELECT o_orderpriority,
        | CAST(quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE), 0.5) AS DOUBLE) AS med_price,
        | arg_max(o_orderstatus, o_orderkey) AS latest_status,
        | arg_min(o_orderstatus, o_orderkey) AS first_status,
        | bit_and(o_orderkey) AS key_and,
        | bit_or(o_orderkey) AS key_or,
        | bit_xor(o_orderkey) AS key_xor
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_grouping_id" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        | CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        | CAST(grouping(o_orderstatus) AS TINYINT) AS g_status
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q_window_ignore_nulls" ->
      """SELECT o_orderkey, o_orderpriority,
        | CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS f_price,
        | last_value(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END IGNORE NULLS) OVER (
        |   PARTITION BY o_orderpriority ORDER BY o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_f_price
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_approx_percentile_check" ->
      """SELECT l_returnflag,
        | quantile_cont(l_quantity, 0.5) AS exact_med,
        | abs(approx_quantile(l_quantity, 0.5) - quantile_cont(l_quantity, 0.5))
        |   / quantile_cont(l_quantity, 0.5) <= 0.05 AS sketch_within_5pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin
  )
}
