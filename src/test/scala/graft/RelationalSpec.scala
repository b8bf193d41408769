package graft

import graft.operators.Relational

/** Checks for queries whose semantics the DuckDB oracle can't pin down
  * (sketches) plus spot invariants on the newest relational queries.
  */
class RelationalSpec extends SparkSpecBase {

  test("q_weighted_median_dist: unique row, agrees with a local weighted scan") {
    val rows = graft.operators.SqlFunctions
      .queries("q_weighted_median_dist")(spark, sfDir).collect()
    assert(rows.length == 1, "the crossing row is unique by construction")
    val (got, wTotal) = (rows(0).getDouble(0), rows(0).getLong(1))
    val vals = Tables.lineitem(spark, sfDir)
      .select("l_extendedprice", "l_quantity", "l_orderkey", "l_linenumber").collect()
      .map(r => ((r.getDouble(0), r.getLong(2), r.getInt(3)), math.round(r.getDouble(1))))
      .sortBy(_._1)
    assert(wTotal == vals.map(_._2).sum)
    var cum = 0L
    val want = vals.find { case (_, w) =>
      val hit = 2 * cum < wTotal && 2 * (cum + w) >= wTotal
      cum += w
      hit
    }.get._1._1
    assert(got == want)
  }

  test("q_exact_quantiles_dist: monotone in p, agrees with a local sort") {
    val rows = graft.operators.SqlFunctions.queries("q_exact_quantiles_dist")(spark, sfDir)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1))
    assert(rows.map(_._1).toSeq == Seq(0.01, 0.25, 0.5, 0.75, 0.99))
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq, "quantiles must be monotone")
    val vals = Tables.lineitem(spark, sfDir)
      .select("l_extendedprice", "l_orderkey", "l_linenumber").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getInt(2))).sorted.map(_._1)
    rows.foreach { case (p, v) =>
      assert(v == vals(math.ceil(p * vals.length).toInt - 1),
        s"nearest-rank p=$p mismatch")
    }
  }

  test("approx_count_distinct stays within 5% of exact") {
    Relational.queries("q_approx_distinct")(spark, sfDir).collect().foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }

  test("q14 promo revenue is a percentage in (0, 100)") {
    val v = Relational.queries("q14_promo_revenue")(spark, sfDir)
      .head.getDouble(0)
    assert(v > 0.0 && v < 100.0, s"promo pct $v")
  }

  test("q_min_price_per_part returns exactly one row per size-5 part with lineitems") {
    val out = Relational.queries("q_min_price_per_part")(spark, sfDir).collect()
    assert(out.map(_.getLong(0)).distinct.length === out.length)
  }
}
