package graft

import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec

import graft.operators.Basket

/** Market-basket association mining invariants at sf0.001. */
class BasketSpec extends SparkSpecBase {

  private def q(name: String) = Basket.queries(name)(spark, sfDir)

  test("basket_sizes partitions the order set; sizes stay small-bounded") {
    val sizes = q("basket_sizes").collect()
    val nOrders = Tables.lineitem(spark, sfDir)
      .select("l_orderkey").distinct().count()
    assert(sizes.map(_.getLong(1)).sum == nOrders)
    // the fixture's per-order line counts are small (max 11 at sf0.001) —
    // the property that bounds the pair-join expansion at O(k²) per basket
    assert(sizes.map(_.getInt(0)).forall(k => k >= 1 && k <= 20))
  }

  test("basket_rules: support/confidence/lift reconcile; ordering is total") {
    val rules = q("basket_rules").collect()
    assert(rules.nonEmpty)
    rules.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (pc, ca, cb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(a < b, "canonical pair order")
      assert(pc >= Basket.MinSupport && pc <= math.min(ca, cb))
      assert(math.abs(r.getDouble(5) - pc.toDouble / ca) < 1e-6, "confidence")
    }
    // deterministic: support desc, then (item_a, item_b) — a total order
    val keys = rules.map(r => (-r.getLong(2), r.getLong(0), r.getLong(1)))
    assert(keys.sameElements(keys.sorted))
    assert(keys.distinct.length == keys.length)
  }

  test("pair generation is a co-located equi-join, never a cross product") {
    val plan = q("basket_rules").queryExecution.executedPlan
    def nodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      (p +: p.children.flatMap(nodes)) ++ p.subqueries.flatMap(nodes)
    val all = nodes(plan)
    assert(!all.exists(_.isInstanceOf[CartesianProductExec]))
    // the only NLJ allowed is the broadcast of the 1-row n_orders frame
    val nlj = all.collect { case j: BroadcastNestedLoopJoinExec => j }
    assert(nlj.isEmpty || nlj.forall(_.toString.contains("Cross")),
      "inequality predicate must ride the orderkey equi-join, not an NLJ")
  }
}
