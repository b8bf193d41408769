package graft

import graft.operators.Markov

/** Markov-chain event analysis invariants at sf0.001. */
class MarkovSpec extends SparkSpecBase {

  private def q(name: String) = Markov.queries(name)(spark, sfDir)

  test("markov_transitions: rows are a proper stochastic tally") {
    val rows = q("markov_transitions").collect()
    assert(rows.nonEmpty)
    // per-from row: counts sum to the row total; probs sum to ~1
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      val rt = g.head.getLong(3)
      assert(g.map(_.getLong(2)).sum == rt)
      assert(math.abs(g.map(_.getDouble(4)).sum - 1.0) < 1e-4)
    }
    // total transitions = events - one per user (first event has no lag)
    val ev = Tables.events(spark, sfDir)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum == expected)
  }

  test("markov_stationary: a probability vector, reproducible bit-for-bit") {
    val pi = q("markov_stationary").collect()
    assert(pi.map(_.getDouble(1)).forall(_ >= 0.0))
    // fixed-point products conserve mass up to the 1e-12 rounding × iters
    assert(math.abs(pi.map(_.getDouble(1)).sum - 1.0) < 1e-4)
    assert(pi.map(_.toSeq).toSeq ==
      q("markov_stationary").collect().map(_.toSeq).toSeq)
  }
}
