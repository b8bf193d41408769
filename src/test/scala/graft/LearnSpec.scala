package graft

import graft.operators.Learn

/** In-engine logistic-regression trainer invariants at sf0.001. */
class LearnSpec extends SparkSpecBase {

  private def q(name: String) = Learn.queries(name)(spark, sfDir)

  test("trainer learns: accuracy beats the majority baseline by a wide margin") {
    val m = q("logreg_metrics").head()
    val (n, tp, fp, fn, tn) =
      (m.getLong(0), m.getLong(1), m.getLong(2), m.getLong(3), m.getLong(4))
    assert(n == tp + fp + fn + tn)
    val acc = (tp + tn).toDouble / n
    val majority = math.max(tp + fn, fp + tn).toDouble / n
    assert(acc > 0.9, s"accuracy $acc")
    assert(acc > majority + 0.1, s"acc $acc vs majority $majority — learned nothing")
  }

  test("scores reconcile with metrics; p in (0,1); deterministic across runs") {
    val scores = q("logreg_scores").collect()
    scores.foreach { r =>
      val p = r.getDouble(2)
      assert(p > 0.0 && p < 1.0)
      assert(r.getBoolean(3) == (p >= 0.5))
    }
    val m = q("logreg_metrics").head()
    assert(m.getLong(0) == scores.length)
    assert(m.getLong(1) == scores.count(r => r.getInt(1) == 1 && r.getBoolean(3)))
    val w1 = q("logreg_weights").head().toSeq
    val w2 = q("logreg_weights").head().toSeq
    assert(w1 == w2)
    // gradient descent moved every weight off the zero init
    assert(w1.forall(_.asInstanceOf[Double] != 0.0))
  }
}
