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

  test("eval_auc: rank-sum AUC matches a brute-force pairwise AUC") {
    val r = q("eval_auc").head()
    val (npos, nneg, auc) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    val scores = q("logreg_scores").collect()
      .map(x => (x.getInt(1), x.getDouble(2)))
    assert(npos == scores.count(_._1 == 1) && nneg == scores.count(_._1 == 0))
    val pos = scores.filter(_._1 == 1).map(_._2)
    val neg = scores.filter(_._1 == 0).map(_._2)
    val brute = pos.iterator.flatMap(p => neg.iterator.map(n =>
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0)).sum / (npos * nneg)
    assert(math.abs(auc - brute) < 1e-6, s"rank-sum $auc vs brute $brute")
    assert(auc > 0.9, s"classifier should rank well, auc=$auc")
  }

  test("eval_calibration: bins partition the corpus; rates are consistent") {
    val bins = q("eval_calibration").collect()
    val m = q("logreg_metrics").head()
    assert(bins.map(_.getLong(1)).sum == m.getLong(0))
    bins.foreach { b =>
      val (bin, n, pos) = (b.getInt(0), b.getLong(1), b.getLong(2))
      val (meanP, fracPos) = (b.getDouble(3), b.getDouble(4))
      assert(bin >= 0 && bin <= 9 && pos <= n)
      assert(meanP >= bin / 10.0 - 1e-9 && meanP <= math.min(1.0, (bin + 1) / 10.0) + 1e-9)
      assert(math.abs(fracPos - pos.toDouble / n) < 1e-6)
    }
  }

  test("eval_pr_curve: monotone recall; endpoints reconcile with the scores") {
    val pr = q("eval_pr_curve").collect()
    assert(pr.nonEmpty && pr.length <= 9)
    // recall is non-increasing as the threshold rises
    val recs = pr.map(_.getDouble(4))
    assert(recs.zip(recs.tail).forall { case (a, b) => a >= b - 1e-12 })
    val scores = q("logreg_scores").collect()
      .map(x => (x.getInt(1), x.getDouble(2)))
    pr.foreach { r =>
      val t = r.getDouble(0)
      assert(r.getLong(1) == scores.count(x => x._1 == 1 && x._2 >= t), s"tp at $t")
      assert(r.getLong(2) == scores.count(x => x._1 == 0 && x._2 >= t), s"fp at $t")
    }
  }
}
