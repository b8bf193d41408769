package graft

import graft.operators.Drift

/** Distribution-drift diagnostics invariants at sf0.001. */
class DriftSpec extends SparkSpecBase {

  private def q(name: String) = Drift.queries(name)(spark, sfDir)

  test("drift_source_kl: KL ≥ 0, entropy within [0, ln V], deterministic") {
    val rows = q("drift_source_kl").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, v) = (r.getLong(1), r.getLong(2))
      val (h, kl) = (r.getDouble(3), r.getDouble(4))
      assert(v <= n, "distinct tokens cannot exceed token count")
      // Gibbs: KL(p‖q) ≥ 0, = 0 only if the distributions coincide
      assert(kl >= 0.0, s"KL must be non-negative, got $kl")
      assert(h >= 0.0 && h <= math.log(v.toDouble) + 1e-6,
        s"entropy $h outside [0, ln $v]")
    }
    // fixed-point sums ⇒ bit-identical across runs/partitionings
    assert(rows.map(_.toSeq).toSeq == q("drift_source_kl").collect().map(_.toSeq).toSeq)
  }

  test("drift_ks/w1: engine equals a pure-Scala ECDF reference on the real fixture") {
    // independent referee: collect (source, n_chars), compute KS and W1
    // from first principles in plain Scala, compare to the queries
    val docs = Tables.documents(spark, sfDir)
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySrc = docs.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val all = docs.map(_._2)
    def refKsW1(src: String): (Double, Double) = {
      val s = bySrc(src)
      val rest = docs.filter(_._1 != src).map(_._2)
      val xs = all.distinct.sorted
      def cdf(v: Seq[Long], x: Long) = v.count(_ <= x).toDouble / v.size
      val gaps = xs.map(x => math.abs(cdf(s, x) - cdf(rest.toSeq, x)))
      val ks = gaps.max
      val w1 = xs.init.zip(xs.tail).map { case (x, nx) =>
        math.abs(cdf(s, x) - cdf(rest.toSeq, x)) * (nx - x)
      }.sum
      (ks, w1)
    }
    val ks = q("drift_ks_length").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val w1 = q("drift_w1_length").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(ks.nonEmpty && ks.keySet == bySrc.keySet)
    bySrc.keys.foreach { s =>
      val (rk, rw) = refKsW1(s)
      assert(math.abs(ks(s) - rk) < 1e-6, s"$s: KS ${ks(s)} vs reference $rk")
      assert(math.abs(w1(s) - rw) < 1e-5, s"$s: W1 ${w1(s)} vs reference $rw")
      assert(ks(s) >= 0.0 && ks(s) <= 1.0 && w1(s) >= 0.0)
    }
  }

  test("drift_ks/w1/psi: a single-source corpus yields NULL metrics, never a divide-by-zero") {
    // the r7 advisory's planted counterexample: with one source the
    // rest-of-corpus side is EMPTY (n_tot == n_s) and every vs-rest
    // denominator is zero; the contract is a NULL statistic, not an ANSI
    // error or NaN
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("drift_single_src").toString
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), lit("only").as("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    for (name <- Seq("drift_ks_length", "drift_w1_length", "drift_psi_length")) {
      val rows = Drift.queries(name)(spark, dir).collect()
      assert(rows.map(_.getString(0)).toSeq == Seq("only"), s"$name rows")
      assert(rows.forall(_.isNullAt(2)), s"$name must be NULL for a single source")
    }
  }

  test("drift_psi: matches a driver-side recompute; non-negative with real spread") {
    val rows = q("drift_psi_length").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rows.nonEmpty)
    rows.values.foreach(v => assert(v >= 0.0, s"PSI must be non-negative: $v"))
    assert(rows.values.exists(_ > 0.0))
    // first-principles recompute: global equi-depth deciles by
    // (n_chars, doc_id) rank, per-source shares vs rest, 1e-6 floors
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val n = docs.length
    val binned = docs.sortBy(d => (d._3, d._1)).zipWithIndex
      .map { case ((_, src, _), i) => (src, i.toLong * Drift.PsiBins / n) }
    val bt = binned.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val ns = binned.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    ns.keys.foreach { src =>
      val psi = bt.keys.toSeq.map { b =>
        val c = binned.count(x => x._1 == src && x._2 == b).toLong
        val p = if (c == 0) 1e-6 else c.toDouble / ns(src)
        val q0 = if (bt(b) - c == 0) 1e-6
          else (bt(b) - c).toDouble / (n - ns(src))
        math.rint((p - q0) * math.log(p / q0) * 1e9) / 1e9
      }.sum
      assert(math.abs(rows(src) - math.rint(psi * 1e6) / 1e6) < 2e-6,
        s"$src: ${rows(src)} vs reference $psi")
    }
  }

  test("style_burrows_delta: matches a driver recompute; L1 metric laws hold on all triples") {
    val got = q("style_burrows_delta").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got.nonEmpty)
    // driver recompute from first principles
    val tok = Tables.documents(spark, sfDir).select("source", "text").collect()
      .flatMap(r => r.getString(1).toLowerCase.split("\\s+").map((r.getString(0), _)))
    val top = tok.groupBy(_._2).view.mapValues(_.length).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(Drift.DeltaTopM).map(_._1)
    val ns = tok.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val f9 = (for (s <- ns.keys; w <- top) yield {
      val c = tok.count(t => t._1 == s && t._2 == w).toLong
      (s, w) -> c * 1000000000L / ns(s)
    }).toMap
    val z = (for (w <- top) yield {
      val vs = ns.keys.toSeq.map(s => f9((s, w)).toDouble)
      val m = vs.sum / vs.size
      val sd = math.sqrt(vs.map(v => v * v).sum / vs.size - m * m)
      w -> ns.keys.map(s => s -> (if (sd == 0.0) 0.0 else (f9((s, w)) - m) / sd)).toMap
    }).toMap
    def ref(a: String, b: String): Double =
      top.map(w => math.rint(math.abs(z(w)(a) - z(w)(b)) * 1e9) / 1e9).sum / Drift.DeltaTopM
    got.foreach { case ((a, b), d) =>
      assert(math.abs(d - math.rint(ref(a, b) * 1e6) / 1e6) < 2e-6,
        s"($a,$b): $d vs reference ${ref(a, b)}")
    }
    // scaled-L1 metric laws over every source triple
    val srcs = ns.keys.toSeq.sorted
    def dd(a: String, b: String) =
      if (a < b) got((a, b)) else if (b < a) got((b, a)) else 0.0
    for (a <- srcs; b <- srcs if a < b) assert(dd(a, b) > 0.0)
    for (a <- srcs; b <- srcs; c <- srcs if a < b && b < c) {
      assert(dd(a, c) <= dd(a, b) + dd(b, c) + 1e-6, s"triangle $a $b $c")
      assert(dd(a, b) <= dd(a, c) + dd(b, c) + 1e-6, s"triangle $b $a $c")
      assert(dd(b, c) <= dd(a, b) + dd(a, c) + 1e-6, s"triangle $c $a $b")
    }
  }

  test("emb_drift_mmd: identical groups score 0, a translated group scores the exact shift") {
    import spark.implicits._
    import graft.operators.Drift
    val base = Seq(Array(1.0f, 2.0f, -0.5f), Array(0.25f, -1.0f, 3.0f))
    val shift = 0.25f
    val emb = (base.map(v => (0, v)) ++ base.map(v => (1, v)) ++
      base.map(v => (2, v.map(_ + shift)))).toDF("label", "embedding")
    val r = Drift.mmdPairs(emb).collect()
      .map(x => (x.getInt(0), x.getInt(1)) -> x.getDouble(2)).toMap
    assert(r((0, 1)) == 0.0, "identical groups must have zero MMD")
    val want = 3 * shift * shift // per-dim squared shift, 3 dims
    assert(math.abs(r((0, 2)) - want) < 1e-6 && math.abs(r((1, 2)) - want) < 1e-6,
      s"translated group: got ${r((0, 2))}, want $want")
    // fixture: every label pair present, statistic non-negative
    val fix = Drift.queries("emb_drift_mmd")(spark, sfDir).collect()
    val nLabels = Tables.embeddings(spark, sfDir).select("label").distinct().count()
    assert(fix.length == nLabels * (nLabels - 1) / 2)
    fix.foreach(x => assert(x.getDouble(2) >= 0.0))
  }

  test("source_style_cosine: all pairs present, values in (0,1], self-sim law on a planted clone") {
    val rows = Drift.queries("source_style_cosine")(spark, sfDir).collect()
    Graft.releaseCaches(spark)
    val ns = Tables.documents(spark, sfDir).select("source").distinct().count()
    assert(rows.length == ns * (ns - 1) / 2, "one cell per unordered source pair")
    rows.foreach { r =>
      val c = r.getDouble(2)
      assert(c > 0.0 && c <= 1.0 + 1e-9, s"cosine out of range: $c")
      assert(r.getString(0) < r.getString(1))
    }
  }

  test("term_burstiness: moments match a driver-side recompute; variance law holds") {
    import graft.operators.Corpus
    val rows = Corpus.queries("term_burstiness")(spark, sfDir).collect()
    Graft.releaseCaches(spark)
    assert(rows.length > 0 && rows.length <= Corpus.BurstTopK)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\s+"))
    val nDocs = docs.length
    rows.foreach { r =>
      val (tok, total) = (r.getString(0), r.getLong(1))
      val perDoc = docs.map(_._2.count(_ == tok).toLong)
      assert(perDoc.sum == total)
      val mean = total.toDouble / nDocs
      val ex2 = perDoc.map(c => c * c).sum.toDouble / nDocs
      val vmr = (ex2 - mean * mean) / mean
      assert(math.abs(r.getDouble(3) - vmr) < 1e-5, s"$tok vmr")
      assert(r.getDouble(3) >= 0.0, "variance-to-mean cannot be negative")
    }
  }

  test("drift_lang_chi2: full margins grid; statistic is non-negative") {
    val r = q("drift_lang_chi2").head()
    val nSources = Tables.documents(spark, sfDir).select("source").distinct().count()
    val nLangs = Tables.documents(spark, sfDir).select("lang").distinct().count()
    assert(r.getLong(0) == nSources * nLangs,
      "absent (source, lang) cells must still contribute to chi²")
    assert(r.getDouble(1) >= 0.0)
  }
}
