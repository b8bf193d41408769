package graft

import org.apache.spark.sql.functions._

import graft.operators.Clustering

/** Lloyd k-means: agreement with a local reference implementation on the
  * fixture (the strongest signal — the Spark DAG and a sequential loop
  * must land on identical clusters), plus the fixture-level invariants.
  */
class ClusteringSpec extends SparkSpecBase {

  /** Local reference: same fixed-point arithmetic, plain loops. */
  private def localLloyd(vecs: Array[(Long, Array[Double])], k: Int, rounds: Int)
    : Map[Long, Long] = localLloydFull(vecs, k, rounds)._1

  private def localLloydFull(vecs: Array[(Long, Array[Double])], k: Int, rounds: Int)
    : (Map[Long, Long], Map[Long, Array[Double]]) = {
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    // identical association to the Spark/DuckDB formula:
    // (x·x − 2·(x·c)) + c·c with sequential folds
    def dist2(x: Array[Double], c: Array[Double]): Double =
      dot(x, x) - 2.0 * dot(x, c) + dot(c, c)
    var cents: Map[Long, Array[Double]] =
      vecs.filter(_._1 < k).map { case (id, x) => id -> x.clone() }.toMap
    var assign = Map.empty[Long, Long]
    for (_ <- 1 to rounds) {
      assign = vecs.map { case (id, x) =>
        id -> cents.toSeq.map { case (cid, c) => (dist2(x, c), cid) }.min._2
      }.toMap
      cents = vecs.groupBy { case (id, _) => assign(id) }.map { case (cid, members) =>
        val d = members.head._2.length
        cid -> Array.tabulate(d) { j =>
          val s9 = members.map(m => math.round(m._2(j) * 1e9)).sum
          s9.toDouble / members.length.toDouble / 1e9
        }
      }
    }
    (assign, cents)
  }

  test("kmeans matches the sequential reference on the fixture") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val wantAssign = localLloyd(vecs, Clustering.K, Clustering.Rounds)
    val got = Clustering.queries("kmeans_assign")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == wantAssign)
  }

  test("every vector is assigned exactly once; clusters cover the corpus") {
    val assign = Clustering.queries("kmeans_assign")(spark, sfDir).collect()
    val n = Tables.embeddings(spark, sfDir).count()
    assert(assign.length == n)
    assert(assign.map(_.getLong(0)).distinct.length == n)
    val sizes = Clustering.queries("kmeans_sizes")(spark, sfDir).collect()
    assert(sizes.map(_.getLong(1)).sum == n)
    assert(sizes.forall(_.getDouble(3) >= 0.0), "mean dist2 is non-negative")
  }

  test("assignment is run-stable (no RNG, no partition sensitivity)") {
    val a = Clustering.queries("kmeans_assign")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val b = Clustering.queries("kmeans_assign")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(a == b)
  }

  test("cluster_silhouette matches a sequential reference bit-for-bit") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val (assign, cents) = localLloydFull(vecs, Clustering.K, Clustering.Rounds)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var t = 0.0; var i = 0
      while (i < a.length) { t += a(i) * b(i); i += 1 }
      t
    }
    // per vector: membership is the ASSIGNMENT (not nearest-final-
    // centroid — the two can disagree near a boundary); a = clamped dist
    // to the assigned final centroid, b = min over the OTHER final
    // centroids
    val per = vecs.map { case (id, x) =>
      val own = assign(id)
      def d2(c: Array[Double]): Double =
        math.max(dot(x, x) - 2.0 * dot(x, c) + dot(c, c), 0.0)
      val a = math.sqrt(d2(cents(own)))
      val b = math.sqrt(
        cents.collect { case (cid, c) if cid != own => d2(c) }.min)
      val sil = if (math.max(a, b) == 0.0) 0.0 else (b - a) / math.max(a, b)
      (own, sil)
    }
    val want = per.groupBy(_._1).map { case (cid, rows) =>
      val s6 = rows.map(r => math.round(r._2 * 1e6)).sum
      val n = rows.length.toLong
      // same exact integer half-up mean (offset keeps the numerator
      // non-negative) as the query and the oracle
      val mOff = (2L * (s6 + n * 1000000L) + n) / (2L * n)
      (cid, n, (mOff - 1000000L).toDouble / 1e6)
    }.toSeq.sortBy(_._1)
    val got = Clustering.queries("cluster_silhouette")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want)
    // non-vacuous: a meaningful spread, every value in the legal range
    assert(got.forall { case (_, _, m) => m > -1.0 && m < 1.0 })
    assert(got.map(_._3).distinct.length > 1, "silhouette means all equal — degenerate fixture")
  }

  test("cluster_silhouette membership is consistent with kmeans_sizes") {
    // the r7 advisory: silhouette used to re-derive membership by
    // nearest-FINAL-centroid, silently moving boundary vectors between
    // clusters across queries; per-cluster counts must now agree exactly
    val sil = Clustering.queries("cluster_silhouette")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val sizes = Clustering.queries("kmeans_sizes")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sil == sizes, s"silhouette clusters $sil vs assignment clusters $sizes")
  }

  test("ann_ivf_trained_topk: valid ranks, exact cosines, useful recall vs brute force") {
    import graft.operators.Similarity
    val rows = Clustering.queries("ann_ivf_trained_topk")(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until Similarity.QuerySet).toSet)
    byQ.values.foreach(rs => assert(rs.map(_.getInt(3)).toSeq.sorted == (1 to rs.length)))
    // exact cosine for every returned pair
    val vecs = Tables.embeddings(spark, sfDir).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    rows.foreach { r =>
      val want = cos(vecs(r.getLong(0)), vecs(r.getLong(1)))
      assert(math.abs(r.getDouble(2) - want) < 1e-5)
    }
    // recall@K vs brute force: 2 of 8 trained cells probed must catch a
    // useful share of each query's true neighbors
    val trueTop = (0L until Similarity.QuerySet).map { q =>
      q -> vecs.keys.filter(_ != q).toSeq
        .sortBy(c => (-cos(vecs(q), vecs(c)), c)).take(Similarity.K).toSet
    }.toMap
    val recall = (0L until Similarity.QuerySet).map { q =>
      (byQ.getOrElse(q, Array.empty).map(_.getLong(1)).toSet & trueTop(q)).size.toDouble /
        Similarity.K
    }.sum / Similarity.QuerySet
    assert(recall >= 0.3, s"trained-IVF recall collapsed: $recall")
  }

  test("semdedup: pairs are co-clustered above-threshold, stats conserve") {
    val (assign, _) = Clustering.lloyd(spark, sfDir)
    val cid = assign.select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Clustering.queries("semdedup_pairs")(spark, sfDir).collect()
    pairs.foreach { r =>
      val (cl, a, b, c) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(a < b && c >= Clustering.SemThreshold)
      assert(cid(a) == cl && cid(b) == cl)
    }
    val stats = Clustering.queries("semdedup_stats")(spark, sfDir).collect()
    assert(stats.map(_.getLong(1)).sum == cid.size) // all vectors accounted
    stats.foreach(r => assert(r.getLong(1) == r.getLong(2) + r.getLong(3)))
    val dropped = pairs.map(_.getLong(2)).toSet
    assert(stats.map(_.getLong(2)).sum == dropped.size)
  }

  test("cluster-balanced sample: near target fraction, minority clusters upweighted") {
    val rates = Clustering.queries("cluster_balanced_rates")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rates.nonEmpty)
    rates.foreach { case (_, n, rate, thresh) =>
      assert(n > 0 && rate > 0.0 && rate <= 1.0)
      assert(thresh >= 1L && thresh <= 1000000L)
    }
    // sqrt temperature: keep RATE decreases as cluster size grows
    val byN = rates.sortBy(_._2)
    byN.sliding(2).foreach { case Array((_, n1, r1, _), (_, n2, r2, _)) =>
      if (n1 < n2) assert(r1 >= r2 - 1e-9, s"smaller cluster must keep at a higher rate: $n1->$r1 vs $n2->$r2")
    }
    val kept = Clustering.queries("cluster_balanced_sample")(spark, sfDir).collect()
    val total = rates.map(_._2).sum
    val frac = kept.length.toDouble / total
    assert(frac > Clustering.CbsFrac - 0.15 && frac < Clustering.CbsFrac + 0.15,
      s"sample fraction $frac should be near ${Clustering.CbsFrac}")
    // determinism: a second run keeps the identical set
    val kept2 = Clustering.queries("cluster_balanced_sample")(spark, sfDir).collect()
    assert(kept.map(_.getLong(0)).toSet == kept2.map(_.getLong(0)).toSet)
  }

  test("plan: centroids broadcast — the corpus side never shuffles to assign") {
    val (assign, _) = Clustering.lloyd(spark, sfDir)
    val plan = assign.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast centroid join, got:\n$plan")
  }
}
