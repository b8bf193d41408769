package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** TextRank / integer PageRank: agreement with a plain-loop reference on a
  * known graph (the strongest signal — the distributed DAG and a local
  * sequential loop must produce identical scaled-integer ranks), plus
  * fixture-level invariants.
  */
class GraphSpec extends SparkSpecBase {

  /** Local reference: identical scaled-integer PageRank, plain loops. */
  private def localPagerank(edges: Seq[(String, String, Long)], iters: Int)
    : Map[String, Long] = {
    val outW = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val nodes = outW.keySet
    val n = nodes.size
    val base = Graph.Scale / n
    val teleport = (Graph.TeleNum * base) / 100L
    var rank: Map[String, Long] = nodes.map(_ -> base).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _, w) => (rank(src) * w) / outW(src) }.sum
      }
      rank = in.map { case (node, s) => node -> (teleport + (Graph.DampNum * s) / 100L) }
    }
    rank
  }

  test("pagerank matches the sequential reference on a known weighted graph") {
    // triangle with a pendant: a-b heavy, b-c, c-a, c-d light
    val raw = Seq(("a", "b", 3L), ("b", "c", 1L), ("c", "a", 1L), ("c", "d", 1L))
    val und = raw ++ raw.map { case (s, d, w) => (d, s, w) }
    val df = spark.createDataFrame(und).toDF("src", "dst", "w")
    val got = Graph.pagerank(df, iters = Graph.Iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = localPagerank(und, Graph.Iters)
    assert(got === want)
  }

  test("fixture textrank: mass conservation and positivity") {
    val res = Graph.queries("graph_textrank")(spark, sfDir).collect()
    assert(res.nonEmpty)
    val total = res.map(_.getLong(1)).sum
    // floor losses only: total <= Scale, and within n*(iters+2) ulps of it
    assert(total <= Graph.Scale)
    assert(total > Graph.Scale - res.length.toLong * (Graph.Iters + 2) * 100)
    assert(res.forall(_.getLong(1) > 0))
  }

  test("personalized pagerank: seed-localized mass, sequential-reference parity") {
    // path graph a-b-c-d-e (unit weights), seed {a}: rank must decay with
    // distance from the seed
    val raw = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "d", 1L), ("d", "e", 1L))
    val und = raw ++ raw.map { case (s, d, w) => (d, s, w) }
    val df = spark.createDataFrame(und).toDF("src", "dst", "w")
    val s2 = spark
    import s2.implicits._
    val got = Graph.personalizedPagerank(df, Seq("a").toDF("node"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("a") > got("b") && got("b") > got("c") &&
      got("c") > got("d") && got("d") > got("e"), got.toString)
    // mass conservation up to floor losses
    val total = got.values.sum
    assert(total <= Graph.Scale && total > Graph.Scale - 1000L * (Graph.Iters + 2))
    // fixture query: deterministic, seeds outrank the global tail
    val fix = Graph.queries("graph_ppr_stopwords")(spark, sfDir).collect()
    val fix2 = Graph.queries("graph_ppr_stopwords")(spark, sfDir).collect()
    assert(fix.map(_.toString).toSeq == fix2.map(_.toString).toSeq)
    // empty seed set -> the zero vector as an EMPTY relation (not a
    // divide-by-zero: the r10 scale probe hit this on a corpus with no
    // English stopwords)
    val none = Graph.personalizedPagerank(df, Seq.empty[String].toDF("node"))
    assert(none.count() === 0L)
    assert(none.columns.toSeq === Seq("node", "rank"))
    Graft.releaseCaches(spark)
  }

  test("degree stats: undirected graph has symmetric degrees and even weight total") {
    val deg = Graph.queries("graph_degree_stats")(spark, sfDir)
    // every edge was inserted in both directions -> total weighted degree even
    val tot = deg.agg(sum("wdegree")).head.getLong(0)
    assert(tot % 2 == 0)
    // in-degree must equal out-degree per node
    val edges = Graph.cooccurEdges(
      Tables.documents(spark, sfDir).select("doc_id", "text"))
    val outd = edges.groupBy("src").count().withColumnRenamed("src", "node")
    val ind = edges.groupBy("dst").count().withColumnRenamed("dst", "node")
      .withColumnRenamed("count", "icount")
    assert(outd.join(ind, "node").where(col("count") =!= col("icount")).count() == 0)
  }

  test("triangle census agrees with a brute-force count; corners reconcile") {
    val r = Graph.queries("graph_triangles")(spark, sfDir).head()
    val (nNodes, nEdges, nTri, nWedges) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(math.abs(r.getDouble(4) - 3.0 * nTri / nWedges) < 1e-6)
    // brute force on the collected edge set (vocab-sized at sf0.001)
    val e = Graph.cooccurEdges(
        Tables.documents(spark, sfDir).select("doc_id", "text"))
      .where(col("src") < col("dst")).select("src", "dst").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(e.size == nEdges)
    val nodes = e.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    assert(nodes.distinct.size == nNodes)
    val brute = (for {
      (a, b) <- e.toSeq; c <- nodes.distinct
      if b < c && e.contains((b, c)) && e.contains((a, c))
    } yield 1).size
    assert(brute == nTri, s"join count $nTri vs brute $brute")
    // per-node participation sums to 3 × triangles
    val perNode = Graph.queries("graph_node_triangles")(spark, sfDir).collect()
    assert(perNode.map(_.getLong(1)).forall(_ >= 1))
    assert(perNode.map(_.getLong(1)).max <= nTri)
  }

  test("degree-ordered orientation yields the identical census") {
    val a = Graph.queries("graph_triangles")(spark, sfDir).head()
    val b = Graph.queries("graph_triangles_by_degree")(spark, sfDir).head()
    // n_edges is orientation-invariant too (each undirected edge oriented
    // exactly once either way); every column must agree
    assert(a.toSeq == b.toSeq)
  }

  test("local clustering: coefficient in [0,1], identity against its own columns") {
    val rows = Graph.queries("graph_local_clustering")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val (deg, nTri, cc) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(deg >= 2)
      val wedges = deg * (deg - 1) / 2.0
      assert(nTri <= wedges, "triangles at a node cannot exceed its wedges")
      val expect = BigDecimal(nTri / wedges)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(cc - expect) < 1e-9)
      assert(cc >= 0.0 && cc <= 1.0)
    }
    val cs = rows.map(_.getDouble(3))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
  }

  test("k-core peeling reaches its fixpoint; members have full-graph degree >= k") {
    val core = Graph.queries("graph_kcore")(spark, sfDir).collect()
    assert(core.nonEmpty)
    // all surviving degrees >= k  <=>  one more peel round removes nothing
    // <=> the peel converged within CoreRounds
    assert(core.forall(_.getLong(1) >= Graph.CoreK))
    // core membership implies full-graph degree >= core degree >= k
    val deg = Graph.queries("graph_degree_stats")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    core.foreach { r =>
      assert(deg(r.getString(0)) >= r.getLong(1))
    }
  }

  test("label propagation: 2-clique resolves to the min label and stays stable") {
    val s = spark
    import s.implicits._
    // without the self-vote this oscillates and the result depends on
    // round parity — run both 5 and 6 rounds to prove it does not
    val und = Seq((1L, 2L, 10L), (2L, 1L, 10L), (7L, 9L, 3L), (9L, 7L, 3L))
      .toDF("src", "dst", "w")
    for (rounds <- Seq(5, 6)) {
      val got = Graph.labelPropagation(und, rounds).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === Map(1L -> 1L, 2L -> 1L, 7L -> 7L, 9L -> 7L), s"rounds=$rounds")
    }
  }

  test("label propagation: weighted bridge stays out of the heavier community (differs from CC)") {
    val s = spark
    import s.implicits._
    // nodes 1-2-3 strongly tied; node 10 tied to 20/30 with weight 5 each
    // and weakly bridged to 3 (weight 1). Connected components would merge
    // everything into component 1; weighted LPA keeps {10,20,30} separate
    // because 10's own cluster outvotes the bridge.
    val pairs = Seq((1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 10L),
      (10L, 20L, 5L), (10L, 30L, 5L), (3L, 10L, 1L))
    val und = (pairs ++ pairs.map { case (a, b, w) => (b, a, w) })
      .toDF("src", "dst", "w")
    val got = Graph.labelPropagation(und, Graph.LpRounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(1L, 2L, 3L).map(got) === Set(1L))
    assert(Set(10L, 20L, 30L).map(got) === Set(10L))
    // sanity: reachability-wise this graph is ONE component
    val cc = graft.operators.Components
      .connectedComponents(und.select(col("src").as("id")).distinct(),
        und.select("src", "dst")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.values.toSet.size == 1)
  }

  test("fixture LP communities: labels are members, communities refine components") {
    val out = Graph.queries("graph_lp_communities")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    // every community label is itself a participating node
    out.values.foreach(lab => assert(out.contains(lab)))
    // communities refine the near-dup connected components: two docs in
    // the same LP community are near-dup-reachable from each other
    val cc = graft.operators.Components.nearDupComponents(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.groupBy(_._2).values.foreach { mem =>
      assert(mem.keys.map(cc).toSet.size == 1, s"community spans components: $mem")
    }
  }

  test("graph_assortativity: r in [-1,1]; moments reconcile with independent degree join") {
    val r = Graph.queries("graph_assortativity")(spark, sfDir).collect()
    assert(r.length == 1)
    val (m, sx, sx2, sxy) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3))
    // NULL only for a degree-regular graph (zero variance); else in [-1,1]
    if (!r(0).isNullAt(4)) {
      val a = r(0).getDouble(4)
      assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9)
      assert(m * sx2 - sx * sx != 0)
    } else assert(m * sx2 == sx * sx)
    // independent recomputation from the raw co-occurrence edges
    val e = Graph.cooccurEdges(Tables.documents(spark, sfDir).select("doc_id", "text"))
      .select("src", "dst").collect().map(x => (x.getString(0), x.getString(1)))
    val deg = e.groupBy(_._1).view.mapValues(_.length).toMap
    assert(m == e.length)
    assert(sx == e.map(p => deg(p._1).toLong).sum)
    assert(sx2 == e.map(p => { val d = deg(p._1).toLong; d * d }).sum)
    assert(sxy == e.map(p => deg(p._1).toLong * deg(p._2).toLong).sum)
    // symmetric edge list: swapping endpoints leaves every moment unchanged
    assert(e.map(p => deg(p._2).toLong).sum == sx)
  }

  test("graph_modularity: Q in [-0.5, 1]; moments reconcile with the LPA assignment") {
    val r = Graph.queries("graph_modularity")(spark, sfDir).collect()
    assert(r.length == 1)
    val (nc, w, intra, s2) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3))
    val q = r(0).getDouble(4)
    assert(q >= -0.5 - 1e-9 && q <= 1.0 + 1e-9)
    assert(intra <= w && s2 >= 0)
    // independent recomputation from the raw pair graph + the lp query
    val e = Graph.nearDupEdges(spark, sfDir)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val lab = Graph.queries("graph_lp_communities")(spark, sfDir)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(w == e.map(_._3).sum)
    assert(intra == e.filter(t => lab(t._1) == lab(t._2)).map(_._3).sum)
    val strength = e.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val sc = strength.groupBy(kv => lab(kv._1)).view.mapValues(_.values.sum)
    assert(nc == sc.size)
    assert(s2 == sc.values.map(v => v * v).sum)
    val expQ = intra.toDouble / w - s2.toDouble / (w.toDouble * w.toDouble)
    assert(math.abs(q - math.rint(expQ * 1e6) / 1e6) < 1e-9)
  }

  test("graph_hits equals a driver-side BigInt power iteration, bit-for-bit") {
    val got = Graph.queries("graph_hits")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    Graft.releaseCaches(spark)
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val edges = texts.flatMap { t =>
      t.toLowerCase.split("\\s+").toSeq.sliding(2)
        .filter(p => p.length == 2 && p(0) != p(1)).map(p => (p(0), p(1)))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nodes = edges.keys.flatMap(e => Seq(e._1, e._2)).toSet
    val S = BigInt(Graph.Scale)
    var h = nodes.map(_ -> S).toMap
    var a = Map.empty[String, BigInt]
    for (_ <- 1 to Graph.HitsRounds) {
      val ar = edges.toSeq.groupBy(_._1._2).map { case (d, es) =>
        d -> es.map { case ((s0, _), w) => h.getOrElse(s0, BigInt(0)) * w }.sum }
      val am = ar.values.max
      a = ar.map { case (k, v) => k -> v * S / am }
      val hr = edges.toSeq.groupBy(_._1._1).map { case (s0, es) =>
        s0 -> es.map { case ((_, d), w) => a.getOrElse(d, BigInt(0)) * w }.sum }
      val hm = hr.values.max
      h = hr.map { case (k, v) => k -> v * S / hm }
    }
    assert(nodes.nonEmpty && got.keySet == nodes)
    nodes.foreach { nd =>
      val (gh, ga) = got(nd)
      assert(BigInt(gh) == h.getOrElse(nd, BigInt(0)), s"$nd hub")
      assert(BigInt(ga) == a.getOrElse(nd, BigInt(0)), s"$nd authority")
    }
  }

  test("hits on an empty edge list returns an empty frame, not a driver NPE") {
    val e = spark.range(0).selectExpr("'' AS src", "'' AS dst", "id AS w")
    assert(Graph.hits(e).count() == 0L)
  }
}
