package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Property tests for the graph kernels on seeded random graphs — the
  * production joins (orientedTriangles, kcoreEdges) cross-checked against
  * straightforward in-memory brute force. Fixture-independent: these hold
  * on ANY graph, which is what a library user runs them on.
  */
class GraphPropertySpec extends SparkSpecBase {

  /** Deterministic Erdős–Rényi-ish graph from a seeded LCG: node names
    * n00..n(n-1), edge (i,j) present iff lcg hash < p.
    */
  private def randomEdges(n: Int, pPct: Int, seed: Long): Set[(String, String)] = {
    def name(i: Int) = f"n$i%02d"
    var x = seed
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
    (for {
      i <- 0 until n; j <- (i + 1) until n
      if math.floorMod(next(), 100) < pPct
    } yield (name(i), name(j))).toSet
  }

  private def toDf(e: Set[(String, String)]) = {
    val s = spark
    import s.implicits._
    e.toSeq.sorted.toDF("src", "dst")
  }

  test("orientedTriangles == brute force on random graphs (3 seeds)") {
    for (seed <- Seq(7L, 42L, 1234L)) {
      val e = randomEdges(24, 25, seed)
      assert(e.nonEmpty)
      val got = Graph.orientedTriangles(toDf(e)).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      val nodes = e.flatMap(p => Seq(p._1, p._2)).toSeq.sorted.distinct
      val brute = (for {
        (a, b) <- e.toSeq; c <- nodes
        if b < c && e.contains((b, c)) && e.contains((a, c))
      } yield (a, b, c)).toSet
      assert(got == brute, s"seed $seed: got ${got.size}, brute ${brute.size}")
    }
  }

  test("kcoreEdges == brute-force peel fixpoint on random graphs (3 seeds, k=3)") {
    for (seed <- Seq(11L, 99L, 2026L)) {
      val e = randomEdges(20, 30, seed)
      val und = e ++ e.map(p => (p._2, p._1))
      // brute-force peel to the FIXPOINT
      var cur = und
      var changed = true
      while (changed) {
        val deg = cur.groupBy(_._1).view.mapValues(_.size).toMap
        val keep = deg.filter(_._2 >= 3).keySet
        val nxt = cur.filter(p => keep(p._1) && keep(p._2))
        changed = nxt != cur
        cur = nxt
      }
      // production path with enough rounds to converge on 20 nodes
      val got = Graph.kcoreEdges(toDf(und), 3, rounds = 10).collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(got == cur, s"seed $seed: got ${got.size} edges, brute ${cur.size}")
      // fixpoint sanity: every surviving node has in-core degree >= 3
      val deg = got.groupBy(_._1).view.mapValues(_.size)
      assert(deg.values.forall(_ >= 3))
    }
  }

  /** Brute-force min-hop levels via in-memory frontier expansion. */
  private def bruteBfs(seeds: Set[String], und: Set[(String, String)],
                       rounds: Int): Map[String, Int] = {
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var levels = seeds.map(_ -> 0).toMap
    var frontier = seeds
    for (r <- 1 to rounds) {
      val next = frontier.flatMap(adj.getOrElse(_, Set.empty[String]))
        .diff(levels.keySet)
      levels ++= next.map(_ -> r)
      frontier = next
    }
    levels
  }

  private def gotBfs(seeds: Seq[String], und: Set[(String, String)],
                     rounds: Int): Map[String, Int] = {
    val s = spark
    import s.implicits._
    Graph.bfsLevels(seeds.toDF("id"), toDf(und), rounds).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
  }

  test("bfsLevels == brute-force min-hop on random graphs (3 seeds, multi-source)") {
    for (seed <- Seq(5L, 77L, 321L)) {
      val e = randomEdges(24, 12, seed) // sparse → multi-hop distances
      val und = e ++ e.map(p => (p._2, p._1))
      val seeds = Seq("n00", "n13")
      val got = gotBfs(seeds, und, rounds = 4)
      val brute = bruteBfs(seeds.toSet, und, rounds = 4)
      assert(got == brute, s"seed $seed: got $got\nbrute $brute")
    }
  }

  test("bfsLevels walks a deep path exactly: level r at hop r, cut at the bound") {
    // path n00-n01-...-n19; fixture graphs are shallow (diameter ~2), so
    // the depth behavior — exact levels AND the depth cut — is proven here
    val path = (0 until 19).map(i => (f"n$i%02d", f"n${i + 1}%02d")).toSet
    val und = path ++ path.map(p => (p._2, p._1))
    val got = gotBfs(Seq("n00"), und, rounds = 6)
    val expect = (0 to 6).map(i => f"n$i%02d" -> i).toMap
    assert(got == expect)
  }
}
