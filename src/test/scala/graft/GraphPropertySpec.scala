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
}
