package graft

import org.apache.spark.sql.functions._

import graft.operators.{Retrieval, Substring}

/** Retrieval + substring-dedup invariants at sf0.001 — properties the
  * DuckDB hash-compare can't express (coverage laws, ranking consistency,
  * reconstruction).
  */
class RetrievalSpec extends SparkSpecBase {

  private def q(name: String) = Retrieval.queries(name)(spark, sfDir)
  private def qs(name: String) = Substring.queries(name)(spark, sfDir)

  test("bm25: scores positive, df<=N respected, topk agrees with full table") {
    val scores = q("bm25_scores").collect()
    assert(scores.nonEmpty)
    assert(scores.forall(_.getDouble(4) > 0.0))
    val topk = q("bm25_topk").collect()
    val byTerm = topk.groupBy(_.getString(0))
    byTerm.foreach { case (term, rs) =>
      val ranked = rs.sortBy(_.getInt(3))
      assert(ranked.map(_.getInt(3)).toSeq == (1 to ranked.length))
      // the top-k really is the k best (score desc, doc_id asc) of the table
      val want = scores.filter(_.getString(0) == term)
        .sortBy(r => (-r.getDouble(4), r.getLong(1)))
        .take(ranked.length)
        .map(r => (r.getLong(1), r.getDouble(4))).toSeq
      assert(ranked.map(r => (r.getLong(1), r.getDouble(2))).toSeq == want)
    }
  }

  test("bm25 multi-term: qscore equals fixed-point sum of per-term scores") {
    val scores = q("bm25_scores").collect()
    val byDoc = scores.groupBy(_.getLong(1)).view
      .mapValues(rs => rs.map(r => math.round(r.getDouble(4) * 1e6)).sum / 1e6)
    val top = q("bm25_query_topk").collect()
    top.foreach { r =>
      assert(math.abs(byDoc(r.getLong(0)) - r.getDouble(2)) < 1e-9)
    }
    // ordering: descending qscore, tie on doc_id
    val pairs = top.map(r => (-r.getDouble(2), r.getLong(0)))
    assert(pairs.toSeq == pairs.sortBy(identity).toSeq)
  }

  test("chunking: windows tile every doc with the declared stride/width") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chunks = q("chunk_overlap").collect()
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(byDoc.keySet == docs.keySet) // every doc chunks (min len 48 > 0)
    byDoc.foreach { case (id, cs) =>
      val n = docs(id)
      val sorted = cs.sortBy(_.getLong(1))
      // starts are 0, stride, 2*stride... strictly below n_chars
      val starts = sorted.map(_.getLong(2)).toSeq
      assert(starts == (0L until n by Retrieval.ChunkStride.toLong))
      // width: full except trailing windows clipped at doc end
      sorted.foreach { c =>
        val want = math.min(Retrieval.ChunkWidth.toLong, n - c.getLong(2))
        assert(c.getLong(3) == want && c.getString(4).length == want)
      }
      // union of windows covers [0, n): consecutive starts gap < width
      assert(starts.last + Retrieval.ChunkWidth >= n)
    }
  }

  test("dup spans: ratio law, planted duplicate detected via fixture repeats") {
    val prof = qs("dup_span_profile").collect()
    prof.foreach { r =>
      val (nSpans, nDup, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nSpans > 0 && nDup >= 0 && nDup <= nSpans)
      assert(math.abs(ratio - math.round(nDup.toDouble / nSpans * 1e6) / 1e6) < 1e-12)
    }
    // every doc long enough to span is profiled
    val nLong = Tables.documents(spark, sfDir)
      .where(col("n_chars") >= Substring.SpanLen).count()
    assert(prof.length == nLong)
    val top = qs("dup_span_top").collect()
    top.foreach { r =>
      assert(r.getString(0).length == Substring.SpanLen)
      assert(r.getLong(2) >= r.getLong(1)) // occurrences >= distinct docs
    }
    // ordering contract: n_occ desc, n_docs desc, span asc
    val keys = top.map(r => (-r.getLong(2), -r.getLong(1), r.getString(0)))
    assert(keys.toSeq == keys.sortBy(identity).toSeq)
  }
}
