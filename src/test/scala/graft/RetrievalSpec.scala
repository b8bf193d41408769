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

  test("retrieval_rrf: per-term fused ranking is bounded, descending, consecutive") {
    import graft.operators.Retrieval
    val rows = q("retrieval_rrf").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(rows.nonEmpty)
    val bound = 2.0 / (Retrieval.RrfK + 1)
    rows.foreach { case (_, _, rrf, _) => assert(rrf > 0.0 && rrf <= bound) }
    rows.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to g.length))
      assert(sorted.map(-_._3).toSeq == sorted.map(-_._3).sorted.toSeq,
        "rrf must be non-increasing in rank")
      assert(g.map(_._2).distinct.length == g.length, "one row per doc per term")
    }
  }

  test("dup_exact_spans: planted-overlap adversary corpus matches brute force") {
    val s2 = spark
    import s2.implicits._
    val L = Substring.ExactLen // 20
    // filler 20-grams are globally unique: every 5-char token carries the
    // doc letter plus a LETTER-OFFSET counter (a plain 0-based counter
    // would end every doc's filler with the same "0007" and extend the
    // planted spans by 4 shared chars)
    def filler(c: Char, n: Int): String =
      (0 until n).map(i => f"$c${c.toInt * 31 + i}%04d").mkString
    val p30 = "QWERTYUIOPASDFGHJKLZXCVBNMQWER" // 30 shared chars -> one 30-span
    val p20 = "INNERREPEATINNERREPE" // 20 chars, repeated WITHIN doc 5
    val p19 = "NINETEENCHARSHARED0" // 19 shared chars -> BELOW grain, no span
    val p60 = (('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '9')).mkString.take(60)
    val docs = Seq(
      (1L, filler('q', 8) + p30 + filler('b', 8)),
      (2L, filler('c', 8) + p30 + filler('d', 8)),
      (3L, filler('e', 8) + p19 + filler('f', 8)),
      (4L, filler('g', 8) + p19 + filler('h', 8)),
      (5L, filler('i', 8) + p20 + filler('j', 8) + p20 + filler('k', 8)),
      (6L, filler('l', 8) + p60 + filler('m', 8)), // 41 overlapping dup windows
      (7L, filler('n', 8) + p60 + filler('o', 8)), //   must chain-merge to ONE span
      (8L, filler('p', 16)) // fully unique doc: absent from the output
    ).map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
    val dir = java.nio.file.Files.createTempDirectory("exact_spans").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Substring.queries("dup_exact_spans")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // character-grain brute force: count every L-gram, merge duplicated
    // windows per doc
    val grams = docs.flatMap { case (id, t, _, _, _) =>
      (0 to t.length - L).map(i => (t.substring(i, i + L), id, i)) }
    val counts = grams.groupBy(_._1).view.mapValues(_.size).toMap
    val want = grams.filter(g => counts(g._1) >= 2).groupBy(_._2)
      .view.mapValues { gs =>
        var spans = List.empty[(Int, Int)]
        for (s0 <- gs.map(_._3).sorted) spans = spans match {
          case (a, b) :: rest if s0 <= b => (a, math.max(b, s0 + L)) :: rest
          case _ => (s0, s0 + L) :: spans
        }
        val lens = spans.map { case (a, b) => (b - a).toLong }
        (lens.sum, lens.size.toLong, lens.max)
      }.toMap
    assert(got === want)
    assert(got(1L) == ((30L, 1L, 30L)) && got(2L) == ((30L, 1L, 30L)))
    assert(!got.contains(3L) && !got.contains(4L) && !got.contains(8L))
    assert(got(5L) == ((40L, 2L, 20L)), "within-doc repeat must count")
    assert(got(6L) == ((60L, 1L, 60L)) && got(7L) == ((60L, 1L, 60L)),
      "overlapping windows must chain-merge to one maximal span")
    // provenance pairs on the same corpus: (6,7) share 41 distinct grams
    // of p60, (1,2) the 11 grams of p30; no other cross-doc pair exists
    val pairs = Substring.queries("dup_span_pairs")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs == Map((6L, 7L) -> 41L, (1L, 2L) -> 11L), s"pairs: $pairs")
  }

  test("dup_span_pairs_lossless adversary: the df-capped version provably " +
    "misses the boilerplate-only pair; the prefix-filtered one does not") {
    val s2 = spark
    import s2.implicits._
    val L = Substring.ExactLen
    def filler(c: Char, n: Int): String =
      (0 until n).map(i => f"$c${c.toInt * 31 + i}%04d").mkString
    // one 25-char span shared by TEN docs: each of its 6 grams has df = 10
    // > PairDfCap = 8, so the capped query drops every shared gram and
    // reports NOTHING for these docs
    val boiler = "BOILERPLATE25CHARSSHARED0" // 25 chars -> 6 L-grams
    assert(boiler.length == 25)
    val nDocs = 10
    val docs = (1 to nDocs).map { i =>
      val c = ('a' + i).toChar
      (i.toLong, filler(c, 6) + boiler + filler(('A' + i).toChar, 6))
    } :+ (99L, filler('z', 16)) // unique doc, appears in no pair
    val dir = java.nio.file.Files.createTempDirectory("lossless_pairs").toString
    docs.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val raw = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")

    val capped = Substring.spanPairsCapped(raw).collect()
    assert(capped.isEmpty,
      s"capped query must miss the df>${Substring.PairDfCap} pair: " +
        capped.take(3).mkString(","))

    val lossless = Substring
      .spanPairsLossless(raw, Substring.MinSharedGrams).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    Graft.releaseCaches(spark)
    val expectedPairs = (for {
      a <- 1 to nDocs; b <- (a + 1) to nDocs
    } yield (a.toLong, b.toLong) -> (boiler.length - L + 1).toLong).toMap
    assert(lossless == expectedPairs,
      s"lossless must find ALL ${expectedPairs.size} pairs with " +
        s"n_shared = ${boiler.length - L + 1}; got ${lossless.size}")
  }

  test("dup_span_pairs_lossless equals brute force on the real fixture slice") {
    val slice = Tables.documents(spark, sfDir)
      .where(col("doc_id") % Substring.ProvSliceMod === 0)
      .select("doc_id", "text")
    val got = Substring
      .spanPairsLossless(slice, Substring.MinSharedGrams).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    Graft.releaseCaches(spark)
    // driver-side brute force over the slice (small by construction)
    val L = Substring.ExactLen
    val texts = slice.collect().map(r => r.getLong(0) -> r.getString(1))
    val sets = texts.map { case (id, t) =>
      id -> (0 to t.length - L).map(i => t.substring(i, i + L)).toSet
    }
    val want = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      n = (sa intersect sb).size.toLong if n >= Substring.MinSharedGrams
    } yield (a, b) -> n).toMap
    assert(want.nonEmpty, "fixture slice must produce pairs (vacuous otherwise)")
    assert(got == want)
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

  test("phrase_search agrees with a sequential sliding-window count") {
    val phrase = Retrieval.queries("phrase_search")(spark, sfDir).collect()
    Graft.releaseCaches(spark)
    assert(phrase.nonEmpty)
    val words = phrase.head.getString(1).split(" ")
    assert(words.length == 3)
    // brute-force reference: count 3-gram occurrences of the phrase
    val expect = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map { r =>
        val t = r.getString(1).toLowerCase.split("\\s+")
        val hits = t.sliding(3).zipWithIndex
          .filter(_._1.toSeq == words.toSeq).map(_._2).toSeq
        r.getLong(0) -> hits
      }
      .filter(_._2.nonEmpty).toMap
    val got = phrase.map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (id, (n, first)) =>
      assert(n == expect(id).size && first == expect(id).min)
    }
  }

  test("decontaminate removes exactly the planted benchmark span") {
    import spark.implicits._
    import graft.operators.Substring
    val leak = "0123456789abcdefghijklmnopqrs" // 29 chars >= ExactLen
    val docs = Seq(
      (1L, s"XXXX${leak}YYYY" + "z" * 20),  // leak mid-doc
      (2L, "clean text only " + "w" * 30),  // untouched
      (3L, leak + " tail stays here......") // leak at doc start
    ).toDF("doc_id", "text")
    val bg = Substring.benchmarkGrams(Seq((99L, leak)).toDF("doc_id", "text"))
    val out = Substring.decontaminate(docs, bg).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("XXXX" + "YYYY" + "z" * 20, 29L)))
    assert(out(2L) == (("clean text only " + "w" * 30, 0L)))
    assert(out(3L) == ((" tail stays here......", 29L)))
  }

  test("retrieval_ndcg: ideal dominates, ndcg in (0,1], driver-side recompute agrees") {
    val rows = q("retrieval_ndcg").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dcg, idcg, ndcg) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(idcg >= dcg - 1e-9, "ideal ranking maximizes DCG")
      assert(ndcg > 0.0 && ndcg <= 1.0 + 1e-9)
    }
    // independent recompute from the scores relation for every term
    val scores = q("bm25_scores").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2).toInt, r.getDouble(4)))
    rows.foreach { r =>
      val term = r.getString(0)
      val ts = scores.filter(_._1 == term)
      def dcgOf(ranked: Seq[Int]): Double =
        ranked.take(10).zipWithIndex.map { case (tf, i) =>
          math.round(tf / (math.log(i + 2.0) / math.log(2.0)) * 1e6)
        }.sum / 1e6
      val sys = ts.sortBy(x => (-x._4, x._2)).map(_._3)
      val ideal = ts.sortBy(x => (-x._3, x._2)).map(_._3)
      assert(math.abs(r.getDouble(1) - dcgOf(sys)) < 1e-5, s"$term dcg")
      assert(math.abs(r.getDouble(2) - dcgOf(ideal)) < 1e-5, s"$term idcg")
    }
  }

  test("cdc chunks: lossless reconstruction and content-defined shift robustness") {
    import spark.implicits._
    // reconstruction: per doc, chunks are contiguous and concatenate to text
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val byDoc = Retrieval.cdcChunks(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    assert(byDoc.keySet == texts.keySet, "every doc must chunk")
    byDoc.foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._2 == 1L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._2 == a._2 + a._3, s"gap in doc $id")
        case _ =>
      }
      assert(sorted.map(_._4).mkString == texts(id), s"doc $id reconstruction")
    }
    // the CDC property fixed-stride windows lack: prepend an edit and the
    // chunks beyond the edit window keep their exact boundaries/content
    val base = texts.values.maxBy(_.length)
    val edited = "zq rv " + base
    val two = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val ch = Retrieval.cdcChunks(two).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3))).groupBy(_._1)
    val c1 = ch(1L).sortBy(_._2).map(_._3)
    val c2 = ch(2L).sortBy(_._2).map(_._3)
    val commonSuffix = c1.reverse.zip(c2.reverse).takeWhile { case (a, b) => a == b }.length
    assert(c1.length > 4, "fixture doc must produce several chunks")
    assert(commonSuffix >= c1.length - 4,
      s"edit must only disturb leading chunks: $commonSuffix of ${c1.length} shared")
  }

  test("retrieval_eval: metric ranges and relevance nontriviality") {
    val rows = Retrieval.queries("retrieval_eval")(spark, sfDir).collect()
    assert(rows.length == 4) // one per query term
    rows.foreach { r =>
      val (nRanked, nRel) = (r.getLong(1), r.getLong(2))
      val (mrr, p5, ap) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(nRel <= nRanked)
      assert(mrr >= 0.0 && mrr <= 1.0)
      assert(p5 >= 0.0 && p5 <= 1.0)
      assert(ap >= 0.0 && ap <= 1.0)
      // if anything is relevant the first relevant doc gives mrr > 0
      if (nRel > 0) assert(mrr > 0.0 && ap > 0.0)
      // nontriviality: relevance must not equal the retrieved set, or
      // every metric saturates at 1 and the oracle proves nothing
      assert(nRel < nRanked, "tf threshold made every retrieved doc relevant")
    }
  }

  test("rag_hybrid_fusion: rank laws, rrf recompute, both legs contribute") {
    import graft.operators.Similarity
    val rows = q("rag_hybrid_fusion").collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until Similarity.QuerySet).toSet,
      "one block per query doc")
    byQ.foreach { case (_, rs) =>
      val ranked = rs.sortBy(_.getInt(5))
      assert(ranked.map(_.getInt(5)).toSeq == (1 to ranked.length))
      // rrf is exactly the rounded rational of the two integer ranks
      ranked.foreach { r =>
        val want = BigDecimal(
          1.0 / (Retrieval.RrfK + r.getInt(2)) + 1.0 / (Retrieval.RrfK + r.getInt(3)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getDouble(4) == want, s"rrf mismatch: $r")
      }
      // fused order is non-increasing in rrf with cand_id tiebreak
      val pairs = ranked.map(r => (r.getDouble(4), r.getLong(1))).toSeq
      assert(pairs.sliding(2).forall {
        case Seq((s1, c1), (s2, c2)) => s1 > s2 || (s1 == s2 && c1 < c2)
        case _ => true
      })
    }
    // nontriviality: the fusion must not collapse to either single leg —
    // somewhere the two legs disagree enough that the fused top-TopK set
    // differs from the semantic-only top-TopK (else the lexical leg is
    // dead weight and the query proves nothing)
    val semOnly = rows.filter(r => r.getInt(2) <= Retrieval.TopK)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fused = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fused != semOnly, "fused top-k equals the semantic leg everywhere")
    // both legs' best candidates reach the fused list somewhere
    assert(rows.exists(_.getInt(2) == 1), "no semantic #1 made the fused list")
    assert(rows.exists(_.getInt(3) == 1), "no lexical #1 made the fused list")
  }
}
