package graft

import org.apache.spark.sql.functions._
import graft.operators.UnigramLm

/** Unigram-LM tokenizer correctness: structural invariants of the Viterbi
  * decode, and a pure-Scala brute-force enumeration cross-check — the
  * independent referee between the engine's bounded-round DP and the
  * oracle's recursive-CTE enumeration (all three must agree on every
  * fixture word).
  */
class UnigramLmSpec extends SparkSpecBase {

  private lazy val trained = {
    val (piecesDf, wordsDf) = UnigramLm.train(spark, sfDir)
    val pieces = piecesDf.select("piece", "logp9").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = wordsDf.select("word", "score9", "np", "ps").collect()
    val segs = rows.map(r => r.getString(0) -> r.getSeq[String](3)).toMap
    val scores = rows
      .map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    (pieces, segs, scores)
  }

  test("every Viterbi segmentation concatenates back to its word, from known pieces") {
    val (pieces, segs, _) = trained
    assert(segs.nonEmpty, "fixture must train a non-empty vocabulary")
    segs.foreach { case (w, ps) =>
      assert(ps.mkString("") == w, s"$w segmented to $ps")
      ps.foreach(p => assert(pieces.contains(p), s"unknown piece $p in $w"))
      assert(ps.forall(_.length <= UnigramLm.MaxPieceLen))
    }
  }

  test("path scores are the exact integer sum of their pieces' fixed-point log-probs") {
    val (pieces, segs, scores) = trained
    segs.foreach { case (w, ps) =>
      val (s9, np) = scores(w)
      assert(np == ps.size, s"$w piece count")
      assert(s9 == ps.map(pieces).sum, s"$w score mismatch")
    }
  }

  test("the DP answer equals brute-force enumeration under the global tie-break key") {
    val (pieces, segs, _) = trained
    // enumerate ALL segmentations of each word over the trained inventory
    def enum(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(UnigramLm.MaxPieceLen, w.length)).flatMap { l =>
        val p = w.take(l)
        if (pieces.contains(p)) enum(w.drop(l)).map(p +: _) else Seq.empty
      }
    segs.foreach { case (w, got) =>
      // global key: max score9, then fewest pieces, then the reversed
      // piece-length sequence largest-first (the DP's backtrack order)
      val best = enum(w).maxBy { ps =>
        (ps.map(pieces).sum, -ps.size,
          ps.reverse.map(p => ('0' + p.length).toChar).mkString)
      }
      assert(got == best, s"$w: DP gave $got, enumeration gives $best")
    }
  }

  test("EM re-estimation never decreases the paths' complete-data likelihood (Gibbs)") {
    val r = UnigramLm.queries("ulm_em_gain")(spark, sfDir).head()
    assert(r.getDouble(2) >= 0.0, s"EM gain must be non-negative: $r")
    assert(r.getDouble(2) > 0.0,
      "fixture seed counts differ from path usage, so the gain is strictly positive")
    assert(math.abs(r.getDouble(1) - r.getDouble(0) - r.getDouble(2)) < 2e-6,
      "gain must reconcile with the two likelihoods")
  }

  test("deploy encoder reproduces training segmentations and survives unseen characters") {
    import spark.implicits._
    val (pieces, words) = UnigramLm.train(spark, sfDir)
    val frozen = pieces.localCheckpoint()
    // a known fixture word must encode with its training piece count;
    // '#' never appears in the word-soup corpus, so "##" must take the
    // unk fallback: two single-char penalty pieces
    val w = words.select("word", "ps").collect().head
    val docs = Seq((1L, w.getString(0)), (2L, "##")).toDF("doc_id", "text")
    val enc = UnigramLm.encodeDocs(docs, frozen)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(enc(1L) == w.getSeq[String](1).size.toLong,
      "known word must reproduce its training segmentation")
    assert(enc(2L) == 2L, "unseen chars must each become one unk piece")
  }

  test("empty corpus degenerates to empty artifacts, not a crash") {
    val empty = spark.range(0).selectExpr("'' as text", "id as doc_id")
    val tmp = java.nio.file.Files.createTempDirectory("ulm0").toString
    empty.write.parquet(s"$tmp/documents.parquet")
    // the other tables aren't read by train(); documents is enough
    val (pieces, words) = UnigramLm.train(spark, tmp)
    assert(pieces.count() == 0L)
    assert(words.count() == 0L)
  }
}
