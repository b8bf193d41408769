package graft

import org.apache.spark.sql.functions._

import graft.operators.BpeTrainer

/** BPE trainer contracts: equality with an independent sequential
  * implementation, greedy-overlap semantics, and the Sep-absence
  * precondition on the fixture corpus.
  */
class BpeSpec extends SparkSpecBase {

  /** Independent sequential BPE on (word -> count), list-based (no string
    * folds) — the reference the relational trainer must reproduce.
    */
  private def refBpe(wc: Map[String, Long], rounds: Int):
      (Seq[(Int, String, String, Long)], Map[String, Seq[String]]) = {
    var words: Map[String, (Long, Seq[String])] =
      wc.map { case (w, c) => w -> (c, w.map(_.toString)) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    for (r <- 1 to rounds if !exhausted) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.values.foreach { case (c, syms) =>
        syms.zip(syms.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
      }
      if (counts.isEmpty) { exhausted = true }
      else {
      val ((a, b), n) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      merges += ((r, a, b, n))
      words = words.map { case (w, (c, syms)) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2 // greedy left-to-right, non-overlapping
          } else { out += syms(i); i += 1 }
        }
        w -> (c, out.toSeq)
      }
      }
    }
    (merges.toSeq, words.map { case (w, (_, syms)) => w -> syms })
  }

  test("degenerate corpus (all single-symbol words) returns an EMPTY merges table") {
    val s2 = spark
    import s2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe_degen").toString
    Seq((1L, "a b c", "en", "web", 5L), (2L, "d e a", "en", "web", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val (merges, words) = BpeTrainer.train(spark, dir)
    assert(merges.collect().isEmpty, "no pairs exist, merges must be empty")
    assert(merges.columns.toSeq === Seq("round", "a", "b", "merged", "support"))
    assert(words.count() == 5) // the vocabulary itself survives untouched
  }

  test("fixture training equals the sequential reference, round for round") {
    val gotMerges = BpeTrainer.queries("bpe_merges")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4))).toSeq
    val gotSegs = BpeTrainer.queries("bpe_word_encoding")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getString(3).split("\\|", -1).toSeq).toMap
    val wc = Tables.documents(spark, sfDir).select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split("\\s+", -1)).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (wantMerges, wantSegs) = refBpe(wc, BpeTrainer.Merges)
    assert(gotMerges === wantMerges)
    assert(gotSegs === wantSegs)
    // segments always reassemble the word
    gotSegs.foreach { case (w, segs) => assert(segs.mkString == w) }
  }

  test("greedy left-to-right non-overlap: aaaa with pair (a,a) -> aa|aa") {
    val s2 = spark
    import s2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe_overlap").toString
    // 'aaaa' dominates so (a,a) is the first merge; round 2 then merges
    // (aa,aa) — both rounds exercise the overlap semantics
    Seq((1L, "aaaa aaaa aaaa zz"), (2L, "aaaa aaa"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val segs = BpeTrainer.queries("bpe_word_encoding")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    val wc = Map("aaaa" -> 4L, "aaa" -> 1L, "zz" -> 1L)
    val (wantMerges, wantSegs) = refBpe(wc, BpeTrainer.Merges)
    segs.foreach { case (w, s) => assert(s.split("\\|", -1).toSeq == wantSegs(w),
      s"$w -> $s vs ${wantSegs(w)}") }
    assert(wantSegs("aaaa").head == "aaaa" || wantSegs("aaaa") == Seq("aa", "aa")
      || true) // shape asserted via equality above; this documents intent
  }

  test("precondition: the Sep control char does not occur in the corpus") {
    val n = Tables.documents(spark, sfDir)
      .where(col("text").contains(BpeTrainer.Sep)).count()
    assert(n == 0L, "U+001F appears in the fixture corpus — Sep must change")
  }

  test("greedy encoding: reconstruction, inventory membership, longest-match law") {
    val rows = BpeTrainer.queries("wp_greedy_encoding")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(3).split("\\|").toSeq)).toMap
    assert(rows.nonEmpty)
    // piece inventory recomputed independently: merge outputs + alphabet
    val (merges, words) = BpeTrainer.train(spark, sfDir)
    val inventory = merges.collect().map(_.getString(3)).toSet ++
      words.collect().flatMap(_.getString(0).toCharArray.map(_.toString))
    rows.foreach { case (w, pieces) =>
      assert(pieces.mkString == w, s"pieces must concatenate to '$w': $pieces")
      pieces.foreach(p => assert(inventory.contains(p),
        s"piece '$p' of '$w' not in the trained inventory"))
      // greedy law: at each position the emitted piece is the LONGEST
      // inventory piece matching there
      var pos = 0
      pieces.foreach { p =>
        val longest = (1 to (w.length - pos)).reverse
          .find(l => inventory.contains(w.substring(pos, pos + l))).get
        assert(p.length == longest,
          s"'$w'@$pos: emitted '${p}' but longest match has length $longest")
        pos += p.length
      }
    }
  }

  test("bpe_fertility: bounds and conservation against bpe_doc_tokens") {
    val bySrc = BpeTrainer.queries("bpe_fertility")(spark, sfDir).collect()
    Graft.releaseCaches(spark)
    assert(bySrc.nonEmpty)
    bySrc.foreach { r =>
      // a word splits into >= 1 subwords; a subword has >= 1 chars
      assert(r.getDouble(3) >= 1.0, s"fertility < 1 for ${r.getString(0)}")
      assert(r.getDouble(4) >= 1.0, s"chars/subword < 1 for ${r.getString(0)}")
    }
    val byDoc = BpeTrainer.queries("bpe_doc_tokens")(spark, sfDir).collect()
    Graft.releaseCaches(spark)
    // conservation: per-source word/subword totals == per-doc totals
    assert(bySrc.map(_.getLong(1)).sum == byDoc.map(_.getLong(1)).sum)
    assert(bySrc.map(_.getLong(2)).sum == byDoc.map(_.getLong(2)).sum)
  }
}
