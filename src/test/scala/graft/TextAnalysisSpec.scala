package graft

import org.apache.spark.sql.functions._

import graft.operators.{TextAnalysis, TextHash}

/** Text-analysis pack: scoring mechanics on crafted strings (the fixture
  * vocabulary is synthetic, so language recovery is exercised here, not
  * against the fixture's `lang` column).
  */
class TextAnalysisSpec extends SparkSpecBase {

  test("curriculum: pos is a permutation, bands are quality-monotone quartiles") {
    import graft.operators.TextAnalysis
    val rows = TextAnalysis.queries("curriculum_order")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val n = rows.length
    assert(n > 0)
    assert(rows.map(_._3).sorted.toSeq == (1L to n).toSeq, "pos must be a permutation")
    val bandSizes = rows.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bandSizes.keySet == (0 until TextAnalysis.CurriculumBands).toSet)
    bandSizes.values.foreach(sz =>
      assert(math.abs(sz - n / TextAnalysis.CurriculumBands) <= 1,
        s"quantile bands must be balanced: $bandSizes"))
    // quality monotone across bands (ties at a boundary may straddle)
    val q = TextAnalysis.queries("text_stats")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(6)).toMap
    val byBand = rows.groupBy(_._2).view.mapValues(_.map(t => q(t._1))).toMap
    for (b <- 0 until TextAnalysis.CurriculumBands - 1)
      assert(byBand(b).min >= byBand(b + 1).max,
        s"band $b should be uniformly >= band ${b + 1} in quality")
    // positions sort by (band, md5 order): deterministic across runs
    val again = TextAnalysis.queries("curriculum_order")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.toSeq == again.toSeq)
  }

  private def df(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("langid picks the language with the most signature-word hits") {
    val out = TextAnalysis.langid(df(
      1L -> "the cat is on a mat and the dog is here",
      2L -> "der hund und die katze das ist gut",
      3L -> "le chat et la souris est les amis",
      4L -> "el perro y los gatos las casas es",
      5L -> "xyzzy plugh quux"))
      .collect().map(r => r.getLong(0) -> r.getString(r.fieldIndex("lang_pred"))).toMap
    assert(out === Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "es", 5L -> "und"))
  }

  test("langid tie-break follows fixed priority order") {
    // one es hit + one fr hit -> tie; es wins (es before fr in priority).
    val out = TextAnalysis.langid(df(1L -> "los le")).collect()
    assert(out(0).getString(out(0).fieldIndex("lang_pred")) === "es")
    // and a de/en tie resolves to en (en first).
    val out2 = TextAnalysis.langid(df(1L -> "the der")).collect()
    assert(out2(0).getString(out2(0).fieldIndex("lang_pred")) === "en")
  }

  test("stats computes exact ratios on a crafted string") {
    val out = TextAnalysis.stats(df(1L -> "the quick, brown fox!")).collect()(0)
    def g(n: String) = out.get(out.fieldIndex(n))
    assert(g("n_chars") === 21)
    assert(g("n_tokens") === 4)   // the | quick, | brown | fox!
    assert(g("punct_ratio") === 2.0 / 21)  // ',' and '!'
    assert(g("stopword_ratio") === 1.0 / 4) // "the" ("fox!" is not a hit)
  }

  test("fingerprint is order-sensitive") {
    val out = TextAnalysis.queries("text_fingerprint")(spark, sfDir).collect()
    assert(out.map(_.getLong(1)).distinct.length > 1)
    val a = TextAnalysis.queries("text_fingerprint")(spark, sfDir).collect().toSeq
    assert(a === out.toSeq, "deterministic across runs")
  }

  test("token counts: BPE-ish regex splits punctuation off words") {
    val s = spark
    import s.implicits._
    // On the fixture, texts are pure lowercase words: counts must agree.
    val both = TextAnalysis.queries("text_token_counts")(spark, sfDir).collect()
    assert(both.forall(r => r.getInt(2) >= r.getInt(1)))
  }

  test("text_repetition matches an independent Scala recompute on the full fixture") {
    val got = TextAnalysis.queries("text_repetition")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet == docs.keySet)
    def rnd(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    docs.foreach { case (id, text) =>
      val t = text.toLowerCase.split("\\s+", -1).toSeq
      val bi = t.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val tri = t.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
      val (nTok, dupTok, topBi, dupTri) = got(id)
      assert(nTok == t.size, s"doc $id token count")
      assert(rnd((t.size - t.distinct.size).toDouble / t.size) == dupTok, s"doc $id dup_token")
      val wantTopBi = if (bi.isEmpty) 0.0
        else rnd(bi.groupBy(identity).values.map(_.size).max.toDouble / bi.size)
      assert(wantTopBi == topBi, s"doc $id top_bigram")
      val wantDupTri = if (tri.isEmpty) 0.0
        else rnd((tri.size - tri.distinct.size).toDouble / tri.size)
      assert(wantDupTri == dupTri, s"doc $id dup_trigram")
    }
  }

  test("text_repetition flags a degenerate repeated document") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("repet").toString
    Seq(
      (1L, "spam spam spam spam spam spam spam spam", "en", "a", 40L),
      (2L, "eight distinct words appear exactly once here friend", "en", "a", 50L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.queries("text_repetition")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(1L) == ((0.875, 1.0, 0.833333)), s"got ${out(1L)}")
    assert(out(2L) == ((0.0, 0.142857, 0.0)), s"got ${out(2L)}")
  }

  test("text_unigram_nll matches an independent Scala recompute on the full fixture") {
    val got = TextAnalysis.queries("text_unigram_nll")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\s+", -1).toSeq).toMap
    val cnt = docs.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = cnt.values.sum.toDouble
    def rnd(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    docs.foreach { case (id, t) =>
      // mirror the engine exactly: 6-dp terms, exact integer micro-unit
      // sum, integer half-up mean (no double division anywhere)
      val s6 = t.map(tok => math.round(rnd(-math.log(cnt(tok) / n)) * 1e6)).sum
      val want = ((2 * s6 + t.size) / (2L * t.size)).toDouble / 1e6
      val (nTok, meanNll) = got(id)
      assert(nTok == t.size)
      assert(math.abs(want - meanNll) < 1e-9, s"doc $id: want $want got $meanNll")
      assert(meanNll > 0.0)
    }
  }

  test("dsir_weights: target-domain docs score higher on average; run-stable") {
    val rows = TextAnalysis.queries("dsir_weights")(spark, sfDir).collect()
    val langs = Tables.documents(spark, sfDir).select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == langs.size)
    val (en, rest) = rows.partition(r => langs(r.getLong(0)) == "en")
    def meanPerTok(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => r.getDouble(2) / r.getLong(1)).sum / rs.length
    // the importance weight must actually separate the target domain
    assert(meanPerTok(en) > meanPerTok(rest),
      s"en ${meanPerTok(en)} !> rest ${meanPerTok(rest)}")
    // deterministic: second run is bit-identical
    val again = TextAnalysis.queries("dsir_weights")(spark, sfDir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("dsir_resample_stats: Gumbel-top-k shifts the mixture toward the " +
    "target lang; counts consistent; deterministic") {
    val rows = TextAnalysis.queries("dsir_resample_stats")(spark, sfDir).collect()
    val nCorpus = Tables.documents(spark, sfDir).count()
    val k = math.min(TextAnalysis.DsirSampleK.toLong, nCorpus)
    assert(rows.map(_.getLong(1)).sum === k, "selected counts sum to K")
    assert(rows.map(_.getLong(2)).sum === nCorpus)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2), s"${r.getString(0)}: n_sel <= n_corpus")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    val en = rows.find(_.getString(0) == "en").get
    // importance resampling toward the en target must RAISE the en share
    assert(en.getDouble(3) > en.getDouble(4),
      s"en sel_share ${en.getDouble(3)} !> corpus_share ${en.getDouble(4)}")
    val again = TextAnalysis.queries("dsir_resample_stats")(spark, sfDir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("colloc_pmi: supported pairs, PMI matches a recomputation") {
    val rows = TextAnalysis.queries("colloc_pmi")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= TextAnalysis.CollocTopK)
    import TextHash.toks
    val docs = Tables.documents(spark, sfDir)
    val n1 = docs.select(explode(toks(col("text"))).as("w")).count()
    rows.foreach { r =>
      val (cp, c1, c2) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(cp >= TextAnalysis.CollocMinCount)
      assert(cp <= math.min(c1, c2), "pair count bounded by unigram counts")
      assert(c1 <= n1 && c2 <= n1)
    }
    // ranking is by PMI descending (rounded), ties by words
    val ps = rows.map(_.getDouble(5))
    assert(ps.zip(ps.tail).forall { case (a, b) => a >= b })
  }

  test("text_bigram_nll matches an independent Scala recompute on the full fixture") {
    val got = TextAnalysis.queries("text_bigram_nll")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\s+", -1).toSeq).toMap
    val bigrams = docs.values.toSeq.flatMap(t => t.zip(t.drop(1)))
    val cPair = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cCtx = bigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val v = docs.values.flatten.toSet.size.toLong
    def rnd(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    docs.foreach { case (id, t) =>
      val bs = t.zip(t.drop(1))
      if (bs.isEmpty) assert(!got.contains(id), s"doc $id has no bigram events")
      else {
        // mirror the engine: 6-dp add-one-smoothed conditional NLL terms,
        // exact integer micro-unit sum, integer half-up mean
        val s6 = bs.map(b => math.round(rnd(-math.log(
          (cPair(b) + 1).toDouble / (cCtx(b._1) + v).toDouble)) * 1e6)).sum
        val want = ((2 * s6 + bs.size) / (2L * bs.size)).toDouble / 1e6
        val (nBi, meanNll) = got(id)
        assert(nBi == bs.size)
        assert(math.abs(want - meanNll) < 1e-9, s"doc $id: want $want got $meanNll")
      }
    }
  }
  test("char entropy: closed forms on planted strings, bounds on the fixture") {
    import spark.implicits._
    val planted = Seq((1L, "aaaa"), (2L, "abab"), (3L, "abcd"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.charEntropy(planted).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r(1L) == ((4L, 1L, 0.0)), "uniform text has zero entropy")
    assert(math.abs(r(2L)._3 - math.log(2)) < 1e-6, "two equiprobable chars -> ln 2")
    assert(math.abs(r(3L)._3 - math.log(4)) < 1e-6, "four equiprobable chars -> ln 4")
    val fix = TextAnalysis.queries("text_char_entropy")(spark, sfDir).collect()
    fix.foreach { x =>
      val (nd, h) = (x.getLong(2), x.getDouble(3))
      assert(h >= 0.0 && h <= math.log(nd.toDouble) + 1e-6,
        s"entropy $h outside [0, ln $nd]")
    }
  }

  test("gopher rules: each rule trips on its planted violator, roll-up matches") {
    import spark.implicits._
    // one doc per rule violation + one all-pass doc; tokens engineered so
    // only the targeted rule fails (word counts 20..70, mean len 4..5,
    // symbol<=0.1, alpha>=0.8, stopwords>=2)
    val pass = ("the of " + Seq.fill(23)("house").mkString(" "))           // 25 tok, mtl 4.44
    val shortDoc = "the of house house house"                              // 5 tok -> word-count fail
    val thinDoc = ("the of " + Seq.fill(23)("aa").mkString(" "))           // mtl 2.24 fail
    val symDoc = ("the of " + Seq.fill(21)("house").mkString(" ") +
      " !!!!!!!!!!!!!!!!!!!!!!!!")                                         // sym>0.1 AND alpha token "!!..." -> sym fail
    val noStop = Seq.fill(25)("house").mkString(" ")                       // 0 stopwords fail
    val docs = Seq((1L, pass), (2L, shortDoc), (3L, thinDoc), (4L, symDoc),
      (5L, noStop)).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs).collect()
      .map(x => x.getLong(0) ->
        (x.getBoolean(1), x.getBoolean(2), x.getBoolean(3), x.getBoolean(4),
          x.getBoolean(5), x.getInt(6), x.getBoolean(7))).toMap
    assert(r(1L) == ((true, true, true, true, true, 0, true)), s"all-pass doc: ${r(1L)}")
    assert(!r(2L)._1 && r(2L)._2 && r(2L)._5, s"short doc trips word count only: ${r(2L)}")
    assert(r(3L)._1 && !r(3L)._2, s"thin doc trips mean len: ${r(3L)}")
    assert(!r(4L)._3, s"symbol doc trips symbol ratio: ${r(4L)}")
    assert(r(5L)._1 && r(5L)._2 && !r(5L)._5 && !r(5L)._7,
      s"stopword-free doc trips stopword rule: ${r(5L)}")
    // fixture roll-up == recomputed from the per-doc flags; rules discriminate
    val flags = TextAnalysis.queries("quality_gopher_rules")(spark, sfDir).collect()
    val st = TextAnalysis.queries("quality_gopher_stats")(spark, sfDir).head()
    assert(st.getLong(0) == flags.length)
    assert(st.getLong(6) == flags.count(_.getBoolean(7)))
    assert(st.getLong(1) == flags.count(!_.getBoolean(1)))
    assert(st.getLong(5) == flags.count(!_.getBoolean(5)))
    assert(st.getLong(6) > 0 && st.getLong(6) < flags.length,
      "thresholds must discriminate on the fixture (some pass, some fail)")
  }

  test("unicode normalization kernels: NFC, accent strip, idempotence, nulls") {
    import graft.functions.UnicodeNormKernels._
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    // NFC composes the decomposed acute; composed input passes through
    assert(nfc(u("Cafe\u0301")).toString == "Caf\u00e9")
    assert(nfc(u("Caf\u00e9")).toString == "Caf\u00e9")
    // accent strip: marks drop, letter modifications stay
    assert(stripAccents(u("Caf\u00e9")).toString == "Cafe")
    assert(stripAccents(u("\u0104\u0106\u0118\u0141")).toString == "ACE\u0141")
    assert(stripAccents(u("\u00f8re stra\u00dfe")).toString == "\u00f8re stra\u00dfe")
    // idempotence
    val twice = nfc(nfc(u("a\u0328c\u0301")))
    assert(twice == nfc(u("a\u0328c\u0301")))
    // expression path incl. null propagation + SQL registration
    Graft.init(spark)
    val r = spark.sql(
      "SELECT graft_nfc(s), graft_strip_accents(s) FROM VALUES " +
        "('Cafe\u0301'), (CAST(NULL AS STRING)) AS t(s)").collect()
    assert(r(0).getString(0) == "Caf\u00e9" && r(0).getString(1) == "Cafe")
    assert(r(1).isNullAt(0) && r(1).isNullAt(1))
  }

  test("text_script_profile: planted slices are dominated by their script; counts partition") {
    val rows = graft.operators.TextAnalysis.queries("text_script_profile")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val (n, nl, nc, nj, ng, dom) = (r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5), r.getString(6))
      assert(nl + nc + nj + ng <= n)
      val expected = (id % 8) match {
        case 1 => "cyrillic"; case 2 => "cjk"; case 3 => "greek"; case _ => "latin"
      }
      assert(dom == expected, s"doc $id expected $expected got $dom")
      // dominance is real, not a tie artifact, on the planted slices
      if (id % 8 == 1) assert(nc > nl && nc > nj && nc > ng)
      if (id % 8 == 2) assert(nj > nl && nj > nc && nj > ng)
      if (id % 8 == 3) assert(ng > nl && ng > nc && ng > nj)
    }
    // the per-source rollup reconciles with the per-doc profile
    val mix = graft.operators.TextAnalysis.queries("script_mix_by_source")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(mix.values.sum == rows.length)
  }

  test("quality_blocklist: fractions reconcile with an independent token count; flag is exact") {
    val rows = graft.operators.TextAnalysis.queries("quality_blocklist")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val bl = graft.operators.TextAnalysis.Blocklist.toSet
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val (id, n, nb) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val toks = docs(id).toLowerCase.split("\\s+").toSeq
      assert(n == toks.length)
      assert(nb == toks.count(bl), s"doc $id blocked count")
      assert(r.getBoolean(4) == (nb.toDouble / n > graft.operators.TextAnalysis.BlockThreshold))
    }
    // both flag branches occur on the fixture (non-vacuous threshold)
    assert(rows.exists(_.getBoolean(4)) && rows.exists(!_.getBoolean(4)))
  }

  test("Kneser-Ney: probabilities form a true distribution and NLL matches a driver recompute") {
    import graft.operators.TextAnalysis
    // collect the corpus bigram stream once
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split("\\s+").toSeq))
    val bis = texts.flatMap { case (id, tt) =>
      tt.sliding(2).filter(_.length == 2).map(p => (id, p(0), p(1))) }
    val cPair = bis.groupBy(b => (b._2, b._3)).view.mapValues(_.length.toLong).toMap
    val cCtx = bis.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n1f = cPair.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1b = cPair.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n1t = cPair.size.toLong
    val contVocab = n1b.keySet
    def pkn(w1: String, w2: String): Double =
      (cPair.getOrElse((w1, w2), 0L).toDouble - 0.75).max(0.0) / cCtx(w1) +
        (0.75 * n1f(w1) / cCtx(w1)) * (n1b.getOrElse(w2, 0L).toDouble / n1t)
    // normalization law: for every context, P sums to exactly 1 over the
    // continuation vocabulary — the check that catches any formula slip
    cCtx.keys.foreach { w1 =>
      val z = contVocab.toSeq.map(w2 => pkn(w1, w2)).sum
      assert(math.abs(z - 1.0) < 1e-9, s"sum_w2 P_KN(w2|$w1) = $z, not 1")
    }
    // per-doc NLL matches the query (same rounding ladder)
    val got = TextAnalysis.queries("text_kn_bigram_nll")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val ref = bis.groupBy(_._1).map { case (id, bs) =>
      val s6 = bs.map { case (_, w1, w2) =>
        math.round(math.rint(-math.log(pkn(w1, w2)) * 1e6) / 1e6 * 1e6) }.sum
      id -> ((bs.size.toLong, ((2 * s6 + bs.size) / (2L * bs.size)).toDouble / 1e6))
    }
    assert(got.keySet == ref.keySet && got.nonEmpty)
    got.foreach { case (id, (n, m)) =>
      assert((n, m) == ref(id), s"doc $id: got ($n, $m) want ${ref(id)}") }
  }
}
