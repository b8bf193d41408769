package graft

import org.apache.spark.sql.functions._

import graft.operators.Corpus

/** Corpus-prep pack invariants at sf0.001 — the properties the DuckDB
  * hash-compare can't express directly (conservation laws, determinism
  * across runs, redaction completeness).
  */
class CorpusSpec extends SparkSpecBase {

  private def q(name: String) = Corpus.queries(name)(spark, sfDir)

  test("vocab_oov_rate: planted unseen tokens are counted; fixture run is fully covered") {
    val s2 = spark
    import s2.implicits._
    // find doc_ids the salt maps to each split so the planted corpus has
    // all three, then give the non-train docs one known token and some
    // genuinely unseen ones
    val splitOf = graft.operators.Corpus.queries("corpus_split")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    def idFor(split: String): Long = splitOf.collectFirst {
      case (id, s0) if s0 == split => id
    }.get
    val (tr, va, te) = (idFor("train"), idFor("validation"), idFor("test"))
    val dir = java.nio.file.Files.createTempDirectory("oov").toString
    Seq(
      (tr, "alpha beta gamma alpha", "en", "web", 22L),
      (va, "alpha newword1 newword2", "en", "web", 23L),
      (te, "beta newword3 newword3 newword3", "en", "web", 31L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.Corpus.queries("vocab_oov_rate")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got("train") == ((4L, 0L, 3L, 0L, 0.0)))
    assert(got("validation") == ((3L, 2L, 3L, 2L, math.rint(2.0 / 3 * 1e6) / 1e6)))
    assert(got("test") == ((4L, 3L, 2L, 1L, 0.75)))
    // fixture sanity: every split measured, token totals non-vacuous
    val fx = graft.operators.Corpus.queries("vocab_oov_rate")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fx.keySet == Set("train", "validation", "test"))
    assert(fx.values.forall(_ > 0))
  }

  test("tfidf: exactly top-3 per doc, ranks 1..3, tie-break is term-asc") {
    val rows = q("tfidf_top_terms").collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.values.forall(_.length <= 3))
    byDoc.values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(5))
      assert(sorted.map(_.getInt(5)).toSeq == (1 to sorted.length))
      // rank order must agree with (tfidf desc, term asc)
      val pairs = sorted.map(r => (-r.getDouble(4), r.getString(1)))
      assert(pairs.toSeq == pairs.sortBy(identity).toSeq)
    }
  }

  test("packing: token conservation and full-chunk invariant per shard") {
    val docs = q("pack_chunks").collect()
    val chunks = q("pack_chunk_stats").collect()
    // conservation: sum of per-chunk tokens == sum of doc token counts
    assert(chunks.map(_.getLong(3)).sum == docs.map(_.getLong(2)).sum)
    // every chunk but the per-source last holds exactly ChunkTokens
    chunks.groupBy(_.getString(0)).values.foreach { cs =>
      val sorted = cs.sortBy(_.getLong(1))
      // chunk ids are contiguous from 0
      assert(sorted.map(_.getLong(1)).toSeq == (0L until sorted.length))
      sorted.dropRight(1).foreach(c => assert(c.getLong(3) == Corpus.ChunkTokens))
      assert(sorted.last.getLong(3) <= Corpus.ChunkTokens)
    }
    // per-doc chunk spans are consistent with the budget
    docs.foreach { r =>
      val (nTok, before, start, end) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(start == before / Corpus.ChunkTokens)
      assert(end == (before + nTok - 1) / Corpus.ChunkTokens)
    }
  }

  test("contamination: benchmark docs overlap 100%; ratios in [0,1]") {
    val rows = q("contamination_check").collect()
    rows.foreach { r =>
      val ratio = r.getDouble(3)
      assert(ratio >= 0.0 && ratio <= 1.0)
      if (r.getBoolean(4)) { // is_benchmark
        assert(ratio == 1.0, s"benchmark doc ${r.getLong(0)} must self-overlap fully")
        assert(!r.getBoolean(5), "benchmark members are never flagged contaminated")
      }
    }
    assert(rows.exists(_.getBoolean(4)), "fixture must contain benchmark docs")
  }

  test("pii: planted PII is fully redacted and counted") {
    val rows = q("pii_redact").collect()
    rows.foreach { r =>
      val (id, red) = (r.getLong(0), r.getString(4))
      assert(!red.matches(s".*${Corpus.EmailRe}.*"), s"doc $id leaks an email")
      assert(!red.matches(s".*${Corpus.SsnRe}.*"), s"doc $id leaks an SSN")
      assert(r.getInt(1) == (if (id % 3 == 0) 1 else 0), s"doc $id email count")
      assert(r.getInt(2) == (if (id % 5 == 0) 1 else 0), s"doc $id ssn count")
      assert(r.getInt(3) == (if (id % 4 == 0) 1 else 0), s"doc $id phone count")
      if (id % 3 == 0) assert(red.contains("<EMAIL>"))
      if (id % 5 == 0) assert(red.contains("<SSN>"))
      if (id % 4 == 0) assert(red.contains("<PHONE>"))
    }
  }

  test("sampling: deterministic across runs, stratified counts consistent") {
    val a = q("sample_hash_10pct").collect().map(_.getLong(0)).toSeq
    val b = q("sample_hash_10pct").collect().map(_.getLong(0)).toSeq
    assert(a == b, "hash sampling must be run-stable")
    val strat = q("sample_stratified").collect()
    strat.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "kept <= total per language")
    }
  }

  test("heavy hitters: descending counts, shares sum below 1") {
    val rows = q("tokens_heavy_hitters").collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val cnts = rows.map(_.getLong(1)).toSeq
    assert(cnts == cnts.sorted.reverse)
    assert(rows.map(_.getDouble(2)).sum <= 1.000001)
  }

  test("corpus shuffle: a permutation — every doc once, contiguous positions per shard") {
    val rows = q("corpus_shuffle").collect()
    val n = Tables.documents(spark, sfDir).count()
    assert(rows.length == n)
    assert(rows.map(_.getLong(0)).distinct.length == n, "each doc exactly once")
    rows.groupBy(_.getLong(1)).values.foreach { rs =>
      val pos = rs.map(_.getLong(2)).sorted.toSeq
      assert(pos == (1L to rs.length), "positions are 1..n within the shard")
    }
    // deterministic across runs
    val again = q("corpus_shuffle").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("inverted index: posting lists sorted, df matches list length") {
    val rows = q("inverted_shingle_index").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ids = r.getString(2).split(',').map(_.toLong).toSeq
      assert(r.getLong(1) == ids.length)
      assert(ids == ids.sorted)
      assert(ids.distinct.length == ids.length)
    }
  }

  test("mixture sampling: deterministic, near target fraction, small sources up-weighted") {
    val kept = q("sample_mixture").collect().map(_.getLong(0)).toSet
    val again = q("sample_mixture").collect().map(_.getLong(0)).toSet
    assert(kept == again, "md5-keyed draw must be reproducible")
    val stats = q("sample_mixture_stats").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val nTotal = stats.map(_._2).sum
    val nKept = stats.map(_._3).sum
    assert(kept.size.toLong == nKept, "stats kept counts must sum to the sample size")
    // md5 draw is uniform: realized fraction within ±10pp of the target
    val frac = nKept.toDouble / nTotal
    assert(math.abs(frac - Corpus.MixTargetFrac) < 0.1, s"fraction $frac")
    // temperature rebalancing: the smallest source's keep RATE must be at
    // least the largest source's (sqrt up-weights the tail)
    val bySize = stats.sortBy(_._2)
    assert(bySize.head._4 >= bySize.last._4,
      s"smallest source rate ${bySize.head._4} < largest ${bySize.last._4}")
    // every rate is a valid probability
    assert(stats.forall(s => s._4 >= 0.0 && s._4 <= 1.0))
  }

  test("corpus_split: partition of the corpus, ~80/10/10, disjoint from the sample key") {
    val rows = Corpus.queries("corpus_split")(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.length == nDocs)
    val bySplit = rows.groupBy(_.getString(3)).view.mapValues(_.length).toMap
    assert(bySplit.keySet == Set("train", "validation", "test"))
    // md5 keys are uniform: train fraction within [0.7, 0.9] even at 500 docs
    val trainFrac = bySplit("train").toDouble / nDocs
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train fraction $trainFrac")
    // split key is salted independently of the sampling key: identical key
    // values would correlate the draws
    rows.foreach(r => assert(r.getLong(2) >= 0 && r.getLong(2) < 1000))
  }

  test("source_cap_sample: per-source cap honored, ranks contiguous, deterministic") {
    val rows = q("source_cap_sample").collect()
    val bySrc = rows.groupBy(_.getString(0))
    val srcSizes = Tables.documents(spark, sfDir).groupBy("source")
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bySrc.foreach { case (src, rs) =>
      assert(rs.length <= Corpus.SourceCap)
      assert(rs.length == math.min(Corpus.SourceCap, srcSizes(src)))
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to rs.length))
    }
    // every fixture source is represented
    assert(bySrc.keySet == srcSizes.keySet)
    val again = q("source_cap_sample").collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("vocab: dense frequency-ranked ids; encoding decodes back to the text") {
    val vocab = q("vocab_table").collect()
    assert(vocab.map(_.getInt(0)).sorted.toSeq == (1 to vocab.length))
    // rank order agrees with (cnt desc, tok asc)
    val keys = vocab.sortBy(_.getInt(0)).map(r => (-r.getLong(2), r.getString(1)))
    assert(keys.toSeq == keys.sortBy(identity).toSeq)
    val id2tok = vocab.map(r => r.getInt(0) -> r.getString(1)).toMap
    val enc = q("vocab_encode").collect()
    val texts = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\s+").toSeq).toMap
    assert(enc.length == texts.size)
    enc.foreach { r =>
      val ids = r.getString(2).split(",").map(_.toInt).toSeq
      assert(ids.length == r.getLong(1))
      assert(ids.map(id2tok) == texts(r.getLong(0)), s"doc ${r.getLong(0)} mismatch")
    }
  }

  test("plans: contamination benchmark side broadcast; pii stays map-only") {
    val contamPlan = Corpus.queries("contamination_check")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(contamPlan.contains("BroadcastHashJoin"),
      "benchmark shingle set must broadcast, not shuffle")
    val piiPlan = Corpus.queries("pii_redact")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!piiPlan.contains("Exchange") || piiPlan.indexOf("Exchange") >
      piiPlan.indexOf("Sort"), // only the output orderBy may exchange
      "redaction must not shuffle before the final sort")
  }

  test("sample_weighted: biased toward heavy docs, ranked, deterministic") {
    val sample = q("sample_weighted").collect()
    assert(sample.length == Corpus.WeightedK)
    assert(sample.map(_.getInt(0)).toSeq == (1 to Corpus.WeightedK))
    // priorities are ln(u)/w ≤ 0 and non-increasing down the ranking
    val pris = sample.map(_.getDouble(3))
    assert(pris.forall(_ <= 0.0))
    assert(pris.zip(pris.tail).forall { case (a, b) => a >= b })
    // w = n_chars ⇒ the sample must skew heavier than the corpus
    val sampleMean = sample.map(_.getLong(2)).sum.toDouble / sample.length
    val corpusMean = Tables.documents(spark, sfDir)
      .agg(org.apache.spark.sql.functions.avg("n_chars")).head().getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean ≤ corpus mean $corpusMean")
    assert(sample.map(_.toSeq).toSeq ==
      q("sample_weighted").collect().map(_.toSeq).toSeq)
  }

  test("batch_padding_efficiency: bucketing never increases waste; accounting reconciles") {
    val rows = q("batch_padding_efficiency").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, tot, nw, bw, cut) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))
      assert(n > 0 && tot > 0 && nw >= 0 && bw >= 0)
      // sorting by length within a shard can only tighten batches
      assert(bw <= nw, s"bucketed $bw > naive $nw")
      assert(cut >= 0.0 && cut <= 1.0)
      // padded total = useful + waste >= useful
      assert(tot + nw >= tot && tot + bw >= tot)
    }
    // the fixture's length spread must make bucketing actually win somewhere
    assert(rows.exists(_.getDouble(5) > 0.0))
  }

  test("split_firewall: exactly the train side of every cross-split near-dup pair") {
    val fw = q("split_firewall").collect().map(_.getLong(0)).toSet
    val expect = q("split_leakage").collect().flatMap { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (sa, sb) = (r.getString(2), r.getString(3))
      (if (sa == "train" && sb != "train") Seq(a) else Nil) ++
        (if (sb == "train" && sa != "train") Seq(b) else Nil)
    }.toSet
    Graft.releaseCaches(spark)
    assert(fw == expect,
      s"extra: ${(fw -- expect).take(3)}; missing: ${(expect -- fw).take(3)}")
  }

  test("split_leakage: one row per near-dup pair, splits agree with corpus_split") {
    val rows = q("split_leakage").collect()
    val nPairs = graft.operators.Dedup.minhashPairs(spark, sfDir).count()
    Graft.releaseCaches(spark)
    assert(rows.length == nPairs && rows.nonEmpty)
    val splitOf = q("corpus_split").collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    rows.foreach { r =>
      assert(r.getString(2) == splitOf(r.getLong(0)))
      assert(r.getString(3) == splitOf(r.getLong(1)))
      assert((r.getInt(4) == 1) == (r.getString(2) != r.getString(3)))
    }
  }

  test("pii_spans: every region extracts to a full PII match; counts equal pii_redact") {
    val spans = Corpus.queries("pii_spans")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    assert(spans.nonEmpty)
    val redact = Corpus.queries("pii_redact")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    val byKind = spans.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byKind("email") == redact.values.map(_._1).sum,
      "one email region per regex match")
    assert(byKind("ssn") == redact.values.map(_._2).sum)
    assert(byKind("phone") == redact.values.map(_._3).sum)
    // the offsets really point at PII: extract each region and match fully
    val res = Map(
      "email" -> ("^" + Corpus.EmailRe + "$").r,
      "ssn" -> ("^" + Corpus.SsnRe + "$").r,
      "phone" -> ("^" + Corpus.PhoneRe + "$").r)
    val docsPii = graft.Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.expr(
          "concat(text, " +
            "CASE WHEN doc_id % 3 = 0 THEN concat(' contact user', CAST(doc_id AS STRING), '@mail.example.com') ELSE '' END, " +
            "CASE WHEN doc_id % 4 = 0 THEN concat(' call +1-555-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0')) ELSE '' END, " +
            "CASE WHEN doc_id % 5 = 0 THEN concat(' ssn 123-45-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0')) ELSE '' END)")
          .as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    spans.foreach { case (id, kind, start, len) =>
      val sub = docsPii(id).substring(start - 1, start - 1 + len.toInt)
      assert(res(kind).findFirstIn(sub).contains(sub),
        s"doc $id $kind region [$start,+$len) = '$sub' is not a full match")
    }
  }

  test("piiSpansFrom boundary: local part of exactly EmailMaxLookback chars " +
    "is found; anchored scan == all-positions scan") {
    val s2 = spark
    import s2.implicits._
    import Corpus.{EmailMaxLookback, PiiMaxLen}
    // zero-margin email: local + '@' + minimal 4-char domain == PiiMaxLen
    val zeroMargin = ("a" * EmailMaxLookback) + "@m.ab"
    assert(zeroMargin.length == PiiMaxLen)
    val docs = Seq(
      (1L, s"hello $zeroMargin world"),
      // local one past the lookback: the window can't fit the full email,
      // so the leftmost surviving start is one char in — both scans must
      // agree on that too
      (2L, ("b" * (EmailMaxLookback + 1)) + "@m.ab tail"),
      (3L, "no pii of any kind"),
      (4L, "ssn 123-45-6789 then +1-555-0042 end")
    ).toDF("doc_id", "t")
    val got = Corpus.piiSpansFrom(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3),
        r.getLong(4))).toSet
    // brute-force all-positions oracle with the identical probe window
    val res = Map("email" -> Corpus.EmailRe, "ssn" -> Corpus.SsnRe,
      "phone" -> Corpus.PhoneRe).view.mapValues(re => ("^(" + re + ")").r)
    val texts = Seq(
      (1L, s"hello $zeroMargin world"),
      (2L, ("b" * (EmailMaxLookback + 1)) + "@m.ab tail"),
      (3L, "no pii of any kind"),
      (4L, "ssn 123-45-6789 then +1-555-0042 end"))
    val expected = texts.flatMap { case (id, t) =>
      res.flatMap { case (kind, r) =>
        val hits = (1 to t.length).flatMap { p =>
          val win = t.substring(p - 1, math.min(t.length, p - 1 + PiiMaxLen))
          r.findPrefixMatchOf(win).map(m => (p, m.matched.length))
        }
        // island merge: break when p is past every previous match end
        var out = List.empty[(Long, String, Int, Long, Long)]
        var cur = List.empty[(Int, Int)]
        def flush(): Unit = if (cur.nonEmpty) {
          val st = cur.map(_._1).min
          val en = cur.map { case (p, l) => p + l }.max
          out ::= ((id, kind, st, (en - st).toLong, cur.length.toLong))
          cur = Nil
        }
        hits.foreach { case (p, l) =>
          if (cur.nonEmpty && p > cur.map { case (q, m) => q + m }.max) flush()
          cur ::= ((p, l))
        }
        flush()
        out
      }
    }.toSet
    assert(got == expected,
      s"anchored != all-positions:\n got=$got\n exp=$expected")
    // the zero-margin planted email is present, full length, at 'hello '+1
    assert(got.exists { case (id, k, st, ln, _) =>
      id == 1L && k == "email" && st == 7 && ln == PiiMaxLen.toLong })
  }

  test("vocab_hapax_rate: counts reconcile with an independent per-source tally") {
    val rows = Corpus.queries("vocab_hapax_rate")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).toLowerCase.split("\\s+")))
    rows.foreach { r =>
      val (src, types, tokens, hapax) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val toks = docs.filter(_._1 == src).flatMap(_._2)
      val byTok = toks.groupBy(identity).view.mapValues(_.length)
      assert(types == byTok.size && tokens == toks.length)
      assert(hapax == byTok.values.count(_ == 1))
      assert(math.abs(r.getDouble(4) - hapax.toDouble / types) < 1e-6)
    }
  }

  test("vocab_coverage_curve: monotone, saturating, consistent with the vocab") {
    val rows = Corpus.queries("vocab_coverage_curve")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Corpus.CoverageLadder)
    assert(rows.map(_._3).distinct.length == 1, "total is a corpus constant")
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._2 <= b._2 && a._4 <= b._4,
        "coverage must be monotone in vocab size")
      case _ =>
    }
    // independent recompute of the top arm
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split("\\s+"))
    val freq = toks.groupBy(identity).values.map(_.length.toLong).toSeq
      .sorted(Ordering[Long].reverse)
    val top = rows.last
    assert(top._3 == toks.length)
    assert(top._2 == freq.take(top._1).sum, "top arm covered-token count")
  }

  test("vocab_zipf_slope equals a driver-side OLS over the ranked vocabulary") {
    val r = Corpus.queries("vocab_zipf_slope")(spark, sfDir).head()
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split("\\s+"))
    val freqs = toks.groupBy(identity).values.map(_.length.toLong).toSeq
      .sorted(Ordering[Long].reverse)
    val pts = freqs.zipWithIndex.map { case (c, i) =>
      (math.log((i + 1).toDouble), math.log(c.toDouble))
    }
    val n = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val want = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(r.getLong(0) == pts.length)
    assert(math.abs(r.getDouble(1) - want) < 1e-5,
      s"slope ${r.getDouble(1)} vs reference $want")
    assert(r.getDouble(1) < 0.0, "Zipf slope must be negative on natural-ish text")
  }

  test("vocab_heaps_slope equals a driver-side first-principles recompute at both grains") {
    val rows = q("vocab_heaps_slope").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    def fit(units: Seq[Seq[String]]): (Long, Long, Long, Double) = {
      val withU = units.filter(_.nonEmpty)
      var seen = Set.empty[String]; var nOcc = 0L
      val pts = withU.map { ts =>
        nOcc += ts.size; seen ++= ts
        (math.log(nOcc.toDouble), math.log(seen.size.toDouble))
      }
      val n = pts.length.toDouble
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      (pts.length.toLong, nOcc, seen.size.toLong,
        (n * sxy - sx * sy) / (n * sxx - sx * sx))
    }
    val tokU = docs.map { case (_, t) => t.toLowerCase.split("\\s+").toSeq }
    val shU = docs.map { case (_, t) =>
      val tt = t.toLowerCase.split("\\s+").toSeq
      if (tt.size >= 3) tt.sliding(3).map(_.mkString(" ")).toSeq else Seq.empty
    }
    for ((grain, u) <- Seq("token" -> tokU, "shingle3" -> shU)) {
      val (nd, tu, vs, beta) = fit(u)
      val (gnd, gtu, gvs, gbeta) = rows(grain)
      assert((gnd, gtu, gvs) == ((nd, tu, vs)), s"$grain counts")
      assert(math.abs(gbeta - beta) < 1e-5, s"$grain beta $gbeta vs reference $beta")
    }
    // the diagnostic itself: the closed word vocab saturates, shingles grow
    assert(rows("token")._4 < rows("shingle3")._4)
  }

  test("shard_assign_balanced: exact partition with serpentine balance bound") {
    val assign = Corpus.queries("shard_assign_balanced")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    // every doc assigned exactly once, to a real shard
    assert(assign.length.toLong == nDocs)
    assert(assign.map(_._1).distinct.length.toLong == nDocs)
    val shards = assign.map(_._3)
    assert(shards.forall(sh => sh >= 0 && sh < 8))
    // doc counts within 1 of even (serpentine deals whole blocks)
    val byShard = assign.groupBy(_._3)
    val counts = byShard.view.mapValues(_.length).values
    assert(counts.max - counts.min <= 1)
    // token balance: serpentine on desc-sorted weights keeps the spread
    // within the largest single document's weight
    val sums = byShard.view.mapValues(_.map(_._2).sum).values
    val maxDoc = assign.map(_._2).max
    assert(sums.max - sums.min <= maxDoc,
      s"spread ${sums.max - sums.min} exceeds max doc weight $maxDoc")
  }

  test("pack_efficiency_ladder: waste math reconciles; packing strictly beats naive") {
    val rows = Corpus.queries("pack_efficiency_ladder")(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq == graft.operators.Corpus.PackLadder)
    val byDoc = graft.Tables.documents(spark, sfDir).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).toLowerCase.split("\\s+").length.toLong))
    rows.foreach { r =>
      val (l, nDocs, tot, naive, packed) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nDocs == byDoc.length && tot == byDoc.map(_._2).sum)
      def ceil(n: Long) = (n + l - 1) / l
      assert(naive == byDoc.map { case (_, n) => ceil(n) * l - n }.sum)
      assert(packed == byDoc.groupBy(_._1).values
        .map { ds => val st = ds.map(_._2).sum; ceil(st) * l - st }.sum)
      assert(packed < naive, "concat-packing must beat one-doc-per-sequence")
      assert(r.getDouble(5) > r.getDouble(6))
    }
  }
}
