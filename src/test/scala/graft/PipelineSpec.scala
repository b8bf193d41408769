package graft

import graft.operators.Pipeline

/** Pipeline stage-order semantics on crafted corpora: near-dedup must run
  * over the gated corpus, so content whose duplicate partner failed an
  * earlier gate keeps exactly one surviving copy.
  */
class PipelineSpec extends SparkSpecBase {

  // long, stopword-rich, punctuation-free -> passes the quality gate
  private val goodText =
    (1 to 40).map(i => s"the quick brown fox number$i jumps of the lazy dog and") .mkString(" ")
  // pure punctuation -> fails the quality gate
  private val badText = "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"

  private def corpus(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("near-dup whose partner failed the quality gate still survives") {
    // doc 1: near-identical to doc 2 but LOW quality (prefix of junk makes
    // the pair share shingles while doc 1 fails the gate)... simplest
    // construction: doc 1 is bad, doc 2 is good, not near-dups of each
    // other; doc 2 and doc 3 ARE near-dups (one token changed).
    val altered = goodText.replace("number7", "number999")
    val out = Pipeline.cleanCorpusFor(corpus(
      1L -> badText, 2L -> goodText, 3L -> altered))
      .collect().map(_.getLong(0)).toSet
    // 1 fails quality; (2,3) near-dup pair -> keep 2 (smaller id)
    assert(out === Set(2L))
  }

  test("a near-dup pair where the smaller id fails the gate keeps the larger id") {
    // Construction: D (id 2) = 27 distinct non-stopword tokens ->
    // quality = 27/100*0.5 + 0.3 + 0 = 0.435 < 0.5, FAILS.
    // P (id 3) = D + " the a of" (30 tokens, 3 stopwords) ->
    // quality = 0.15 + 0.3 + min(1, 0.1*5)*0.2 = 0.55, PASSES.
    // Shingle Jaccard(D, P) = 25/28 ~ 0.89 -> a full-corpus minhash pass
    // would flag (2,3) and drop doc 3 (the pre-fix behavior lost BOTH
    // copies); gated near-dedup must keep 3.
    val d = (1 to 27).map(i => s"word$i").mkString(" ")
    val p = d + " the a of"
    val out = Pipeline.cleanCorpusFor(corpus(2L -> d, 3L -> p))
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(3L), s"expected only doc 3 to survive: $out")
  }

  test("exact duplicates collapse to the smallest id before near-dedup") {
    val out = Pipeline.cleanCorpusFor(corpus(
      5L -> goodText, 9L -> goodText, 11L -> goodText))
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(5L))
  }

  test("pretrain e2e funnel: every stage drops a planted doc for its own reason") {
    // The fixture leaves the exact-dedup branch vacuous (its exact-dup
    // groups all fail earlier gates), so the full funnel is proven on a
    // PLANTED corpus where each stage removes exactly the intended docs:
    //   19 -> relative URL (doc_id % 19 == 0 -> host '')   [url stage]
    //   2  -> punctuation junk                             [quality]
    //   4  -> exact copy of 3 (keep min id)                [exact dedup]
    //   6  -> near-dup of 5 (one token changed)            [near-dup CC]
    //   50 -> benchmark doc (doc_id % BenchMod == 0)       [firewall]
    //   7  -> short excerpt of 50 (containment 1.0, but    [firewall]
    //         Jaccard vs 50 far below the minhash 0.5 bar — so 50 stays
    //         a singleton rep and ITS bench-id drop branch is live too)
    //   3, 5, 8, 9 survive, each with its own source shard.
    val s = spark
    import s.implicits._
    // each group gets its OWN content-word stem so no cross-group
    // minhash pair can merge the planted components
    def body(stem: String) = (1 to 40)
      .map(i => s"the shiny $stem kettle $stem$i rests of the old shelf and")
      .mkString(" ")
    val benchText = body("bench")
    val excerpt = benchText.split(" ").slice(3, 17).mkString(" ")
    val nearDup = body("near").replace("near7 ", "near999 ")
    val rows = Seq(
      (19L, "SA", body("nineteen")),
      (2L, "SA", badText),
      (3L, "SB", body("dup")),
      (4L, "SB", body("dup")),
      (5L, "SC", body("near")),
      (6L, "SC", nearDup),
      (50L, "SD", benchText),
      (7L, "SD", excerpt),
      (8L, "SE", body("eight")),
      (9L, "SF", body("nine")))
    val docs = rows.toDF("doc_id", "source", "text")

    // arrange-phase attribution: each planted cause holds in isolation
    val q = graft.operators.TextAnalysis.stats(docs.select("doc_id", "text"))
      .select("doc_id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q(2L) < Pipeline.QualityThreshold, s"doc 2 must fail quality: $q")
    rows.filter(_._1 != 2L).foreach { case (id, _, _) =>
      assert(q(id) >= Pipeline.QualityThreshold, s"doc $id must pass quality (${q(id)})")
    }
    val pairs = graft.operators.Dedup.minhashPairsFor(docs.select("doc_id", "text"))
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((5L, 6L)), s"planted near-dup pair missing: $pairs")
    assert(!pairs.contains((7L, 50L)) && !pairs.contains((50L, 7L)),
      "excerpt must stay below the minhash bar so the bench-id branch is live")
    // among the docs that reach the CC stage, (5,6) must be the ONLY pair
    // — any cross-group pair would merge planted components and
    // misattribute a drop
    val g3 = Set(3L, 5L, 6L, 50L, 7L, 8L, 9L)
    assert(pairs.filter(p => g3(p._1) && g3(p._2)) === Set((5L, 6L)),
      s"unexpected pairs among gated docs: $pairs")

    val r = Pipeline.pretrainFunnelFor(docs).head()
    def g(n: String) = r.getLong(r.fieldIndex(n))
    assert(g("n_docs") === 10L)
    assert(g("after_url") === 9L, "url stage must drop exactly doc 19")
    assert(g("after_quality") === 8L, "quality stage must drop exactly doc 2")
    assert(g("after_exact") === 7L, "exact dedup must drop exactly doc 4")
    assert(g("after_neardup") === 6L, "near-dup CC must drop exactly doc 6")
    assert(g("after_contam") === 4L, "firewall must drop doc 50 (bench id) and doc 7 (overlap)")
    assert(g("n_train") + g("n_validation") + g("n_test") === g("after_contam"))
    // pack/token accounting recomputed first-principles from the planted
    // survivors {3, 5, 8, 9}: per-source token sums, ceil to ChunkTokens
    val surv = rows.filter(r => Set(3L, 5L, 8L, 9L)(r._1))
    val tokens = surv.map(r => (r._2, r._3.split("\\s+").length.toLong))
    assert(g("total_tokens") === tokens.map(_._2).sum)
    val ct = graft.operators.Corpus.ChunkTokens
    val expPacks = tokens.groupBy(_._1).values
      .map(g => (g.map(_._2).sum + ct - 1) / ct).sum
    assert(g("n_packs") === expPacks)
  }

  test("funnel forwards a caller-provided url column; url-less corpus synthesizes") {
    val s = spark
    import s.implicits._
    def body(stem: String) = (1 to 40)
      .map(i => s"the shiny $stem kettle $stem$i rests of the old shelf and")
      .mkString(" ")
    // url-less: doc 19 dies to the synthesized relative URL (id % 19)
    val bare = Seq((19L, "SA", body("s19")), (3L, "SB", body("s3")))
      .toDF("doc_id", "source", "text")
    val r0 = Pipeline.pretrainFunnelFor(bare).head()
    assert(r0.getLong(r0.fieldIndex("after_url")) === 1L,
      "url-less corpus must curate on the SYNTHESIZED url (doc 19 relative)")
    // same corpus carrying its own urls: doc 19 now has a real host and
    // survives; a relative caller url still dies
    val withUrl = Seq(
      (19L, "SA", "https://a.com/doc19", body("s19")),
      (3L, "SB", "/relative/doc3", body("s3")))
      .toDF("doc_id", "source", "url", "text")
    val r1 = Pipeline.pretrainFunnelFor(withUrl).head()
    assert(r1.getLong(r1.fieldIndex("after_url")) === 1L)
    val kept = graft.operators.UrlOps.domainCapRank(
        withUrl.select("doc_id", "source", "url"))
      .where(org.apache.spark.sql.functions.col("host") =!= "")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(19L),
      "caller urls must decide the gate: 19 has a host, 3 is relative")
  }

  test("pretrain e2e funnel on the fixture reconciles with the standalone gates") {
    val r = Pipeline.queries("pipeline_pretrain_e2e")(spark, sfDir).head()
    def g(n: String) = r.getLong(r.fieldIndex(n))
    assert(g("n_docs") >= g("after_url") && g("after_url") >= g("after_quality")
      && g("after_quality") >= g("after_exact")
      && g("after_exact") >= g("after_neardup")
      && g("after_neardup") >= g("after_contam"), "monotone funnel")
    // stage 1 == web curation's after_cap (same shared domainCapRank)
    val wc = Pipeline.queries("pipeline_web_curation")(spark, sfDir).head()
    assert(g("after_url") === wc.getLong(wc.fieldIndex("after_cap")))
    assert(g("n_train") + g("n_validation") + g("n_test") === g("after_contam"))
    // packing lower bound: packs can never undercut the global token mass
    val minPacks = (g("total_tokens") + graft.operators.Corpus.ChunkTokens - 1) /
      graft.operators.Corpus.ChunkTokens
    assert(g("n_packs") >= minPacks && g("n_packs") <= g("after_contam") + minPacks)
  }

  test("pretrain e2e executes a bounded stage/row budget (recompute-explosion tripwire)") {
    // Execution-grain lock on the r6 union-checkpoint lesson: if any of
    // the funnel's three persists (flags / g3 / g5) — or the internal
    // signature persist / CC checkpoint — is dropped, each extra consumer
    // re-derives a whole stage pipeline, and the job's stage count and
    // input-row count explode well past these bounds (measured steady
    // state: 65-66 stages, ~3000 input records at sf0.001; a single
    // dropped persist adds 10+ stages and 500+ rows). Job-group filtering
    // keeps concurrent suites in this shared JVM out of the counts.
    import java.util.concurrent.ConcurrentHashMap
    import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
    val group = s"e2eLock-${System.nanoTime()}"
    val stageIds = ConcurrentHashMap.newKeySet[Int]()
    val stages = new AtomicInteger()
    val records = new AtomicLong()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (j.properties != null &&
            group == j.properties.getProperty("spark.jobGroup.id"))
          j.stageIds.foreach(id => stageIds.add(id))
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        if (stageIds.contains(s.stageInfo.stageId)) stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (stageIds.contains(t.stageId))
          records.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sparkContext.setJobGroup(group, "pretrain e2e plan lock")
      try Pipeline.pretrainFunnelFor(
          Tables.documents(spark, sfDir).select("doc_id", "source", "text"))
        .collect()
      finally spark.sparkContext.clearJobGroup()
      // listener bus is async: poll until the counts stop moving
      var last = (-1, -1L); var stable = 0
      val deadline = System.currentTimeMillis() + 15000
      while (stable < 3 && System.currentTimeMillis() < deadline) {
        Thread.sleep(300)
        val cur = (stages.get(), records.get())
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
      assert(stages.get() <= 90,
        s"stage count ${stages.get()} exploded past the 90 bound — a persist was dropped?")
      assert(records.get() <= 6000,
        s"input records ${records.get()} exploded past the 6000 bound — a persist was dropped?")
      assert(stages.get() > 0, "job-group filter matched no stages (vacuous)")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      Graft.releaseCaches(spark)
    }
  }

  test("pipeline_web_curation: cumulative funnel reconciles with the individual gates") {
    val r = graft.operators.Pipeline.queries("pipeline_web_curation")(spark, sfDir).head()
    val (n, u, c, b, sc) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(n >= u && u >= c && c >= b && b >= sc && sc >= 0, "monotone funnel")
    assert(n == Tables.documents(spark, sfDir).count())
    // stage 1+2 against the url queries: docs in the cap set with a
    // non-empty domain == after_cap (the cap ranks malformed docs too,
    // but url_ok excludes them from the cumulative count)
    val kept = graft.operators.UrlOps.queries("url_domain_caps")(spark, sfDir)
      .collect().map(x => (x.getLong(0), x.getString(1)))
    assert(kept.count(_._2.nonEmpty) == c)
    // stage 3 against quality_blocklist's own flag on the capped survivors
    val keptSet = kept.filter(_._2.nonEmpty).map(_._1).toSet
    val blOk = graft.operators.TextAnalysis.queries("quality_blocklist")(spark, sfDir)
      .collect().filter(x => !x.getBoolean(4)).map(_.getLong(0)).toSet
    assert(keptSet.count(blOk) == b)
    // stage 4 against the script profile
    val latin = graft.operators.TextAnalysis.queries("text_script_profile")(spark, sfDir)
      .collect().filter(_.getString(6) == "latin").map(_.getLong(0)).toSet
    assert(keptSet.filter(blOk).count(latin) == sc)
  }
}
