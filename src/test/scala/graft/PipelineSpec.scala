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
