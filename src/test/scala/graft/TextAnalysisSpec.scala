package graft

import graft.operators.TextAnalysis

/** Text-analysis pack: scoring mechanics on crafted strings (the fixture
  * vocabulary is synthetic, so language recovery is exercised here, not
  * against the fixture's `lang` column).
  */
class TextAnalysisSpec extends SparkSpecBase {

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
}
