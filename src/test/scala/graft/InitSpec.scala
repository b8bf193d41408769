package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Pipeline, Retrieval, Winnow}

/** The composable library entry points must work on a session that never
  * called Graft.init — the r10 review found every h60/dot-consuming
  * surface throwing UNRESOLVED_ROUTINE there (call_function resolves
  * through the session function registry, which `spark.newSession()`
  * starts fresh). Two distinct paths are locked:
  *
  *   1. entry points init on their OWN DataFrame's session, so they work
  *      even when the thread's ACTIVE session is a different, already-
  *      inited one (the registry that matters for analysis is the
  *      DataFrame session's, not the active one);
  *   2. TextHash.h60 used directly (no entry point in between) self-inits
  *      via the active session when that is the session analyzing.
  */
class InitSpec extends SparkSpecBase {

  private def freshSession(): SparkSession = {
    val s = spark.newSession() // fresh SessionState: empty temp registry
    assert(!s.sessionState.functionRegistry.functionExists(
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_h60")),
      "newSession unexpectedly inherited the graft registry — test vacuous")
    s
  }

  private def docsOn(s: SparkSession) =
    s.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")

  test("entry points analyze on a fresh un-inited session (divergent active session)") {
    // the suite's base session (inited) stays the active one: the
    // active-session heuristic alone would skip registration on the
    // fresh session, so this passes only via the per-entry-point init
    val s = freshSession()
    SparkSession.setActiveSession(spark)
    val docs = docsOn(s).limit(50)
    assert(Dedup.signatureIndex(docs).count() > 0)
    assert(Dedup.minhashPairsFor(docs).count() >= 0)
    assert(Dedup.ngramJaccardPairs(docs, 0.9, dfCap = None).count() >= 0)
    assert(Retrieval.cdcChunks(docs).count() > 0)
    assert(Winnow.docFps(docs).count() > 0)
    assert(Pipeline.pretrainFunnelFor(
      docsOn(s).join(
        s.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "source"),
        "doc_id")).count() == 1)
  }

  test("hugeMethodLimit override: lowers the default, honors the opt-out " +
    "and explicit non-default values") {
    val key = "spark.sql.codegen.hugeMethodLimit"
    // fresh session: init replaces the known-bad 65535 default with 8000
    val a = freshSession()
    Graft.init(a)
    assert(a.conf.get(key) === "8000")
    // opt-out: keepHugeMethodLimit leaves the default untouched
    val b = freshSession()
    b.conf.set("spark.graft.keepHugeMethodLimit", "true")
    Graft.init(b)
    assert(b.conf.get(key, "65535") === "65535")
    b.conf.unset("spark.graft.keepHugeMethodLimit")
    // an explicit non-default caller value is never replaced
    val c = freshSession()
    c.conf.set(key, "12000")
    Graft.init(c)
    assert(c.conf.get(key) === "12000")
  }

  test("h60/dot used directly self-init via the active session") {
    val s = freshSession()
    SparkSession.setActiveSession(s)
    try {
      val out = docsOn(s).limit(5)
        .select(graft.operators.TextHash.h60(col("text")).as("h"))
        .collect()
      assert(out.length == 5 && out.forall(!_.isNullAt(0)))
    } finally SparkSession.setActiveSession(spark)
  }
}
