package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import TextHash._

/** Winnowing document fingerprinting (Schleimer, Wilkerson, Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003 —
  * the MOSS algorithm). Complements the existing near-dup family with a
  * LOCAL fingerprint selection: every window of [[WinnowW]] consecutive
  * char-[[GramLen]]-gram hashes contributes its minimum (rightmost on
  * ties), which guarantees any cross-document match of length >=
  * [[GuaranteeLen]] chars shares at least one selected fingerprint, while
  * keeping expected density ~ 2/(WinnowW+1) of positions — an index ~3x
  * smaller than the full gram index [[Substring]] builds, with a provable
  * (not probabilistic, unlike MinHash) detection threshold.
  *
  * Rightmost-min selection is encoded as ONE integer key per position:
  * selkey = (h60(gram) mod 2^44) * 2^16 + (2^16 - 1 - i), so `min(selkey)`
  * over a window picks the smallest 44-bit hash and, on hash ties, the
  * LARGEST position — the tie rule that makes selection shift-invariant
  * (aligned windows in two docs sharing text pick the same relative gram).
  * The 16-bit position field bounds docs to 65535 chars (longer docs would
  * take a 20-bit field and a 40-bit hash); 44-bit fingerprint collisions
  * can only over-link a pair (~2^-44 each — accepted, and identical in the
  * oracle since both engines compute the same key).
  *
  * 100 TB shape: gram + window selection is per-doc (partition key doc_id,
  * window length bounded by doc length); only (doc_id, 8-byte key) rows
  * shuffle. The pair join is fingerprint-bucketed with the same df cap
  * discipline as [[Substring.spanPairsCapped]] — no bucket goes quadratic.
  */
object Winnow {

  /** Char k-gram length (the noise threshold: no match shorter than this
    * is ever detected).
    */
  val GramLen = 8

  /** Window size in grams: every [[WinnowW]] consecutive grams yield >= 1
    * fingerprint.
    */
  val WinnowW = 6

  /** The winnowing guarantee: any shared substring of at least this many
    * chars (= WinnowW + GramLen - 1) produces a shared fingerprint.
    */
  val GuaranteeLen: Int = WinnowW + GramLen - 1

  /** Position field width: docs longer than 2^16 - 1 chars are excluded
    * (none in the fixture; a real corpus would widen the field).
    */
  val PosMax = 65535L
  private val PosCard = 65536L

  /** Hash field: 44 bits of h60 (44 + 16 = 60 bits < signed-64 range). */
  private val HashMod = 1L << 44

  /** Fingerprints in more than this many distinct docs are boilerplate and
    * leave the pair join (same discipline as [[Substring.PairDfCap]]).
    */
  val FpDfCap = 8L

  /** Pairs reported by `wn_overlap_pairs`. */
  val TopPairs = 50

  /** (doc_id, i, sk): every full-window position i (gram positions are
    * 1-based; windows need i >= WinnowW) with min-selection key sk over
    * the window ending at i. Gram hashing is one per-row array transform;
    * the sliding min is a per-doc ROWS window. A fully map-side array
    * formulation (mins as a second transform over slices of the key
    * array) was MEASURED SLOWER (10.7 s vs ~3 s at sf0.1): Catalyst
    * collapses the projections and inlines the md5 key-array expression
    * into the sliding-min lambda, recomputing it per window — the same
    * O(n·w) inlining trap TextHash.shingleRows documents.
    */
  private[operators] def selections(docs: DataFrame): DataFrame = {
    val wWin = Window.partitionBy("doc_id").orderBy("i")
      .rowsBetween(-(WinnowW - 1), 0)
    docs
      .where(length(col("text")).between(GuaranteeLen, PosMax))
      // positions explode FIRST so the md5 key runs as a top-level
      // codegen'd expression; a transform(...) lambda computing the key
      // inside the array is interpreted per element (measured slower).
      // The generator and the key projection fuse into one codegen stage,
      // so the duplicated text column never materializes.
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - (GramLen - 1))).as("i"))
      .select(col("doc_id"), col("i"),
        (pmod(h60(col("text").substr(col("i"), lit(GramLen))), lit(HashMod))
          * PosCard + (lit(PosMax) - col("i")))
          .as("sk"))
      .withColumn("skm", min("sk").over(wWin))
      .where(col("i") >= WinnowW)
      .select(col("doc_id"), col("i"), col("skm").as("sk"))
  }

  /** The fingerprint set: (doc_id, pos, fph) — distinct selected grams,
    * decoded back to the 1-based gram position and 44-bit hash.
    */
  def fingerprintsOf(docs: DataFrame): DataFrame =
    selections(docs)
      .select(col("doc_id"), col("sk")).distinct()
      .select(col("doc_id"),
        (lit(PosMax) - pmod(col("sk"), lit(PosCard))).as("pos"),
        expr(s"sk div $PosCard").as("fph"))

  /** (doc_id, fph): each doc's distinct fingerprint hashes (two
    * selections of the same gram text at different positions collapse to
    * one fph). Drops the position field BEFORE the distinct so the
    * hash-grain dedup is ONE aggregation exchange ([[fingerprintsOf]]
    * would pay a (doc_id, sk)-grain distinct first, then need a second).
    */
  def docFps(docs: DataFrame): DataFrame =
    selections(docs)
      .select(col("doc_id"), expr(s"sk div $PosCard").as("fph")).distinct()

  /** The frozen reference index a winnow ingestion gate probes: distinct
    * (ref_id, fph) fingerprint postings, with fingerprints in more than
    * [[FpDfCap]] distinct reference docs dropped (boilerplate — they carry
    * no per-doc provenance and would make hot fph buckets quadratic).
    */
  def referenceIndex(refDocs: DataFrame): DataFrame = {
    val fp = docFps(refDocs).select(col("doc_id").as("ref_id"), col("fph"))
    val wF = Window.partitionBy("fph")
    fp.withColumn("nd", count(lit(1)).over(wF))
      .where(col("nd") <= FpDfCap)
      .select("ref_id", "fph")
  }

  /** Docs in `docs` sharing at least `minShared` distinct winnowing
    * fingerprints WITH A SINGLE reference doc in `refIdx` (a
    * [[referenceIndex]] relation) — pair-grain containment, not corpus
    * membership: on a small-vocabulary corpus most individual grams exist
    * SOMEWHERE in any large reference, so per-pair shared counts are what
    * separate a genuine quote/copy from shared vocabulary (measured on the
    * fixture: background best-pair ~9-14 shared fingerprints, true
    * overlaps 70-115). Each doc's fingerprints depend only on its own
    * text, so a streaming gate applies this per micro-batch and matches
    * the batch answer exactly (StreamingSpec proves it). At 100 TB the
    * index is precomputed and fph-bucketed; the probe side joins on the
    * 8-byte key and the df cap bounds every bucket.
    */
  def winnowMatchesAgainst(docs: DataFrame, refIdx: DataFrame,
                           minShared: Long): DataFrame =
    docFps(docs)
      .join(refIdx, "fph")
      .groupBy("doc_id", "ref_id")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
      .select("doc_id").distinct()

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-doc fingerprint profile: windows examined, fingerprints kept,
    // density (theory: ~2/(W+1) = 0.286 for random hashes; higher means
    // internal repetition pushes distinct minima apart).
    "wn_fingerprints" -> { (s, d) =>
      selections(documents(s, d).select("doc_id", "text"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_windows"),
          countDistinct(col("sk")).as("n_fp"))
        .withColumn("density",
          round(col("n_fp").cast("double") / col("n_windows").cast("double"), 6))
        .orderBy("doc_id")
    },

    // Doc pairs sharing winnowing fingerprints — the MOSS overlap report.
    // Counts DISTINCT shared fingerprint hashes per pair; fingerprints in
    // more than FpDfCap docs (boilerplate) leave before the join so no
    // fingerprint bucket goes quadratic. Any pair sharing a >=
    // GuaranteeLen-char run of non-boilerplate text appears.
    "wn_overlap_pairs" -> { (s, d) =>
      val fp = docFps(documents(s, d).select("doc_id", "text"))
      val wF = Window.partitionBy("fph")
      val filt = fp.withColumn("nd", count(lit(1)).over(wF))
        .where(col("nd").between(2, FpDfCap))
        .select("doc_id", "fph")
      filt.as("a").join(filt.as("b"),
          col("a.fph") === col("b.fph") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("n_shared"))
        .orderBy(desc("n_shared"), col("doc_a"), col("doc_b"))
        .limit(TopPairs)
    }
  )

  // -------------------------------------------------------------- oracles

  /** Shared CTEs: per-position selection keys and full-window minima,
    * mirroring [[selections]] term for term. DuckDB generate_series is
    * end-inclusive = Spark sequence; both window frames are ROWS-based
    * over consecutive integer positions.
    */
  private def selCtes: String =
    s"""g AS (SELECT doc_id,
       |    unnest(generate_series(1, length(text) - ${GramLen - 1})) AS i, text
       |  FROM documents
       |  WHERE length(text) BETWEEN $GuaranteeLen AND $PosMax),
       |sk AS (SELECT doc_id, i,
       |    (${h60Sql(s"substr(text, CAST(i AS INTEGER), $GramLen)")} % $HashMod)
       |      * $PosCard + ($PosMax - i) AS sk
       |  FROM g),
       |w AS (SELECT doc_id, i,
       |    min(sk) OVER (PARTITION BY doc_id ORDER BY i
       |      ROWS BETWEEN ${WinnowW - 1} PRECEDING AND CURRENT ROW) AS skm
       |  FROM sk),
       |f AS (SELECT doc_id, i, skm AS sk FROM w WHERE i >= $WinnowW)""".stripMargin

  val oracles: Map[String, String] = Map(
    "wn_fingerprints" ->
      s"""WITH $selCtes
         |SELECT doc_id, count(*) AS n_windows,
         |  count(DISTINCT sk) AS n_fp,
         |  round(CAST(count(DISTINCT sk) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         |    AS density
         |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "wn_overlap_pairs" ->
      s"""WITH $selCtes,
         |fp AS (SELECT DISTINCT doc_id, sk // $PosCard AS fph FROM f),
         |fd AS (SELECT doc_id, fph FROM
         |  (SELECT doc_id, fph, count(*) OVER (PARTITION BY fph) AS nd FROM fp)
         |  WHERE nd BETWEEN 2 AND $FpDfCap)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
         |FROM fd a JOIN fd b ON a.fph = b.fph AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 ORDER BY n_shared DESC, doc_a, doc_b
         |LIMIT $TopPairs""".stripMargin
  )
}
