package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import graft.operators.Winnow

/** Winnowing fingerprint correctness: the SIGMOD-2003 guarantee (every
  * shared run of >= GuaranteeLen chars yields a shared fingerprint), a
  * pure-Scala reference implementation cross-check over real fixture docs,
  * and the density sanity the 2/(w+1) theory predicts.
  */
class WinnowSpec extends SparkSpecBase {
  import spark.implicits._

  /** Reference winnowing, computed independently of any Spark/SQL code AND
    * of the engine's packed-key encoding: 40-bit gram hashes (h60 mod
    * [[Winnow.HashMod]] — the width is READ from the engine so it can never
    * silently drift again), rightmost-min per window of W by direct index
    * comparison (min hash; on hash ties the largest position wins). No
    * position field, no chunking — this is the unbounded ideal the chunked
    * engine must reproduce exactly.
    */
  private def referenceFingerprints(text: String): Set[(Long, Long)] = {
    val k = Winnow.GramLen
    val w = Winnow.WinnowW
    val md = MessageDigest.getInstance("MD5")
    val n = text.length - k + 1
    // 1-based gram positions, as in the engine
    val hs = (1 to n).map { i =>
      val hex = md.digest(text.substring(i - 1, i - 1 + k).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % Winnow.HashMod
    }
    (w to n).map { i =>
      // rightmost minimum over the window of positions (i-w+1 .. i):
      // start at the window's last position and only move left on a
      // STRICTLY smaller hash
      var best = i - 1 // 0-based index of position i
      var j = i - 2
      while (j >= i - w) { if (hs(j) < hs(best)) best = j; j -= 1 }
      (best + 1L, hs(best)) // (pos, fph)
    }.toSet
  }

  /** Engine fingerprints per doc as (pos, fph) sets. */
  private def engineFps(docs: org.apache.spark.sql.DataFrame,
                        chunkLen: Int): Map[Long, Set[(Long, Long)]] =
    Winnow.fingerprintsOf(docs, chunkLen)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("winnowing guarantee: a shared >= GuaranteeLen-char run always shares a fingerprint") {
    // 40 adversarial pairs: a common substring of exactly GuaranteeLen chars
    // planted at DIFFERENT offsets inside otherwise-unrelated random text.
    val rng = new scala.util.Random(7)
    def junk(n: Int) = (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val rows = (0 until 40).flatMap { p =>
      val shared = junk(Winnow.GuaranteeLen)
      val offA = rng.nextInt(30)
      val offB = rng.nextInt(30)
      Seq((2L * p, junk(offA) + shared + junk(40)),
        (2L * p + 1, junk(offB + 7) + shared + junk(25)))
    }
    val docs = rows.toDF("doc_id", "text")
    val fp = Winnow.fingerprintsOf(docs).select("doc_id", "fph")
    val shared = fp.as("a").join(fp.as("b"),
        $"a.fph" === $"b.fph" &&
          $"a.doc_id" + 1 === $"b.doc_id" && $"a.doc_id" % 2 === 0)
      .select(($"a.doc_id" / 2).cast("long").as("pair")).distinct().count()
    assert(shared === 40L, "every planted pair must share >= 1 fingerprint")
  }

  test("engine fingerprints equal the pure-Scala reference on fixture docs") {
    val docs = Tables.documents(spark, sfDir)
      .where(col("doc_id") < 10).select("doc_id", "text")
    val engine = Winnow.fingerprintsOf(docs)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val texts = docs.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(texts.nonEmpty)
    texts.foreach { case (id, text) =>
      assert(engine(id) === referenceFingerprints(text), s"doc $id")
    }
  }

  test("chunked selection equals single-chunk selection and the reference on multi-chunk docs") {
    // Docs spanning 8+ chunks at an artificially small chunkLen: random
    // text, periodic text (period 4 < gram length, so identical grams
    // recur INSIDE single windows — the rightmost-on-tie rule is live in
    // every window), and mixed text with a long repeated phrase. The
    // chunked run must equal both the single-chunk run and the
    // packing-free pure-Scala reference as (pos, fph) sets.
    val rng = new scala.util.Random(11)
    def junk(n: Int) = (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val phrase = "winnowing local fingerprints "
    val rows = Seq(
      (0L, junk(450)),
      (1L, "abcd" * 120),                       // ties in every window
      (2L, junk(80) + phrase * 9 + junk(90)),   // long internal repeat
      (3L, junk(Winnow.GuaranteeLen)),          // exactly one window
      (4L, junk(63) + junk(64))                 // length straddles one seam
    )
    val smallChunk = 64
    val stride = smallChunk - (Winnow.GuaranteeLen - 1)
    assert(rows.map(_._2.length).max / stride >= 8, "fixture must span 8+ chunks")
    val docs = rows.toDF("doc_id", "text")
    val chunked = engineFps(docs, smallChunk)
    val single = engineFps(docs, Winnow.ChunkLen)
    rows.foreach { case (id, text) =>
      val ref = referenceFingerprints(text)
      assert(chunked(id) === ref, s"chunked vs reference, doc $id")
      assert(single(id) === ref, s"single-chunk vs reference, doc $id")
    }
  }

  test("cross-seam guarantee: a shared run straddling a chunk seam still shares a fingerprint") {
    // chunkLen=64 -> stride 52: chunk 0 covers 1-based positions 1..64,
    // chunk 1 starts at 53. Plant the SAME GuaranteeLen-char run at
    // positions 58..70 of doc A (straddling A's first seam at 64|65) and
    // at positions 100..112 of doc B (straddling B's second seam at
    // 104|105... B's chunk grid is the same 0,52,104 offsets, so 100..112
    // crosses the char-104 boundary). Both runs cross a seam, yet each
    // lies fully inside SOME chunk (that is the whole point of the
    // GuaranteeLen-1 overlap), so the pair must share a fingerprint.
    val smallChunk = 64
    val g = Winnow.GuaranteeLen // 13
    val rng = new scala.util.Random(23)
    def junk(n: Int) = (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val shared = junk(g)
    val a = junk(57) + shared + junk(130) // shared at positions 58..70
    val b = junk(99) + shared + junk(120) // shared at positions 100..112
    assert(a.substring(57, 57 + g) === shared && b.substring(99, 99 + g) === shared)
    val docs = Seq((0L, a), (1L, b)).toDF("doc_id", "text")
    val fp = Winnow.docFps(docs, smallChunk)
    val nShared = fp.where(col("doc_id") === 0).select("fph")
      .intersect(fp.where(col("doc_id") === 1).select("fph")).count()
    assert(nShared >= 1L, "seam-straddling shared run must share a fingerprint")
    // and the chunked sets still match the unchunked reference exactly
    val chunked = engineFps(docs, smallChunk)
    assert(chunked(0L) === referenceFingerprints(a))
    assert(chunked(1L) === referenceFingerprints(b))
  }

  test("a 70,000-char doc (past the old 16-bit position bound) fingerprints correctly") {
    // Well past 65,535 chars: single-chunk at the position field's 2^20-1
    // ceiling, multi-chunk at the DEFAULT ChunkLen, and multi-chunk at
    // 4096 must all equal the packing-free reference.
    val rng = new scala.util.Random(41)
    val sb = new StringBuilder
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "theta", "kappa", "lambda", "sigma")
    while (sb.length < 70000) {
      sb.append(words(rng.nextInt(words.length))).append(' ')
      if (rng.nextInt(13) == 0) sb.append("shared boilerplate phrase ")
    }
    val text = sb.toString.take(70000)
    assert(text.length > 65535, "doc must exceed the old 16-bit bound")
    val docs = Seq((7L, text)).toDF("doc_id", "text")
    val ref = referenceFingerprints(text)
    assert(engineFps(docs, Winnow.PosMax.toInt)(7L) === ref, "single-chunk vs reference")
    assert(engineFps(docs, Winnow.ChunkLen)(7L) === ref, "default-chunk vs reference")
    assert(engineFps(docs, 4096)(7L) === ref, "18-chunk vs reference")
    assert(ref.exists(_._1 > 65535L), "fingerprints past the old bound must exist")
  }

  test("map-side selections equal the exchange-based windowed formulation row-for-row") {
    // the default physical shape (zero-shuffle array sliding-min) must be
    // row-set identical to the Window formulation on every chunk
    // geometry, including chunks too short for any full window and seam
    // duplication at the default ChunkLen
    val rng = new scala.util.Random(93)
    def junk(n: Int) = (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val docs = (Seq((0L, junk(450)), (1L, "abcd" * 120),
      (2L, junk(Winnow.GuaranteeLen)), (3L, junk(Winnow.GramLen)),
      (4L, junk(Winnow.ChunkLen + 1))) ++
      Tables.documents(spark, sfDir).where(col("doc_id") < 20)
        .select("doc_id", "text").collect()
        .map(r => (1000L + r.getLong(0), r.getString(1)))).toDF("doc_id", "text")
    for (cl <- Seq(Winnow.GuaranteeLen, 64, Winnow.ChunkLen, 4095)) {
      val m = Winnow.selections(docs, cl)
      val w = Winnow.selectionsWindowed(docs, cl)
      assert(m.exceptAll(w).isEmpty && w.exceptAll(m).isEmpty,
        s"formulations diverge at chunkLen=$cl")
    }
  }

  test("density tracks the 2/(w+1) theory on the fixture corpus") {
    val out = SparkEntry.queries("wn_fingerprints")(spark, sfDir)
    val stats = out.agg(
      avg("density").as("mean_d"),
      min(col("n_fp")).as("min_fp"),
      max(col("n_fp") <= col("n_windows")).as("bounded")).head()
    val meanD = stats.getDouble(0)
    assert(meanD > 0.2 && meanD < 0.4, s"mean density $meanD out of range")
    assert(stats.getLong(1) >= 1L)
    assert(stats.getBoolean(2))
  }

  test("containment laws: values in (0,1], n_shared bounded by the smaller doc, and a planted full quote scores 1.0") {
    // law checks over the fixture output
    val rows = SparkEntry.queries("wn_containment")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, n, c) =>
      assert(a < b); assert(n >= 1L)
      assert(c > 0.0 && c <= 1.0, s"containment $c out of range for ($a,$b)")
    }
    // planted wholesale quote: every window of a short doc embedded in a
    // longer host is also a window of the host with identical content,
    // and winnowing selection is shift-invariant — so every fingerprint
    // hash of the quoted doc must also be selected in the host
    // (containment 1.0 at the hash grain)
    val rng = new scala.util.Random(67)
    def junk(m: Int) = (0 until m).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val small = junk(60)
    val host = junk(400) + small + junk(400)
    val docs = Seq((0L, host), (1L, small), (2L, junk(500)))
      .toDF("doc_id", "text")
    val fp = Winnow.docFps(docs)
    val nf = fp.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val shared01 = fp.where(col("doc_id") === 0).select("fph")
      .intersect(fp.where(col("doc_id") === 1).select("fph")).count()
    assert(shared01 === nf(1L), "every quoted-doc fingerprint must appear in the host")
  }

  test("overlap pairs only report docs that truly share a gram run") {
    // every reported pair shares >= 1 identical GramLen-char substring
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val pairs = SparkEntry.queries("wn_overlap_pairs")(spark, sfDir)
    val withText = pairs
      .join(docs.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("text", "ta"), "doc_a")
      .join(docs.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("text", "tb"), "doc_b")
      .collect()
    assert(withText.nonEmpty)
    withText.foreach { r =>
      val ta = r.getAs[String]("ta"); val tb = r.getAs[String]("tb")
      val gramsA = ta.sliding(Winnow.GramLen).toSet
      assert(tb.sliding(Winnow.GramLen).exists(gramsA.contains),
        s"pair (${r.getAs[Long]("doc_a")}, ${r.getAs[Long]("doc_b")}) shares no gram")
    }
  }
}
