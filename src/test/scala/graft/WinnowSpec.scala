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

  /** Reference winnowing, computed independently of any Spark/SQL code:
    * md5-based 44-bit gram hashes, rightmost-min per window of W.
    */
  private def referenceFingerprints(text: String): Set[(Long, Long)] = {
    val k = Winnow.GramLen
    val w = Winnow.WinnowW
    val md = MessageDigest.getInstance("MD5")
    val n = text.length - k + 1
    // 1-based gram positions, as in the engine
    val sk = (1 to n).map { i =>
      val hex = md.digest(text.substring(i - 1, i - 1 + k).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16) % (1L << 44)
      h * 65536L + (65535L - i)
    }
    (w to n).map { i =>
      val m = sk.slice(i - w, i).min
      (65535L - m % 65536L, m / 65536L) // (pos, fph)
    }.toSet
  }

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
