package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.StringSimKernels

/** Kernel contracts for graft_jaro_winkler / graft_damerau. Golden values
  * are DuckDB probe outputs (the oracle engine), so these lock the exact
  * cross-engine parity the link_jw_best oracle depends on.
  */
class StringSimSpec extends AnyFunSuite {

  private def jw(a: String, b: String): Double =
    StringSimKernels.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))
  private def dl(a: String, b: String): Long =
    StringSimKernels.damerauLevenshtein(UTF8String.fromString(a), UTF8String.fromString(b))

  test("jaro-winkler golden values match DuckDB probes") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("dwayne", "duane") - 0.8400000000000001) < 1e-15)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-15)
    // boost threshold: jaro 0.5556 <= 0.7 stays unboosted despite prefix 2
    assert(math.abs(jw("abqqqq", "abzzzz") - 0.5555555555555555) < 1e-15)
    assert(math.abs(jw("abcdwx", "abcdyz") - 0.8666666666666666) < 1e-15)
    assert(math.abs(jw("ab", "abcdefghijklmnop") - 0.7666666666666667) < 1e-15)
    // byte-level: 2-byte é is a 2-byte common prefix
    assert(math.abs(jw("éa", "éb") - 0.8222222222222222) < 1e-15)
    assert(jw("", "abc") == 0.0 && jw("", "") == 0.0 && jw("a", "a") == 1.0)
    assert(jw("abcdefgh", "abcdefgh") == 1.0)
    assert(math.abs(jw("aaaaaaaaaa", "aaaaaaaaab") - 0.96) < 1e-15)
    // odd raw out-of-order count (3-cycle) → transpositions = floor(3/2)
    assert(math.abs(jw("Customer#000000021", "Customer#000001021")
      - 0.9660130718954247) < 1e-15)
  }

  test("damerau-levenshtein golden values match DuckDB probes (unrestricted)") {
    assert(dl("ca", "abc") == 2L) // OSA would give 3
    assert(dl("abcdef", "abcfad") == 3L)
    assert(dl("", "ab") == 2L && dl("ab", "") == 2L && dl("", "") == 0L)
    assert(dl("a cat", "a abct") == 2L)
    assert(dl("kitten", "sitting") == 3L)
    assert(dl("ab", "ba") == 1L)
    assert(dl("é", "e") == 2L) // bytes, not code points
  }

  private def randStrings(seed: Long, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { _ =>
      val len = rnd.nextInt(13)
      (1 to len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString // small alphabet → collisions
    }
  }

  test("property: symmetry, ranges, and identity (seeded random corpus)") {
    val ss = randStrings(42L, 200)
    for (a <- ss.take(40); b <- ss.take(40)) {
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0)
      assert(math.abs(s - jw(b, a)) < 1e-15)
      assert(dl(a, b) == dl(b, a))
      // DL bounded by max length (all-substitute + insert/delete); never negative
      assert(dl(a, b) >= 0L && dl(a, b) <= math.max(a.length, b.length).toLong)
    }
    ss.foreach { a =>
      assert(dl(a, a) == 0L)
      if (a.nonEmpty) assert(jw(a, a) == 1.0)
    }
  }

  test("property: adjacent transposition costs at most 1") {
    randStrings(7L, 200).filter(_.length >= 2).foreach { a =>
      val i = a.length / 2 - 1
      val swapped = a.updated(i, a(i + 1)).updated(i + 1, a(i))
      assert(dl(a, swapped) <= 1L)
    }
  }

  test("SQL registration + codegen path agree with direct kernel eval") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    Graft.init(spark)
    val rows = spark.sql(
      """SELECT graft_jaro_winkler(a, b) AS jw, graft_damerau(a, b) AS dl,
        |       graft_jaro_winkler(NULL, a) AS jwn, graft_damerau(a, NULL) AS dln
        |FROM VALUES ('martha','marhta'), ('ca','abc'), ('',''), ('x','x')
        |  AS t(a, b)""".stripMargin).collect()
    val expect = Seq(("martha", "marhta"), ("ca", "abc"), ("", ""), ("x", "x"))
    rows.zip(expect).foreach { case (r, (a, b)) =>
      assert(r.getDouble(0) == jw(a, b))
      assert(r.getLong(1) == dl(a, b))
      assert(r.isNullAt(2) && r.isNullAt(3), "NULL in -> NULL out")
    }
  }
}
