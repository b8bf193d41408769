package graft

import org.apache.spark.sql.functions._

import graft.operators.Skyline

/** Skyline operator: brute-force parity on random points (duplicates and
  * tied coordinates included) + frontier laws on the fixture query.
  */
class SkylineSpec extends SparkSpecBase {

  test("skyline2d == brute force on random point sets (3 seeds, with ties)") {
    val s = spark
    import s.implicits._
    var x = 4242L
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
    for (seed <- Seq(1L, 2L, 3L)) {
      x = seed
      // small coordinate domain forces tied prices/sizes and duplicates
      val pts = Seq.fill(400)((math.floorMod(next(), 30L).toDouble / 2.0,
        math.floorMod(next(), 25L).toInt))
      val df = pts.zipWithIndex
        .map { case ((p, sz), i) => (i.toLong, p, sz) }
        .toDF("id", "price", "size")
      val got = Skyline.skyline2d(df, "price", "size",
        pmod(xxhash64(col("id")), lit(7))).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
      val brute = pts.zipWithIndex.filterNot { case ((p, sz), _) =>
        pts.exists { case (p2, s2) =>
          p2 <= p && s2 >= sz && (p2 < p || s2 > sz) }
      }.map { case ((p, sz), i) => (i.toLong, p, sz) }.toSet
      assert(got == brute, s"seed $seed: got ${got.size}, brute ${brute.size}")
      assert(brute.nonEmpty)
    }
  }

  test("fixture frontier: antichain, contains the global extremes") {
    val rows = Skyline.queries("q_skyline_parts")(spark, sfDir).collect()
      .map(r => (r.getDouble(1), r.getInt(2)))
    assert(rows.nonEmpty)
    // pairwise non-dominated (frontier is an antichain)
    for (a <- rows; b <- rows if a != b)
      assert(!(b._1 <= a._1 && b._2 >= a._2 && (b._1 < a._1 || b._2 > a._2)),
        s"$b dominates $a inside the frontier")
    // the cheapest part and the largest part always have a representative
    val all = Tables.part(spark, sfDir).select("p_retailprice", "p_size")
      .collect().map(r => (r.getDouble(0), r.getInt(1)))
    assert(rows.map(_._1).min == all.map(_._1).min)
    assert(rows.map(_._2).max == all.map(_._2).max)
  }
}
