package graft

import graft.operators.Layout

/** Z-order layout: Morton-key correctness against a local reference, the
  * locality property the key exists for, and the pruning win the oracled
  * comparison query must show.
  */
class LayoutSpec extends SparkSpecBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("morton key matches the bit-interleave reference on known + random points") {
    val pts = Seq((3L, 5L), (255L, 0L), (0L, 255L), (170L, 85L)) ++
      new scala.util.Random(1).shuffle((0L until 256L).map(i => (i, 255L - i))).take(32)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.mortonKey(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == Layout.mortonLocal(x, y), s"($x,$y)")
    }
    // known value: interleave(3, 5) = 0b100111 = 39
    assert(Layout.mortonLocal(3, 5) == 39)
  }

  test("morton key is a bijection on the grid") {
    val keys = for (x <- 0L until 64L; y <- 0L until 64L) yield Layout.mortonLocal(x, y)
    assert(keys.distinct.length == keys.length)
    assert(keys.max < (1L << (2 * Layout.Bits)))
  }

  test("zorder buckets have bounded extent in BOTH dimensions") {
    val rows = Layout.queries("layout_zorder_stats")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // a bucket of 2^BucketShift consecutive morton cells spans at most a
    // 2^ceil(BucketShift/2) x 2^ceil(BucketShift/2) aligned region:
    // 16x16 at the current constants — the two-dimensional locality that
    // linear layouts cannot give
    val side = 1L << ((Layout.BucketShift + 1) / 2)
    rows.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) < side, s"x spread in bucket ${r.getLong(0)}")
      assert(r.getLong(5) - r.getLong(4) < side, s"y spread in bucket ${r.getLong(0)}")
    }
  }

  test("pruning: zorder scans fewer buckets than x-major for a 2-D rectangle") {
    val rows = Layout.queries("layout_pruning_compare")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (zBuckets, zScanned) = rows("zorder")
    val (xBuckets, xScanned) = rows("xmajor")
    assert(zScanned > 0, "rectangle must hit data")
    // identical file budget, fewer files touched — the whole point
    assert(zScanned.toDouble / zBuckets <= xScanned.toDouble / xBuckets,
      s"zorder $zScanned/$zBuckets vs xmajor $xScanned/$xBuckets")
  }
}
