package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Data-layout operators: Z-order (Morton) space-filling-curve keys and the
  * file-skipping arithmetic they exist for. The reference has nothing in
  * this category (SURVEY.md §2.5).
  *
  * At 100 TB the win is NOT the key computation (a per-row bit shuffle, no
  * shuffle, stays in codegen) — it is what the key buys: sorting/
  * partitioning the corpus by `mortonKey(x, y)` gives every file bounded
  * min/max ranges in BOTH dimensions simultaneously, so a two-dimensional
  * range predicate prunes files on both columns (linear layouts prune on
  * the leading sort column only). `layout_pruning_compare` measures exactly
  * that, from the data: per-bucket min/max stats under Z-order vs x-major
  * layout, then the fraction of buckets a rectangle query must scan.
  *
  * Everything is integer bit arithmetic — bit-identical across engines by
  * construction (disjoint bit positions are combined with `+`, which equals
  * `|` and sidesteps SQL dialect differences in bitwise-OR precedence).
  */
object Layout {

  /** Bits per dimension (16-bit Morton keys, 256x256 grid). */
  val Bits = 8
  /** Bucket = zkey >> BucketShift: 2^BucketShift cells per bucket — the
    * "file" granularity of the pruning simulation.
    */
  val BucketShift = 8

  /** Rectangle probe for the pruning comparison. */
  val XLo = 32; val XHi = 47; val YLo = 64; val YHi = 95

  /** Morton-interleave two Bits-bit non-negative ints: bit i of x lands at
    * position 2i, bit i of y at 2i+1.
    */
  def mortonKey(x: Column, y: Column): Column =
    (0 until Bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  private def mortonSql(x: String, y: String): String =
    (0 until Bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")

  /** Local reference for specs. */
  def mortonLocal(x: Long, y: Long): Long =
    (0 until Bits).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum

  // 2-D point attributes derived by md5 from event_id: uniform over the
  // full 256x256 grid at EVERY scale factor (raw user_id/event_id ranges
  // grow with SF and would leave the probe rectangle empty at small SF),
  // and reproducible in the oracle.
  private def points(s: SparkSession, d: String): DataFrame =
    events(s, d).select(
      (TextHash.h60(concat(lit("zx:"), col("event_id").cast("string"))) % 256).as("x"),
      (TextHash.h60(concat(lit("zy:"), col("event_id").cast("string"))) % 256).as("y"))

  private val pointsSql =
    s"""SELECT ${TextHash.h60Sql("'zx:' || CAST(event_id AS VARCHAR)")} % 256 AS x,
       |       ${TextHash.h60Sql("'zy:' || CAST(event_id AS VARCHAR)")} % 256 AS y
       |FROM events""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-bucket min/max stats under Z-order layout — the file-footer
    // statistics a lakehouse would write. One map-side-combined aggregate;
    // output is bucket-count-sized.
    "layout_zorder_stats" -> { (s, d) =>
      points(s, d)
        .withColumn("bucket", shiftright(mortonKey(col("x"), col("y")), BucketShift))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          min("x").as("x_min"), max("x").as("x_max"),
          min("y").as("y_min"), max("y").as("y_max"))
        .orderBy("bucket")
    },

    // File-skipping head-to-head: how many buckets must a rectangle query
    // scan (by min/max intersection) under Z-order vs x-major layout, at
    // identical bucket counts. Two bucket-sized aggregates; the corpus is
    // scanned twice and shuffled only at bucket granularity.
    "layout_pruning_compare" -> { (s, d) =>
      val pts = points(s, d)
      def stats(keyed: DataFrame, layout: String): DataFrame =
        keyed.groupBy("bucket")
          .agg(min("x").as("x_min"), max("x").as("x_max"),
            min("y").as("y_min"), max("y").as("y_max"), count(lit(1)).as("n"))
          .agg(count(lit(1)).as("n_buckets"),
            sum(when(col("x_max") >= XLo && col("x_min") <= XHi &&
              col("y_max") >= YLo && col("y_min") <= YHi, 1L).otherwise(0L))
              .as("n_scanned"),
            sum(when(col("x_max") >= XLo && col("x_min") <= XHi &&
              col("y_max") >= YLo && col("y_min") <= YHi, col("n")).otherwise(0L))
              .as("rows_scanned"))
          .select(lit(layout).as("layout"), col("n_buckets"),
            col("n_scanned"), col("rows_scanned"))
      val z = stats(pts.withColumn("bucket",
        shiftright(mortonKey(col("x"), col("y")), BucketShift)), "zorder")
      val lin = stats(pts.withColumn("bucket",
        shiftright(col("x") * 256 + col("y"), BucketShift)), "xmajor")
      z.union(lin).orderBy("layout")
    }
  )

  val oracles: Map[String, String] = {
    val scanned = s"x_max >= $XLo AND x_min <= $XHi AND y_max >= $YLo AND y_min <= $YHi"
    def statsSql(bucketExpr: String, layout: String): String =
      s"""SELECT '$layout' AS layout, count(*) AS n_buckets,
         |  CAST(sum(CASE WHEN $scanned THEN 1 ELSE 0 END) AS BIGINT) AS n_scanned,
         |  CAST(sum(CASE WHEN $scanned THEN n ELSE 0 END) AS BIGINT) AS rows_scanned
         |FROM (SELECT $bucketExpr AS bucket, min(x) AS x_min, max(x) AS x_max,
         |        min(y) AS y_min, max(y) AS y_max, count(*) AS n
         |      FROM pts GROUP BY bucket)""".stripMargin
    Map(
      "layout_zorder_stats" ->
        s"""WITH pts AS ($pointsSql)
           |SELECT ${mortonSql("x", "y")} >> $BucketShift AS bucket, count(*) AS n,
           |  min(x) AS x_min, max(x) AS x_max, min(y) AS y_min, max(y) AS y_max
           |FROM pts GROUP BY bucket ORDER BY bucket""".stripMargin,

      "layout_pruning_compare" ->
        s"""WITH pts AS ($pointsSql)
           |${statsSql(s"${mortonSql("x", "y")} >> $BucketShift", "zorder")}
           |UNION ALL
           |${statsSql(s"(x * 256 + y) >> $BucketShift", "xmajor")}
           |ORDER BY layout""".stripMargin
    )
  }
}
