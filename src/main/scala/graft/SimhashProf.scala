package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling main: sub-stage timings of the simhash_recall_frontier
  * pipeline with bench-faithful cache hygiene (releaseCaches between
  * stages, so every figure is cold-data / warm-codegen like the timed
  * bench loop). Stages: fingerprint agg, the 6-geometry banded self-join
  * at three cut points (raw multiplicity count / first-match count /
  * old-style distinct count), the 11-band truth join, and the full query.
  * Usage: tools/run_main.sh graft.SimhashProf [sfDir]
  */
object SimhashProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.init(spark)
    import operators.Dedup.{SimhashFrontierGrid, SimhashTruthBands, SimhashHammingMax}
    def timed(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label%-26s ${(System.nanoTime() - t0) / 1e9}%6.2fs  ($r)")
      Graft.releaseCaches(spark)
    }
    def fp = operators.Dedup.queries("dedup_simhash")(spark, sfDir)
      .select(col("doc_id"), col("simhash"))
    def keyed = fp.select(col("doc_id"), col("simhash"), explode(array(
      SimhashFrontierGrid.zipWithIndex.flatMap { case ((bb, w), gi) =>
        (0 until bb).map { b =>
          struct(lit(gi).as("g"), lit(b).as("band"),
            shiftright(col("simhash"), b * w)
              .bitwiseAND(lit((1L << w) - 1)).as("key"))
        }
      }: _*)).as("e"))
      .select(col("doc_id"), col("simhash"), col("e.g").as("g"),
        col("e.band").as("band"), col("e.key").as("key"))
    def joined = keyed.as("x").join(keyed.as("y"),
      col("x.g") === col("y.g") && col("x.band") === col("y.band") &&
        col("x.key") === col("y.key") && col("x.doc_id") < col("y.doc_id"))
    val xorv = col("x.simhash").bitwiseXOR(col("y.simhash"))
    def firstZeroBand(x: org.apache.spark.sql.Column, bands: Seq[(Int, Int)]) =
      bands.zipWithIndex.foldRight(lit(-1): org.apache.spark.sql.Column) {
        case (((off, w), i), rest) =>
          when(shiftright(x, off).bitwiseAND(lit((1L << w) - 1)) === 0L, lit(i))
            .otherwise(rest)
      }
    val firstForG = SimhashFrontierGrid.zipWithIndex
      .foldRight(lit(-1): org.apache.spark.sql.Column) { case (((bb, w), gi), rest) =>
        when(col("x.g") === gi,
          firstZeroBand(xorv, (0 until bb).map(b => (b * w, w)))).otherwise(rest)
      }
    // two passes: pass 1 pays plan-specific codegen, pass 2 is the
    // bench-comparable figure
    for (rep <- 1 to 2) {
      println(s"-- rep $rep")
      timed("fp_agg")(fp.count())
      timed("keyed_explode")(keyed.count())
      timed("join_raw_count")(joined.select(col("x.g")).groupBy("g").count()
        .collect().map(r => r.getLong(1)).sum)
      timed("join_firstmatch")(joined.where(col("x.band") === firstForG)
        .select(col("x.g")).groupBy("g").count()
        .collect().map(r => r.getLong(1)).sum)
      timed("join_distinct_old")(joined
        .select(col("x.g").as("g"), col("x.doc_id").as("doc_a"),
          col("y.doc_id").as("doc_b"))
        .distinct().count())
      timed("truth_firstmatch") {
        val tkeyed = fp.select(col("doc_id"), col("simhash"),
          posexplode(array(SimhashTruthBands.map { case (off, w) =>
            shiftright(col("simhash"), off).bitwiseAND(lit((1L << w) - 1))
          }: _*)).as(Seq("band", "key")))
        tkeyed.as("x").join(tkeyed.as("y"),
          col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
            col("x.doc_id") < col("y.doc_id"))
          .where(call_function("bit_count", xorv) <= SimhashHammingMax &&
            col("x.band") === firstZeroBand(xorv, SimhashTruthBands))
          .count()
      }
      timed("full_query")(operators.Dedup
        .queries("simhash_recall_frontier")(spark, sfDir).count())
      timed("full_exact_pairs")(operators.Dedup
        .queries("dedup_simhash_pairs_exact")(spark, sfDir).count())
    }
    spark.stop()
  }
}
