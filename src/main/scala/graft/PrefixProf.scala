package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling main: sub-stage timings of the prefixJaccardPairs
  * pipeline (the substrate behind dedup_ngram_jaccard /
  * dedup_threshold_curve / minhash audit+frontier truth sides /
  * dedup_jaccard_prefix). Times each intermediate relation's first full
  * materialization at the given threshold so optimization effort lands on
  * the stage that actually dominates.
  * Usage: tools/run_main.sh graft.PrefixProf [sfDir] [num den]
  */
object PrefixProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val (num, den) =
      if (args.length >= 3) (args(1).toInt, args(2).toInt) else (1, 2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.init(spark)
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    // warm pass so scan+codegen cost doesn't pollute the stage deltas
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    timed("warm_full")(operators.Dedup.prefixJaccardPairs(docs, num, den).count())
    Graft.releaseCaches(spark)
    for (rep <- 1 to 2) {
      println(s"-- rep $rep (num=$num den=$den)")
      val e = operators.Dedup.shingleIndex(docs).persist()
      timed("shingleIndex")(e.count())
      val pref = timed("prefixRows") {
        val p = operators.Dedup.prefixRows(e, num, den).persist()
        p.count(); p
      }
      val cand = timed("candidates") {
        val c = pref.as("a")
          .join(pref.as("b"),
            col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id") &&
              col("b.nsh") * den >= col("a.nsh") * num &&
              col("a.nsh") * den >= col("b.nsh") * num)
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct().persist()
        c.count(); c
      }
      timed("verify+full") {
        operators.Dedup.prefixJaccardPairs(docs, num, den).count()
      }
      println(s"   rows: e=${e.count()} pref=${pref.count()} cand=${cand.count()}")
      Graft.releaseCaches(spark)
      e.unpersist(); pref.unpersist(); cand.unpersist()
    }
    spark.stop()
  }
}
