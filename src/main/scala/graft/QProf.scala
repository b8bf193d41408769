package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler — current target: the uncapped-funnel probe's stage
  * accounting (prove the URL domain cap is NON-binding on the
  * many-domain re-sourced corpus, so the r11 SCALEPROBE row shows the
  * full DAG at 20× volume, not a 1,600-doc trickle).
  */
object QProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scaleprobe/x20")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.init(spark)
    val nDocs = Tables.documents(spark, dir).count() - 3 // minus giants
    val nDomains = math.max(1L, nDocs / 40L)
    val fillerWords = Seq("the", "and", "of", "to", "in", "is", "it",
      "for", "on", "a")
    val v = graft.operators.TextHash.h60(substring(col("text"), 1, 40))
    val filler = concat_ws(" ", fillerWords.zipWithIndex.flatMap {
      case (w, j) => Seq(lit(w), concat(lit("f"), v, lit("_" + j)))
    }: _*)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        concat(lit("https://d"), pmod(col("doc_id"), lit(nDomains)),
          lit(".com/doc"), col("doc_id")).as("url"),
        concat(col("text"), lit(" "), filler).as("text"))
    val row = graft.operators.Pipeline.pretrainFunnelFor(docs).collect()(0)
    println("FUNNEL " + row.schema.fieldNames.zipWithIndex
      .map { case (f, i) => s"$f=${row.get(i)}" }.mkString(" "))
    spark.stop()
  }
}
