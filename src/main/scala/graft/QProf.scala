package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage profiler (scratch main — retargeted per investigation).
  * Current target: does the scale probe's planted cross-giant overlap
  * (docs 100000/100001 share a ~175-char run inside 2.2M-char documents)
  * surface in wn_overlap_pairs at mult=20?
  */
object QProf {
  def main(args: Array[String]): Unit = {
    val dir = "/tmp/graft_scaleprobe/x20"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.init(spark)
    val pairs = SparkEntry.queries("wn_overlap_pairs")(spark, dir)
    val rows = pairs.collect()
    println(s"TOPPAIRS n=${rows.length}")
    rows.take(10).foreach(r =>
      println(s"PAIR ${r.getLong(0)} ${r.getLong(1)} shared=${r.getLong(2)}"))
    val giant = rows.find(r => r.getLong(0) == 100000L && r.getLong(1) == 100001L)
    println(s"GIANT_PAIR ${giant.map(_.getLong(2))}")
    spark.stop()
  }
}
