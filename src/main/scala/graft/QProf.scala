package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage profiler (scratch main — retargeted per investigation).
  * Current target: where ann_knn_components' time goes — graph build vs
  * the CC iteration, and how many rounds the CC loop runs on the
  * mutual-kNN graph at sf0.1.
  */
object QProf {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.init(spark)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    // warm-up (mirrors Bench): tables + a tiny CC
    spark.read.parquet(s"$d/embeddings.parquet").count()
    locally {
      val n = spark.range(0, 8).select(col("id"))
      val e = spark.range(0, 6).select(col("id").as("a"), (col("id") + 1).as("b"))
      graft.operators.Components.connectedComponents(n, e).count()
      Graft.releaseCaches(spark)
    }
    val g = graft.operators.Similarity.queries("ann_knn_graph")(spark, d)
    time("knn-graph")(g.count())
    Graft.releaseCaches(spark)
    val m = graft.operators.Similarity.queries("ann_mutual_knn")(spark, d)
      .select(col("a").as("src"), col("b").as("dst")).localCheckpoint()
    time("mutual-graph")(m.count())
    Graft.releaseCaches(spark)
    val nodes = spark.read.parquet(s"$d/embeddings.parquet").select("vec_id")
    time("cc-on-checkpointed-edges") {
      graft.operators.Components.connectedComponents(nodes, m).count()
    }
    println(s"CC rounds = ${graft.operators.Components.lastRounds}")
    Graft.releaseCaches(spark)
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    time("cc-4-shuffle-partitions") {
      graft.operators.Components.connectedComponents(nodes, m).count()
    }
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    Graft.releaseCaches(spark)
    spark.conf.set("spark.databricks.optimizer.adaptive.enabled", "true")
    time("cc-again-32") {
      graft.operators.Components.connectedComponents(nodes, m).count()
    }
    Graft.releaseCaches(spark)
    time("full-ann_knn_components") {
      graft.operators.Similarity.queries("ann_knn_components")(spark, d).count()
    }
    println(s"CC rounds = ${graft.operators.Components.lastRounds}")
    spark.stop()
  }
}
