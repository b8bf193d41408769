package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch profiler — current target: the r11 additions' floors.
  * Separates one-time plan/codegen cost from steady-state execution by
  * running each query cold, then repeatedly in the same session (the
  * bench's per-query discipline releases caches between runs, mirrored
  * here), so a floor dominated by Janino compilation of a geometry the
  * sf0.001 warm pass never sees (the SIZED queries build a different
  * plan per corpus size) shows up as cold >> warm.
  */
object QProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.init(spark)

    def time(label: String)(f: => DataFrame): Unit = {
      for (i <- 1 to 4) {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        Graft.releaseCaches(spark)
        println(f"$label%-32s run$i ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      }
    }
    for (q <- Seq("dedup_embedding_cosine_sized", "minhash_recall_frontier",
        "ann_knn_graph_sized"))
      time(q)(SparkEntry.queries(q)(spark, dir))
    // decompose: build+analyze+optimize vs execute
    for (q <- Seq("dedup_embedding_cosine_sized", "minhash_recall_frontier")) {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(q)(spark, dir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis + optimization
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        Graft.releaseCaches(spark)
        println(f"$q%-32s i$i build=${(t1 - t0) / 1e9}%5.2fs plan=${(t2 - t1) / 1e9}%5.2fs exec=${(t3 - t2) / 1e9}%5.2fs")
      }
    }
    spark.stop()
  }
}
