package graft

import org.apache.spark.sql.SparkSession

/** Codegen-boundary audit for the custom physical operators (GroupTopK,
  * MaxPerKey). Both execute via `mapPartitions` over InternalRow, which
  * BREAKS whole-stage codegen at their boundary; this main measures
  * whether that break costs anything relative to the alternative — the
  * stock WindowExec path the kill switches restore (itself not
  * codegen'd: WindowExec is no CodegenSupport operator either). Warm-JVM
  * medians of 3 runs per variant at the bench SF; results recorded in
  * BASELINE.md and the operator file headers.
  */
object CodegenAudit {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.init(spark)

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, d).write.format("noop").mode("overwrite").save()
      Graft.releaseCaches(spark)
      (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    val cases = Seq(
      ("q_topk_per_segment", "spark.graft.groupTopK.enabled"),
      ("q_max_join_elim", "spark.graft.maxPerKey.enabled"))
    // one untimed pass to absorb codegen/classloading for both paths
    cases.foreach { case (q, flag) =>
      run(q)
      spark.conf.set(flag, "false"); run(q); spark.conf.unset(flag)
    }
    cases.foreach { case (q, flag) =>
      val on = median((1 to 3).map(_ => run(q)))
      spark.conf.set(flag, "false")
      val off = try median((1 to 3).map(_ => run(q)))
      finally spark.conf.unset(flag)
      println(f"AUDIT $q operator=$on%.2fs window=$off%.2fs ratio=${on / off}%.2f")
    }
    spark.stop()
  }
}
