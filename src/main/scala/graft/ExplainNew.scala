package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
/** Plan-audit diagnostic: prints the physical plans of recently-added
  * queries (swap the list as needed). Not part of the driver contract —
  * a build-time tool like Verify/Bench.
  */
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.init(spark)
    val d = "/root/testdata/sf0.001"
    Seq("text_repetition", "text_unigram_nll", "sample_mixture", "boilerplate_ratio", "emb_quantize_pq").foreach { n =>
      println(s"===== $n =====")
      val p = SparkEntry.queries(n)(spark, d).queryExecution
        .explainString(ExplainMode.fromString("simple"))
      println(p.linesIterator.take(45).mkString("\n"))
    }
    spark.stop()
  }
}
