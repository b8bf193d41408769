package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan-evidence dump: writes `.explain("formatted")` output for named
  * queries to files, for the plans/rNN before/after record. Not part of
  * the driver contract — a build-time tool like Verify/Bench.
  *
  * Usage: PlanDump <sfDir> <outDir> <suffix> <query> [<query> ...]
  * Writes <outDir>/<query>_<suffix>.txt for each query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val suffix = args(2)
    val names = args.drop(3)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.init(spark)
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val txt =
        try SparkEntry.queries(n)(spark, sfDir).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        catch { case e: Throwable => s"ERROR: ${e.getClass.getName}: ${e.getMessage}" }
      Files.write(Paths.get(outDir, s"${n}_$suffix.txt"), txt.getBytes("UTF-8"))
      println(s"wrote $n ($suffix): ${txt.length} chars")
    }
    spark.stop()
  }
}
