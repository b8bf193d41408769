package graft.operators

import graft.{Graft, Tables}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage profiler (scratch main — retargeted per investigation).
  * Current target: winnow selections — Window-based vs map-side sliding
  * min. Equality check + wall A/B at sf0.1.
  */
object QProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.init(spark)
    val docs = Tables.documents(spark, dir).select("doc_id", "text")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    import Winnow.{ChunkLen, GramLen, GuaranteeLen, HashMod, PosMax}
    val PosCard = 1L << 20
    import TextHash.h60
    val stride = ChunkLen - (GuaranteeLen - 1)
    // decomposition: positions only / positions+substr / positions+md5 key
    def base = docs
      .where(length(col("text")) >= GuaranteeLen)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), length(col("text")) - GramLen, lit(stride))).as("off"))
      .select(col("doc_id"), col("off"),
        col("text").substr(col("off") + 1, lit(ChunkLen)).as("chunk"),
        (least(lit(ChunkLen), length(col("text")) - col("off")) - (GramLen - 1)).as("ni"))
      .select(col("doc_id"), col("off"), col("chunk"),
        explode(sequence(lit(1), col("ni"))).as("i"))
    def run(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      for (_ <- 1 to 3) time(label)(df.write.format("noop").mode("overwrite").save())
    }
    for (cl <- Seq(127, 255, 511, 4095); _ <- 1 to 2) {
      run(s"mapside cl=$cl")(Winnow.selections(docs, cl))
      run(s"window  cl=$cl")(Winnow.selectionsWindowed(docs, cl))
    }
    spark.stop()
  }
}
