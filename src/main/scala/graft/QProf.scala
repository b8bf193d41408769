package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler — current target: the 20×-probe inversion of
  * `dedup_embedding_cosine_sized` (36 s / 23 MB shuffle at 40k vectors
  * vs 15.8 s / 1.3 GB at 100k: the SMALLER corpus is slower with less
  * shuffle — the signature of an AQE broadcast conversion turning the
  * banded self-join or the verify join into a slow broadcast build).
  */
object QProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scaleprobe/x20")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.init(spark)

    def time(label: String)(f: => DataFrame): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        Graft.releaseCaches(spark)
        println(f"$label%-36s run$i ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      }
    }
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        expr("transform(embedding, v -> CAST(v AS DOUBLE))").as("e"))
    val n = Tables.embeddings(spark, dir).count()
    println(s"n=$n pb=${graft.operators.Similarity.planesForCorpus(n)}")
    time("sized asIs")(
      graft.operators.Dedup.embeddingCosineLshSized(vecs, n))
    spark.conf.set("spark.sql.codegen.hugeMethodLimit", "8000")
    time("sized huge8000")(
      graft.operators.Dedup.embeddingCosineLshSized(vecs, n))
    spark.conf.set("spark.sql.codegen.hugeMethodLimit", "65535")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    time("sized noWSCG")(
      graft.operators.Dedup.embeddingCosineLshSized(vecs, n))
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // where does the time go? count the candidate relation only
    locally {
      val t0 = System.nanoTime()
      val out = graft.operators.Dedup.embeddingCosineLshSized(vecs, n)
      println("rows=" + out.count() + f" count wall=${(System.nanoTime() - t0) / 1e9}%6.2fs")
      out.explain("formatted")
      Graft.releaseCaches(spark)
    }
    spark.stop()
  }
}
