package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{Encoders, functions => F}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.CountMinSketchAgg
import TextHash.{toksSql, toks}

/** Mergeable frequency sketching — Count-Min Sketch over the corpus token
  * stream, built by the typed Aggregator [[CountMinSketchAgg]].
  *
  * The scale story is the whole point: the exact token histogram at 100 TB
  * is vocabulary-sized (huge, shuffled); the CMS is a CONSTANT 4×64 counter
  * matrix whose partial states map-side combine and merge associatively —
  * the corpus reduces to one array without any vocabulary shuffle. The
  * estimates query then audits the sketch against the exact counts (cheap
  * at fixture scale) and locks the one-sided-error contract
  * (estimate ≥ exact, always).
  */
object Sketches {

  private val Depth = CountMinSketchAgg.Depth
  private val Width = CountMinSketchAgg.Width

  private val cms = F.udaf(CountMinSketchAgg, Encoders.STRING)

  private def tokens(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(explode(toks(col("text"))).as("tok"))

  // -------------------------------------------------------------- queries

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The sketch itself, flattened to (row, bucket, count) cells — every
    // populated counter is oracle-checked, which verifies the md5 bucket
    // function, the reduce path AND the merge path (32 shuffle partitions
    // guarantee merges happened).
    "cms_matrix" -> { (s, d) =>
      tokens(s, d)
        .agg(cms(col("tok")).as("sketch"))
        .select(posexplode(col("sketch")).as(Seq("idx", "cnt")))
        .select(expr(s"idx DIV $Width").cast("int").as("row_idx"),
          (col("idx") % Width).cast("int").as("bucket"), col("cnt"))
        .where(col("cnt") > 0)
        .orderBy("row_idx", "bucket")
    },

    // Point-query audit: CMS estimate vs exact count for the top-10
    // tokens. est = min over rows of the addressed cell; the one-sided
    // error bound (never underestimates) is part of the oracled output.
    "cms_estimates" -> { (s, d) =>
      val tok = tokens(s, d)
      val exact = tok.groupBy("tok").agg(count(lit(1)).as("exact"))
      val sk = tok.agg(cms(col("tok")).as("sketch"))
      val est = least((0 until Depth).map { j =>
        element_at(col("sketch"),
          ((conv(substring(md5(col("tok")), 1 + 4 * j, 4), 16, 10).cast("long")
            % Width).cast("int") + lit(j * Width) + lit(1)))
      }: _*)
      exact.crossJoin(broadcast(sk))
        .select(col("tok").as("term"), col("exact"), est.as("est"),
          (est >= col("exact")).as("no_underestimate"))
        .orderBy(desc("exact"), asc("term"))
        .limit(10)
    }
  )

  // -------------------------------------------------------------- oracles

  private def cmsCtes =
    s"""tok AS (SELECT unnest(${toksSql("text")}) AS t FROM documents),
       |g AS (SELECT unnest(range(0, $Depth)) AS j),
       |h AS (SELECT t, j,
       |  CAST(('0x' || substr(md5(t), CAST(1 + 4 * j AS INTEGER), 4)) AS BIGINT) % $Width AS b
       |  FROM tok CROSS JOIN g),
       |cells AS (SELECT j, b, count(*) AS c FROM h GROUP BY 1, 2)""".stripMargin

  val oracles: Map[String, String] = Map(
    "cms_matrix" ->
      s"""WITH $cmsCtes
         |SELECT CAST(j AS INTEGER) AS row_idx, CAST(b AS INTEGER) AS bucket, c AS cnt
         |FROM cells ORDER BY 1, 2""".stripMargin,

    "cms_estimates" ->
      s"""WITH $cmsCtes,
         |th AS (SELECT DISTINCT t, j, b FROM h),
         |est AS (SELECT t, min(c) AS est FROM th JOIN cells USING (j, b) GROUP BY t),
         |ex AS (SELECT t, count(*) AS exact FROM tok GROUP BY t)
         |SELECT t AS term, exact, est, est >= exact AS no_underestimate
         |FROM ex JOIN est USING (t) ORDER BY exact DESC, term LIMIT 10""".stripMargin
  )
}
