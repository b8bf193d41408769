package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** First-order Markov analysis of per-user event sequences: the empirical
  * transition matrix and its stationary distribution (power iteration) —
  * the "where do users end up" summary a behavioral pipeline publishes.
  *
  * Scale shape: the corpus-sized work is ONE window (lag over each user's
  * time-ordered events, partitioned by user_id — the same partitioning
  * every other behavioral query reuses) and ONE map-side-combined groupBy.
  * Everything after is event-type² sized (25 cells here), so the 20 power
  * iterations shuffle a k-row vector, never the corpus. The per-iteration
  * vector-matrix products accumulate in 1e-12 FIXED POINT (associative
  * long sums), so the fixed point is bit-identical across partitionings
  * and engines.
  */
object Markov {

  val Iters = 20
  private val Fix = 1e12

  /** (from_type, to_type, cnt): per-user consecutive event pairs, ordered
    * by (ts, event_id) — event_id breaks timestamp ties deterministically.
    */
  private def transitions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("event_type").as("to_type"),
        lag(col("event_type"), 1).over(w).as("from_type"))
      .where(col("from_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Row-stochastic transition probabilities — exact rationals of the
    * transition counts, so both engines materialize identical doubles.
    */
  private def pMatrix(s: SparkSession, d: String): DataFrame = {
    val t = transitions(s, d)
    val rowT = t.groupBy("from_type").agg(sum("cnt").as("rt"))
    t.join(rowT, "from_type")
      .select(col("from_type"), col("to_type"),
        (col("cnt").cast("double") / col("rt").cast("double")).as("p"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The empirical transition matrix with counts and probabilities.
    "markov_transitions" -> { (s, d) =>
      val t = transitions(s, d)
      val rowT = t.groupBy("from_type").agg(sum("cnt").as("row_total"))
      t.join(rowT, "from_type")
        .select(col("from_type"), col("to_type"), col("cnt"), col("row_total"),
          round(col("cnt").cast("double") / col("row_total").cast("double"), 6)
            .as("prob"))
        .orderBy("from_type", "to_type")
    },

    // π P^n from uniform π — the stationary distribution the chain mixes
    // to. States that receive no transitions surface as 0 via the final
    // left join, keeping the output shape = the state set.
    "markov_stationary" -> { (s, d) =>
      val p = pMatrix(s, d).localCheckpoint()
      val states = events(s, d).select(col("event_type").as("state")).distinct()
      val k = states.agg(count(lit(1)).as("c"))
      var pi = states.crossJoin(broadcast(k))
        .select(col("state"), (lit(1.0) / col("c").cast("double")).as("pi"))
      for (_ <- 1 to Iters) {
        pi = pi.join(p, pi("state") === p("from_type"))
          .groupBy(col("to_type"))
          .agg(sum(round(col("pi") * col("p") * Fix).cast("long")).as("sfix"))
          .select(col("to_type").as("state"),
            (col("sfix").cast("double") / Fix).as("pi"))
          .localCheckpoint()
      }
      states.join(pi, Seq("state"), "left")
        .select(col("state"),
          round(coalesce(col("pi"), lit(0.0)), 6).as("pi"))
        .orderBy("state")
    }
  )

  /** Transition CTEs shared by both oracles. */
  private val trCtes =
    """tr AS (SELECT event_type AS to_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS from_type
      |  FROM events),
      |t AS (SELECT from_type, to_type, count(*) AS cnt FROM tr
      |  WHERE from_type IS NOT NULL GROUP BY from_type, to_type),
      |rt AS (SELECT from_type, CAST(sum(cnt) AS BIGINT) AS row_total
      |  FROM t GROUP BY from_type)""".stripMargin

  val oracles: Map[String, String] = Map(
    "markov_transitions" ->
      s"""WITH $trCtes
         |SELECT t.from_type, t.to_type, t.cnt, rt.row_total,
         |  round(CAST(cnt AS DOUBLE)/CAST(row_total AS DOUBLE), 6) AS prob
         |FROM t JOIN rt ON t.from_type = rt.from_type
         |ORDER BY t.from_type, t.to_type""".stripMargin,

    "markov_stationary" -> {
      val sb = new StringBuilder(
        s"""WITH $trCtes,
           |p AS (SELECT t.from_type, t.to_type,
           |    CAST(cnt AS DOUBLE)/CAST(row_total AS DOUBLE) AS p
           |  FROM t JOIN rt ON t.from_type = rt.from_type),
           |st AS (SELECT DISTINCT event_type AS state FROM events),
           |kc AS (SELECT count(*) AS c FROM st),
           |pi0 AS (SELECT state, 1.0/CAST(c AS DOUBLE) AS pi
           |  FROM st CROSS JOIN kc)""".stripMargin)
      for (r <- 1 to Iters) {
        sb.append(
          s""",
             |pi$r AS (SELECT to_type AS state,
             |    CAST(sum(CAST(round(pi*p*1e12) AS BIGINT)) AS DOUBLE)/1e12 AS pi
             |  FROM pi${r - 1} JOIN p ON pi${r - 1}.state = p.from_type
             |  GROUP BY to_type)""".stripMargin)
      }
      sb.append(
        s"""
           |SELECT st.state, round(coalesce(pi$Iters.pi, 0.0), 6) AS pi
           |FROM st LEFT JOIN pi$Iters ON st.state = pi$Iters.state
           |ORDER BY st.state""".stripMargin)
      sb.toString
    }
  )
}
