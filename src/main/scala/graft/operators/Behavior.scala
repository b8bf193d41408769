package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Behavioral analytics over the event stream — ordered funnels and cohort
  * retention, the two queries every product-analytics engine ships.
  * Nothing in the reference covers them (SURVEY.md §2.5).
  *
  * Scale shape:
  *   - The funnel is a chain of stage-filtered per-user MIN aggregations,
  *     each joined to the previous stage — every stage SHRINKS the
  *     relation (only users who reached stage k are carried to k+1), and
  *     each step is an equi-join on user_id that reuses the same hash
  *     partitioning. No window over a user's full history, no event-list
  *     collect — the 100 TB event table is touched once per stage with a
  *     stage-type pushdown filter.
  *   - Retention is two map-side-combined aggregations ((user, day)
  *     distinct, then per-user min) and one count per (cohort, offset) —
  *     output is |cohorts|×|offsets|, tiny at any scale.
  *
  * Cross-engine exactness: timestamps are surfaced as epoch MICROSECONDS
  * (unix_micros / epoch_us) — exact BIGINTs, immune to the string/type
  * formatting drift of timestamp columns across engines.
  */
object Behavior {

  /** Strictly-ordered funnel stage times per user: first view, first click
    * AFTER that view, first purchase AFTER that click.
    */
  private def funnel(s: SparkSession, d: String): (DataFrame, DataFrame, DataFrame) = {
    val ev = events(s, d).select(col("user_id"), col("ts"), col("event_type"))
    val v = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("tv"))
    val c = ev.where(col("event_type") === "click").as("e")
      .join(v.as("v"), col("e.user_id") === col("v.user_id") && col("e.ts") > col("v.tv"))
      .groupBy(col("e.user_id").as("user_id")).agg(min("e.ts").as("tc"))
    val p = ev.where(col("event_type") === "purchase").as("e")
      .join(c.as("c"), col("e.user_id") === col("c.user_id") && col("e.ts") > col("c.tc"))
      .groupBy(col("e.user_id").as("user_id")).agg(min("e.ts").as("tp"))
    (v, c, p)
  }

  // -------------------------------------------------------------- queries

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-user funnel timeline: every user who entered the funnel, with
    // the (strictly ordered) stage timestamps they reached. Doc-level
    // output so the oracle checks every user's path, not just totals.
    "funnel_user_paths" -> { (s, d) =>
      val (v, c, p) = funnel(s, d)
      v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .select(col("user_id"),
          unix_micros(col("tv")).as("t_view_us"),
          unix_micros(col("tc")).as("t_click_us"),
          unix_micros(col("tp")).as("t_purchase_us"))
        .orderBy("user_id")
    },

    // Stage totals — the conversion report.
    "funnel_stages" -> { (s, d) =>
      val (v, c, p) = funnel(s, d)
      v.agg(count(lit(1)).as("n_users")).select(lit("1_view").as("stage"), col("n_users"))
        .union(c.agg(count(lit(1)).as("n")).select(lit("2_click").as("stage"), col("n")))
        .union(p.agg(count(lit(1)).as("n")).select(lit("3_purchase").as("stage"), col("n")))
        .orderBy("stage")
    },

    // Cohort retention: users grouped by first-active day; how many of
    // each cohort were active again `offset_days` later.
    "retention_cohorts" -> { (s, d) =>
      val act = events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val first = act.groupBy("user_id").agg(min("day").as("cohort"))
      act.join(first, "user_id")
        .groupBy(col("cohort"), datediff(col("day"), col("cohort")).as("offset_days"))
        .agg(count(lit(1)).as("n_users"))
        .select(col("cohort").cast("string").as("cohort"),
          col("offset_days").cast("int").as("offset_days"), col("n_users"))
        .orderBy("cohort", "offset_days")
    }
  )

  // -------------------------------------------------------------- oracles

  private def funnelCtes =
    """v AS (SELECT user_id, min(ts) AS tv FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.ts) AS tc FROM events e
      |  JOIN v ON e.user_id = v.user_id AND e.ts > v.tv
      |  WHERE e.event_type = 'click' GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.ts) AS tp FROM events e
      |  JOIN c ON e.user_id = c.user_id AND e.ts > c.tc
      |  WHERE e.event_type = 'purchase' GROUP BY 1)""".stripMargin

  val oracles: Map[String, String] = Map(
    "funnel_user_paths" ->
      s"""WITH $funnelCtes
         |SELECT v.user_id, epoch_us(v.tv) AS t_view_us,
         |  epoch_us(c.tc) AS t_click_us, epoch_us(p.tp) AS t_purchase_us
         |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
         |ORDER BY user_id""".stripMargin,

    "funnel_stages" ->
      s"""WITH $funnelCtes
         |SELECT '1_view' AS stage, count(*) AS n_users FROM v
         |UNION ALL SELECT '2_click', count(*) FROM c
         |UNION ALL SELECT '3_purchase', count(*) FROM p
         |ORDER BY stage""".stripMargin,

    "retention_cohorts" ->
      """WITH act AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events),
        |f AS (SELECT user_id, min(day) AS cohort FROM act GROUP BY 1)
        |SELECT CAST(cohort AS VARCHAR) AS cohort,
        |  CAST(date_diff('day', cohort, day) AS INTEGER) AS offset_days,
        |  count(*) AS n_users
        |FROM act JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
