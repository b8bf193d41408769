package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

    // Stage-transition latency: how long converting users take between
    // funnel stages — the p50/p90 conversion-lag report product teams
    // read next to the stage totals. Gaps are exact epoch-micro deltas
    // per converting user (two inner joins of the already-shrinking stage
    // frames); quantiles interpolate over those exact longs, grouped at
    // the 2-row transition grain.
    "funnel_latency" -> { (s, d) =>
      val (v, c, p) = funnel(s, d)
      val vc = c.join(v, "user_id")
        .select(lit("1_view_to_click").as("transition"),
          (unix_micros(col("tc")) - unix_micros(col("tv"))).as("gap_us"))
      val cp = p.join(c, "user_id")
        .select(lit("2_click_to_purchase").as("transition"),
          (unix_micros(col("tp")) - unix_micros(col("tc"))).as("gap_us"))
      vc.union(cp)
        .groupBy("transition")
        .agg(count(lit(1)).as("n_users"),
          round(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY gap_us)") / 1e6, 6)
            .as("median_gap_s"),
          round(expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY gap_us)") / 1e6, 6)
            .as("p90_gap_s"),
          round(max(col("gap_us")).cast("double") / 1e6, 6).as("max_gap_s"))
        .orderBy("transition")
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
    },

    // Rolling engagement: per-day DAU, trailing-7-day WAU, and the
    // DAU/WAU stickiness ratio. The rolling distinct is NOT a sliding
    // window over raw events (count distinct doesn't slide): each active
    // (day, user) is exploded into the 7 days it keeps the user "weekly
    // active" for, then deduped — two (day,user)-sized shuffles, corpus
    // touched once. Trailing days past the observation end are clipped by
    // the dau join (only observed days report).
    "rolling_dau_wau" -> { (s, d) =>
      val act = events(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val dau = act.groupBy("day").agg(count(lit(1)).as("dau"))
      val wau = act
        .select(explode(sequence(col("day"), date_add(col("day"), 6)))
          .as("day"), col("user_id"))
        .distinct()
        .groupBy("day").agg(count(lit(1)).as("wau"))
      dau.join(wau, "day")
        .select(col("day").cast("string").as("day"), col("dau"), col("wau"),
          round(col("dau").cast("double") / col("wau").cast("double"), 6)
            .as("stickiness"))
        .orderBy("day")
    },

    // Inter-arrival gap distribution per event type: consecutive same-user
    // same-type gaps via one lag window (shuffle on user_id), quantiles
    // over exact epoch-micros longs (interpolation is then a deterministic
    // double op — same contract as q_percentile_cont).
    "ts_interarrival" -> { (s, d) =>
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("us"), col("event_id"))
      events(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("gap_us", col("us") - lag("us", 1).over(w))
        .where(col("gap_us").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_gaps"),
          round(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY gap_us)") / 1e6, 6)
            .as("median_gap_s"),
          round(expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY gap_us)") / 1e6, 6)
            .as("p90_gap_s"),
          round(max(col("gap_us")).cast("double") / 1e6, 6).as("max_gap_s"))
        .orderBy("event_type")
    },

    // SFT-style conversation assembly — the chat-template render step of
    // an instruction-data pipeline, run on the event stream as a stand-in
    // transcript: per user, events become role-tagged turns (ordered by
    // (ts, event_id) — a total order), ADJACENT SAME-ROLE turns merge
    // (the standard chat-prep consolidation move) via an island window,
    // and the conversation renders to a single delimited string with a
    // length-cap truncation flag. Scale shape: one shuffle on user_id
    // that the turn window, the turn merge and the final render all
    // reuse; per-user windows are bounded by per-user activity (the
    // repo-wide sessionization precedent). Within-group order is made
    // deterministic by sorting the collected (sort-key, text) structs —
    // the collect_list is per-turn / per-conversation sized, never
    // corpus-sized.
    "chat_render" -> { (s, d) =>
      val ev = events(s, d).select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type").isin("click", "view", "signup"), "user")
          .otherwise("assistant").as("role"),
        concat(col("event_type"), lit(" k="),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1)).as("content"))
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val turns = ev
        .withColumn("brk",
          when(lag("role", 1).over(w).isNull ||
            lag("role", 1).over(w) =!= col("role"), 1L).otherwise(0L))
        .withColumn("turn", sum("brk").over(w))
      val merged = turns.groupBy("user_id", "turn")
        .agg(min("role").as("role"), count(lit(1)).as("n_ev"),
          array_join(transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"),
              col("content")))),
            x => x.getField("content")), " ").as("c"))
      merged.groupBy("user_id")
        .agg(sum("n_ev").as("n_events"), count(lit(1)).as("n_turns"),
          array_join(transform(
            array_sort(collect_list(struct(col("turn"),
              concat(col("role"), lit(": "), col("c")).as("line")))),
            x => x.getField("line")), " <eot> ").as("rendered"))
        .select(col("user_id"), col("n_events"), col("n_turns"),
          length(col("rendered")).as("n_chars"),
          substring(col("rendered"), 1, 300).as("rendered_head"),
          (length(col("rendered")) > 300).as("truncated"))
        .orderBy("user_id")
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

    "funnel_latency" ->
      s"""WITH $funnelCtes,
         |g AS (SELECT '1_view_to_click' AS transition,
         |    epoch_us(c.tc) - epoch_us(v.tv) AS gap_us
         |  FROM c JOIN v USING (user_id)
         |  UNION ALL
         |  SELECT '2_click_to_purchase',
         |    epoch_us(p.tp) - epoch_us(c.tc)
         |  FROM p JOIN c USING (user_id))
         |SELECT transition, count(*) AS n_users,
         |  round(quantile_cont(gap_us, 0.5) / 1e6, 6) AS median_gap_s,
         |  round(quantile_cont(gap_us, 0.9) / 1e6, 6) AS p90_gap_s,
         |  round(CAST(max(gap_us) AS DOUBLE) / 1e6, 6) AS max_gap_s
         |FROM g GROUP BY transition ORDER BY transition""".stripMargin,

    "retention_cohorts" ->
      """WITH act AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events),
        |f AS (SELECT user_id, min(day) AS cohort FROM act GROUP BY 1)
        |SELECT CAST(cohort AS VARCHAR) AS cohort,
        |  CAST(date_diff('day', cohort, day) AS INTEGER) AS offset_days,
        |  count(*) AS n_users
        |FROM act JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "rolling_dau_wau" ->
      """WITH act AS (SELECT DISTINCT ts::DATE AS day, user_id FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM act GROUP BY day),
        |ex AS (SELECT DISTINCT day + CAST(i AS INTEGER) AS day, user_id
        |  FROM act CROSS JOIN (SELECT unnest(range(0, 7)) AS i)),
        |wau AS (SELECT day, count(*) AS wau FROM ex GROUP BY day)
        |SELECT CAST(d.day AS VARCHAR) AS day, d.dau, w.wau,
        |  round(CAST(d.dau AS DOUBLE) / CAST(w.wau AS DOUBLE), 6) AS stickiness
        |FROM dau d JOIN wau w ON d.day = w.day ORDER BY day""".stripMargin,

    "ts_interarrival" ->
      """WITH g AS (SELECT user_id, event_type, epoch_us(ts)
        |    - lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
        |        ORDER BY ts, event_id) AS gap_us
        |  FROM events)
        |SELECT event_type, count(*) AS n_gaps,
        |  round(quantile_cont(gap_us, 0.5) / 1e6, 6) AS median_gap_s,
        |  round(quantile_cont(gap_us, 0.9) / 1e6, 6) AS p90_gap_s,
        |  round(CAST(max(gap_us) AS DOUBLE) / 1e6, 6) AS max_gap_s
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "chat_render" ->
      """WITH ev AS (SELECT user_id, ts, event_id,
        |    CASE WHEN event_type IN ('click', 'view', 'signup')
        |         THEN 'user' ELSE 'assistant' END AS role,
        |    event_type || ' k=' || regexp_extract(props, '"k": (\d+)', 1)
        |      AS content
        |  FROM events),
        |b AS (SELECT *, CASE WHEN lag(role) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id)
        |      IS DISTINCT FROM role THEN 1 ELSE 0 END AS brk FROM ev),
        |t AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS turn FROM b),
        |m AS (SELECT user_id, turn, min(role) AS role, count(*) AS n_ev,
        |    string_agg(content, ' ' ORDER BY ts, event_id) AS c
        |  FROM t GROUP BY 1, 2),
        |r AS (SELECT user_id, CAST(sum(n_ev) AS BIGINT) AS n_events,
        |    count(*) AS n_turns,
        |    string_agg(role || ': ' || c, ' <eot> ' ORDER BY turn) AS rendered
        |  FROM m GROUP BY 1)
        |SELECT user_id, n_events, n_turns,
        |  CAST(len(rendered) AS INTEGER) AS n_chars,
        |  substr(rendered, 1, 300) AS rendered_head,
        |  len(rendered) > 300 AS truncated
        |FROM r ORDER BY user_id""".stripMargin
  )
}
