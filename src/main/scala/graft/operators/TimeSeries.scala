package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Time-series reshaping over the event stream — the gap-filling /
  * resampling steps a feature pipeline runs before any rolling analytics.
  * Nothing in the reference's category list covers these (SURVEY.md §2.5);
  * they complement the as-of join (Joins.asofJoin) and the range window
  * (q_range_window).
  *
  * Scale shape: everything is keyed per user_id —
  *   - the daily rollup is one map-side-combined groupBy,
  *   - the calendar grid is generated per user from that user's own
  *     [min, max] span (sequence + explode) — NEVER a global calendar
  *     cross join, which at 100 TB would materialize |users|×|days| rows
  *     before the join instead of only each user's active span,
  *   - LOCF is a per-user window (last over ignoreNulls) — one shuffle on
  *     user_id that the grid join already established.
  *
  * Cross-engine exactness: counts and dates are exact; the carried value
  * is max(floor(value*1000)) — a deterministic IEEE multiply+floor into
  * BIGINT (sums of raw doubles are order-dependent across engines and are
  * deliberately avoided; max/min are order-independent). OHLC picks raw
  * column values by a total (ts, event_id) order — no arithmetic at all.
  */
object TimeSeries {

  /** Per-user daily rollup: count + scaled-integer value max. */
  private def daily(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      .groupBy("user_id", "day")
      .agg(count(lit(1)).as("n_ev"),
        max(floor(col("value") * 1000).cast("long")).as("vmax1k"))

  // -------------------------------------------------------------- queries

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Calendar gap-fill with last-observation-carried-forward: every user
    // gets one row per day of their own active span; days with no events
    // are flagged and carry the last seen daily max forward.
    "ts_gapfill" -> { (s, d) =>
      val dly = daily(s, d)
      val grid = dly.groupBy("user_id")
        .agg(min("day").as("d0"), max("day").as("d1"))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
      val w = Window.partitionBy("user_id").orderBy("day")
      grid.join(dly, Seq("user_id", "day"), "left")
        .withColumn("is_gap", col("n_ev").isNull)
        .withColumn("n_events", coalesce(col("n_ev"), lit(0L)))
        .withColumn("locf_vmax1k", last("vmax1k", ignoreNulls = true).over(w))
        .orderBy("user_id", "day")
        // ISO string for the hash compare: DATE surfaces as differently-
        // typed objects in the two engines' parquet/pandas paths
        .select(col("user_id"), col("day").cast("string").as("day"),
          col("n_events"), col("is_gap"), col("locf_vmax1k"))
    },

    // Tukey-fence anomaly detection: per-type quartiles (an ordered-set
    // aggregate over each bounded event-type group), fences at 1.5×IQR,
    // then one broadcast join back to count outliers. Quantile
    // interpolation is deterministic selection + one IEEE lerp (no
    // order-dependent double sums), so both engines agree bit-for-bit.
    "anomaly_iqr" -> { (s, d) =>
      events(s, d).createOrReplaceTempView("g_an_events")
      s.sql(
        """WITH b AS (SELECT event_type,
          |    percentile_cont(0.25) WITHIN GROUP (ORDER BY value) AS q1,
          |    percentile_cont(0.75) WITHIN GROUP (ORDER BY value) AS q3
          |  FROM g_an_events GROUP BY event_type)
          |SELECT e.event_type, count(*) AS n,
          |  sum(CASE WHEN e.value < q1 - 1.5*(q3 - q1)
          |           OR e.value > q3 + 1.5*(q3 - q1) THEN 1 ELSE 0 END)
          |    AS n_outliers,
          |  round(any_value(q1), 6) AS q1, round(any_value(q3), 6) AS q3
          |FROM g_an_events e JOIN b ON e.event_type = b.event_type
          |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin)
    },

    // The flagged rows themselves — the "quarantine feed" downstream of
    // the fence computation above.
    "anomaly_rows" -> { (s, d) =>
      events(s, d).createOrReplaceTempView("g_an_events")
      s.sql(
        """WITH b AS (SELECT event_type,
          |    percentile_cont(0.25) WITHIN GROUP (ORDER BY value) AS q1,
          |    percentile_cont(0.75) WITHIN GROUP (ORDER BY value) AS q3
          |  FROM g_an_events GROUP BY event_type)
          |SELECT e.event_id, e.event_type, e.value
          |FROM g_an_events e JOIN b ON e.event_type = b.event_type
          |WHERE e.value < q1 - 1.5*(q3 - q1) OR e.value > q3 + 1.5*(q3 - q1)
          |ORDER BY e.event_id""".stripMargin)
    },

    // Robust-statistics counterpart of the IQR fences: median/MAD outlier
    // detection per event_type — modified z = |x − med| / (1.4826·MAD) > 3.
    // MAD (median absolute deviation) shrugs off the outliers themselves
    // where stddev is dragged by them; the two exact medians run as
    // per-group percentile_cont (grain = event_type, bounded), same
    // engine-parity precedent as anomaly_iqr.
    "anomaly_mad" -> { (s, d) =>
      events(s, d).createOrReplaceTempView("g_an_events")
      s.sql(
        """WITH m AS (SELECT event_type,
          |    percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS med
          |  FROM g_an_events GROUP BY event_type),
          |md AS (SELECT e.event_type,
          |    percentile_cont(0.5) WITHIN GROUP (ORDER BY abs(e.value - m.med)) AS mad
          |  FROM g_an_events e JOIN m ON e.event_type = m.event_type
          |  GROUP BY e.event_type)
          |SELECT e.event_type, count(*) AS n,
          |  sum(CASE WHEN abs(e.value - m.med) > 3 * 1.4826 * md.mad
          |      THEN 1 ELSE 0 END) AS n_outliers,
          |  round(any_value(m.med), 6) AS med, round(any_value(md.mad), 6) AS mad
          |FROM g_an_events e
          |  JOIN m ON e.event_type = m.event_type
          |  JOIN md ON e.event_type = md.event_type
          |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin)
    },

    // Downsample to per-user daily OHLC bars: open/close by total
    // (ts, event_id) order, high/low as order-independent extremes. The
    // classic resample — two window passes over one user_id shuffle.
    "ts_resample_ohlc" -> { (s, d) =>
      val ev = events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"),
          col("ts"), col("event_id"), col("value"))
      val asc = Window.partitionBy("user_id", "day")
        .orderBy(col("ts").asc, col("event_id").asc)
      val desc = Window.partitionBy("user_id", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      ev.withColumn("rn_a", row_number().over(asc))
        .withColumn("rn_d", row_number().over(desc))
        .groupBy("user_id", "day")
        .agg(count(lit(1)).as("n_events"),
          max(when(col("rn_a") === 1, col("value"))).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max(when(col("rn_d") === 1, col("value"))).as("close"))
        .orderBy("user_id", "day")
        .select(col("user_id"), col("day").cast("string").as("day"),
          col("n_events"), col("open"), col("high"), col("low"), col("close"))
    },

    // Half-life-decayed activity score per user — the recency weighting a
    // freshness-aware sampler or engagement ranker uses. One map-side-
    // combined groupBy on user_id; the anchor date is a 1-row broadcast.
    // Exactness trick: with a 1-day half-life the weight is 2^-age — an
    // EXACT power of two built by integer shift (never pow(), whose libm
    // could differ), scaled to 1e12 fixed point by one IEEE division
    // (exact exponent shift) and summed as longs. Ages > 62 would
    // overflow the shift and contribute < 2^-62 ≈ 0 anyway — clamped to
    // 0 in both engines. Long-sum headroom: 1e12 × n_events(user); at
    // real scale bump Fix down or pre-aggregate per (user, day) first
    // (day-grain counts × one weight per day).
    "ts_decay_scores" -> { (s, d) =>
      val ev = events(s, d)
      val mx = ev.agg(max(to_date(col("ts"))).as("mxd"))
      ev.select(col("user_id"), to_date(col("ts")).as("dt"))
        .crossJoin(broadcast(mx))
        .withColumn("age", datediff(col("mxd"), col("dt")))
        .withColumn("dc",
          when(col("age") <= 62,
            round(lit(1e12) / expr("shiftleft(CAST(1 AS BIGINT), age)"))
              .cast("long"))
            .otherwise(lit(0L)))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("dc")).cast("double") / 1e12, 6).as("decayed_score"),
          min("age").cast("int").as("last_seen_days"))
        .orderBy(desc("decayed_score"), asc("user_id"))
    },

    // CUSUM change-point detection on the global daily event count — the
    // level-shift monitor a pipeline runs on ingest volume. The textbook
    // recursion S_t = max(0, S_{t-1} + d_t) is not window-expressible, but
    // its closed form IS: S_t = C_t − min(0, min_{j≤t} C_j) with C the
    // plain cumulative sum of deviations (the 0 is the virtual C of the
    // empty prefix; the downward side mirrors off the running max). Deviations are scaled by N (d*_t = n_t·N − total) so
    // everything stays in exact BIGINT arithmetic — no float drift between
    // engines. The day grain bounds the windowed relation at |days| rows
    // regardless of corpus size; the single-partition window is safe for
    // the same reason as eval_auc's (Learn.scala byScore note).
    "ts_cusum" -> { (s, d) => cusumOf(dailyEventCounts(events(s, d))) },

    // Robust monotone-trend screen on the daily ingest-volume series:
    // Mann-Kendall S / tau-a (is volume drifting?) and the Theil-Sen
    // estimator (how fast, in events/day?) — the non-parametric pair a
    // pipeline monitor prefers over OLS because a single spiky day cannot
    // drag either statistic. Both run over the day-PAIR relation
    // (a.day < b.day), which is day-grain bounded (|days|² rows — ~10⁵
    // for years of data — regardless of corpus size, same argument as
    // ts_autocorr's probe join). S is an exact integer sum of explicit
    // CASE comparisons; the slope median is percentile_cont over IEEE
    // divisions shared digit-for-digit with the oracle (interpolation
    // parity precedent: anomaly_iqr).
    "ts_trend" -> { (s, d) =>
      dailyEventCounts(events(s, d)).createOrReplaceTempView("g_tr_daily")
      s.sql(
        """WITH p AS (SELECT a.n_ev AS va, b.n_ev AS vb,
          |    datediff(b.day, a.day) AS dd
          |  FROM g_tr_daily a JOIN g_tr_daily b ON a.day < b.day)
          |SELECT (SELECT count(*) FROM g_tr_daily) AS n_days,
          |  count(*) AS n_pairs,
          |  CAST(sum(CASE WHEN vb > va THEN 1 WHEN vb < va THEN -1 ELSE 0 END)
          |    AS BIGINT) AS mk_s,
          |  round(CAST(sum(CASE WHEN vb > va THEN 1 WHEN vb < va THEN -1 ELSE 0 END)
          |      AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mk_tau,
          |  round(percentile_cont(0.5) WITHIN GROUP
          |    (ORDER BY CAST(vb - va AS DOUBLE) / CAST(dd AS DOUBLE)), 6)
          |    AS ts_slope
          |FROM p""".stripMargin)
    },

    // Autocorrelation function of the daily ingest-volume series at lags
    // 1..7 — the seasonality screen (a weekly cycle shows as an acf(7)
    // spike) run before trusting any day-grain drift monitor. Pearson r
    // between the series and its k-shifted self over the OVERLAPPING days
    // only: the series explodes into (lag, day+lag) probes equi-joined
    // back against itself — day-grain bounded relation, never a window —
    // and all five moments are exact integer sums; the one double
    // expression is shared digit-for-digit with the oracle.
    "ts_autocorr" -> { (s, d) =>
      val dly = dailyEventCounts(events(s, d))
      val probes = dly
        .select(col("day"), col("n_ev").as("a"),
          explode(array((1 to 7).map(lit): _*)).as("lag"))
        .select(col("lag"), expr("date_add(day, lag)").as("day2"), col("a"))
      val j = probes.join(
        dly.select(col("day").as("day2"), col("n_ev").as("b")), "day2")
      def d2(c: org.apache.spark.sql.Column) = c.cast("double")
      val agg = j.groupBy("lag")
        .agg(count(lit(1)).as("n"), sum("a").as("sa"), sum("b").as("sb"),
          sum(col("a") * col("a")).as("saa"),
          sum(col("b") * col("b")).as("sbb"),
          sum(col("a") * col("b")).as("sab"))
      val varA = d2(col("n")) * d2(col("saa")) - d2(col("sa")) * d2(col("sa"))
      val varB = d2(col("n")) * d2(col("sbb")) - d2(col("sb")) * d2(col("sb"))
      // a CONSTANT overlapping series has zero variance — the correlation
      // is undefined; NULL in both engines, not a 0/0 NaN/inf divergence
      // (same guard as graph_assortativity)
      agg.select(col("lag"), col("n"),
          when(varA * varB === 0.0, lit(null).cast("double"))
            .otherwise(round(
              (d2(col("n")) * d2(col("sab")) - d2(col("sa")) * d2(col("sb"))) /
                sqrt(varA * varB), 6)).as("acf"))
        .orderBy("lag")
    }
  )

  /** Per-day global event counts — works verbatim on a STREAMING events
    * frame too (unwindowed agg, Complete mode), which is how the streaming
    * CUSUM monitor runs phase 1 with day-grain bounded state.
    */
  def dailyEventCounts(ev: DataFrame): DataFrame =
    ev.select(to_date(col("ts")).as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_ev"))

  /** CUSUM finisher over a (day, n_ev) relation — shared VERBATIM by the
    * batch ts_cusum query and the streaming monitor's foreachBatch phase,
    * so the monitor's table equals the batch answer after any micro-batch
    * (exact integer arithmetic; no order dependence).
    */
  def cusumOf(dly: DataFrame): DataFrame = {
    val tot = dly.agg(sum("n_ev").as("total"), count(lit(1)).as("n_days"))
    val wRun = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(lit(0)) // whole-relation frame
    dly.crossJoin(broadcast(tot))
      .withColumn("c",
        sum(col("n_ev") * col("n_days") - col("total")).over(wRun))
      // the running extremum must include the virtual C_{-1} = 0 of the
      // empty prefix — that is what makes the closed form match the
      // textbook recursion at the first rows (AuditSpec proves equality)
      .withColumn("cusum_up", col("c") - least(lit(0L), min("c").over(wRun)))
      .withColumn("cusum_down",
        greatest(lit(0L), max("c").over(wRun)) - col("c"))
      .withColumn("is_peak_shift",
        col("cusum_up") === max("cusum_up").over(wAll))
      .select(col("day").cast("string").as("day"), col("n_ev"),
        col("cusum_up"), col("cusum_down"), col("is_peak_shift"))
      .orderBy("day")
  }

  // -------------------------------------------------------------- oracles

  private def dailyCte =
    """daily AS (SELECT user_id, ts::DATE AS day, count(*) AS n_ev,
      |    max(CAST(floor(value * 1000) AS BIGINT)) AS vmax1k
      |  FROM events GROUP BY 1, 2)""".stripMargin

  private val fenceCte =
    """b AS (SELECT event_type,
      |    quantile_cont(value, 0.25) AS q1,
      |    quantile_cont(value, 0.75) AS q3
      |  FROM events GROUP BY event_type)""".stripMargin

  val oracles: Map[String, String] = Map(
    "anomaly_iqr" ->
      s"""WITH $fenceCte
         |SELECT e.event_type, count(*) AS n,
         |  CAST(sum(CASE WHEN e.value < q1 - 1.5*(q3 - q1)
         |           OR e.value > q3 + 1.5*(q3 - q1) THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_outliers,
         |  round(any_value(q1), 6) AS q1, round(any_value(q3), 6) AS q3
         |FROM events e JOIN b ON e.event_type = b.event_type
         |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "anomaly_rows" ->
      s"""WITH $fenceCte
         |SELECT e.event_id, e.event_type, e.value
         |FROM events e JOIN b ON e.event_type = b.event_type
         |WHERE e.value < q1 - 1.5*(q3 - q1) OR e.value > q3 + 1.5*(q3 - q1)
         |ORDER BY e.event_id""".stripMargin,

    "anomaly_mad" ->
      """WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY event_type),
        |md AS (SELECT e.event_type,
        |    quantile_cont(abs(e.value - m.med), 0.5) AS mad
        |  FROM events e JOIN m ON e.event_type = m.event_type
        |  GROUP BY e.event_type)
        |SELECT e.event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN abs(e.value - m.med) > 3 * 1.4826 * md.mad
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  round(any_value(m.med), 6) AS med, round(any_value(md.mad), 6) AS mad
        |FROM events e
        |  JOIN m ON e.event_type = m.event_type
        |  JOIN md ON e.event_type = md.event_type
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "ts_gapfill" ->
      s"""WITH $dailyCte,
         |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
         |grid AS (SELECT user_id,
         |    unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM span)
         |SELECT g.user_id, CAST(g.day AS VARCHAR) AS day,
         |  CAST(COALESCE(d.n_ev, 0) AS BIGINT) AS n_events,
         |  d.n_ev IS NULL AS is_gap,
         |  last_value(d.vmax1k IGNORE NULLS)
         |    OVER (PARTITION BY g.user_id ORDER BY g.day) AS locf_vmax1k
         |FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
         |ORDER BY g.user_id, g.day""".stripMargin,

    "ts_resample_ohlc" ->
      """WITH e AS (SELECT user_id, ts::DATE AS day, ts, event_id, value,
        |    row_number() OVER (PARTITION BY user_id, ts::DATE
        |      ORDER BY ts ASC, event_id ASC) AS rn_a,
        |    row_number() OVER (PARTITION BY user_id, ts::DATE
        |      ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events)
        |SELECT user_id, CAST(day AS VARCHAR) AS day, count(*) AS n_events,
        |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |  max(value) AS high, min(value) AS low,
        |  max(CASE WHEN rn_d = 1 THEN value END) AS close
        |FROM e GROUP BY user_id, day ORDER BY user_id, day""".stripMargin,

    "ts_decay_scores" ->
      """WITH mx AS (SELECT max(ts::DATE) AS mxd FROM events),
        |a AS (SELECT user_id, date_diff('day', ts::DATE, mxd) AS age
        |  FROM events CROSS JOIN mx),
        |t AS (SELECT user_id, age,
        |    CASE WHEN age <= 62
        |      THEN CAST(round(1e12 / (CAST(1 AS BIGINT) << age)) AS BIGINT)
        |      ELSE CAST(0 AS BIGINT) END AS dc
        |  FROM a)
        |SELECT user_id, count(*) AS n_events,
        |  round(CAST(sum(dc) AS DOUBLE) / 1e12, 6) AS decayed_score,
        |  CAST(min(age) AS INTEGER) AS last_seen_days
        |FROM t GROUP BY user_id
        |ORDER BY decayed_score DESC, user_id""".stripMargin,

    "ts_cusum" ->
      """WITH dly AS (SELECT ts::DATE AS day, count(*) AS n_ev
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_ev) AS BIGINT) AS total,
        |    count(*) AS n_days FROM dly),
        |c AS (SELECT day, n_ev,
        |    CAST(sum(n_ev * n_days - total)
        |      OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
        |  FROM dly CROSS JOIN tot),
        |s AS (SELECT day, n_ev,
        |    c - least(0, min(c) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)) AS cusum_up,
        |    greatest(0, max(c) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)) - c AS cusum_down
        |  FROM c)
        |SELECT CAST(day AS VARCHAR) AS day, n_ev, cusum_up, cusum_down,
        |  cusum_up = max(cusum_up) OVER () AS is_peak_shift
        |FROM s ORDER BY day""".stripMargin,

    "ts_trend" ->
      """WITH dly AS (SELECT ts::DATE AS day, count(*) AS n_ev
        |  FROM events GROUP BY 1),
        |p AS (SELECT a.n_ev AS va, b.n_ev AS vb,
        |    date_diff('day', a.day, b.day) AS dd
        |  FROM dly a JOIN dly b ON a.day < b.day)
        |SELECT (SELECT count(*) FROM dly) AS n_days,
        |  count(*) AS n_pairs,
        |  CAST(sum(CASE WHEN vb > va THEN 1 WHEN vb < va THEN -1 ELSE 0 END)
        |    AS BIGINT) AS mk_s,
        |  round(CAST(sum(CASE WHEN vb > va THEN 1 WHEN vb < va THEN -1 ELSE 0 END)
        |      AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mk_tau,
        |  round(quantile_cont(CAST(vb - va AS DOUBLE) / CAST(dd AS DOUBLE), 0.5), 6)
        |    AS ts_slope
        |FROM p""".stripMargin,

    "ts_autocorr" ->
      """WITH dly AS (SELECT ts::DATE AS day, count(*) AS n_ev
        |  FROM events GROUP BY 1),
        |pr AS (SELECT lag, day + CAST(lag AS INTEGER) AS day2, n_ev AS a
        |  FROM dly CROSS JOIN (SELECT unnest(range(1, 8)) AS lag)),
        |j AS (SELECT pr.lag, pr.a, d2.n_ev AS b
        |  FROM pr JOIN dly d2 ON pr.day2 = d2.day),
        |m AS (SELECT lag, count(*) AS n,
        |    CAST(sum(a) AS BIGINT) AS sa, CAST(sum(b) AS BIGINT) AS sb,
        |    CAST(sum(a*a) AS BIGINT) AS saa, CAST(sum(b*b) AS BIGINT) AS sbb,
        |    CAST(sum(a*b) AS BIGINT) AS sab
        |  FROM j GROUP BY lag),
        |v AS (SELECT lag, n, sa, sb, sab,
        |    CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
        |      - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) AS va,
        |    CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
        |      - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) AS vb
        |  FROM m)
        |SELECT CAST(lag AS INTEGER) AS lag, n,
        |  CASE WHEN va * vb = 0 THEN NULL
        |  ELSE round((CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
        |      - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
        |    / sqrt(va * vb), 6) END AS acf
        |FROM v ORDER BY lag""".stripMargin
  )
}
