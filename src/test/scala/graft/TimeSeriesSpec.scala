package graft

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

class TimeSeriesSpec extends SparkSpecBase {

  test("ts_gapfill: spans are contiguous, counts conserved, LOCF fills gaps") {
    val res = TimeSeries.queries("ts_gapfill")(spark, sfDir)
    res.persist()
    // contiguous: rows per user == span length in days
    val span = res.groupBy("user_id")
      .agg(count(lit(1)).as("rows"),
        (datediff(max("day"), min("day")) + 1).as("days"))
    assert(span.where(col("rows") =!= col("days")).count() == 0)
    // conservation: filled n_events sums to the raw event count
    val raw = Tables.events(spark, sfDir).count()
    assert(res.agg(sum("n_events")).head.getLong(0) == raw)
    // gap rows contribute zero events and carry a non-null LOCF value
    // whenever any prior day existed (first day per user is never a gap —
    // the span starts at an observed day)
    assert(res.where(col("is_gap") && col("n_events") =!= 0).count() == 0)
    assert(res.where(col("is_gap") && col("locf_vmax1k").isNull).count() == 0)
    res.unpersist()
  }

  test("ts_resample_ohlc: bars bound their own open/close, counts conserved") {
    val res = TimeSeries.queries("ts_resample_ohlc")(spark, sfDir)
    res.persist()
    assert(res.where(col("open") > col("high") || col("open") < col("low") ||
      col("close") > col("high") || col("close") < col("low")).count() == 0)
    val raw = Tables.events(spark, sfDir).count()
    assert(res.agg(sum("n_events")).head.getLong(0) == raw)
    // single-event days: all four prices identical
    assert(res.where(col("n_events") === 1 &&
      (col("open") =!= col("close") || col("high") =!= col("low"))).count() == 0)
    res.unpersist()
  }

  test("anomaly fences: summary counts reconcile with the flagged rows") {
    val iqr = TimeSeries.queries("anomaly_iqr")(spark, sfDir).collect()
    val rows = TimeSeries.queries("anomaly_rows")(spark, sfDir).collect()
    val byType = rows.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    var total = 0L
    iqr.foreach { r =>
      val (t, n, out) = (r.getString(0), r.getLong(1), r.getLong(2))
      val (q1, q3) = (r.getDouble(3), r.getDouble(4))
      assert(q1 <= q3 && out >= 0 && out < n, s"degenerate fences for $t")
      assert(byType.getOrElse(t, 0) == out, s"row/summary mismatch for $t")
      total += n
    }
    assert(total == Tables.events(spark, sfDir).count())
    // every flagged value really sits outside its type's fences
    val fences = iqr.map(r => r.getString(0) ->
      (r.getDouble(3), r.getDouble(4))).toMap
    rows.foreach { r =>
      val (q1, q3) = fences(r.getString(1))
      val v = r.getDouble(2)
      // fences use the unrounded quartiles; allow the 1e-6 display rounding
      assert(v < q1 - 1.5 * (q3 - q1) + 1e-5 || v > q3 + 1.5 * (q3 - q1) - 1e-5)
    }
  }

  test("ts_decay_scores: bounded by event count and newest-event weight, deterministic") {
    val rows = TimeSeries.queries("ts_decay_scores")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, score, lastSeen) = (r.getLong(1), r.getDouble(2), r.getInt(3))
      // each weight ≤ 1 ⇒ score ≤ n; newest event alone contributes 2^-lastSeen
      assert(score <= n.toDouble + 1e-9)
      assert(score >= math.pow(2.0, -lastSeen.toDouble.min(62)) - 1e-6,
        s"score $score below newest-event weight for last_seen=$lastSeen")
      assert(lastSeen >= 0)
    }
    // ranking is by score descending
    val ss = rows.map(_.getDouble(2))
    assert(ss.zip(ss.tail).forall { case (a, b) => a >= b })
    assert(rows.map(_.toSeq).toSeq ==
      TimeSeries.queries("ts_decay_scores")(spark, sfDir).collect().map(_.toSeq).toSeq)
  }

  test("ts_autocorr: lags 1..7, |acf| <= 1, pair counts match the shifted overlap") {
    val rows = TimeSeries.queries("ts_autocorr")(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 7))
    rows.foreach { r =>
      // NULL only for a constant overlapping series (zero variance)
      if (!r.isNullAt(2)) assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9)
    }
    // the pair count at lag k is exactly |{d : d and d+k both present}|
    val days = Tables.events(spark, sfDir)
      .select(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("ts")).as("day"))
      .distinct().collect().map(_.getDate(0).toLocalDate).toSet
    rows.foreach { r =>
      val k = r.getInt(0)
      assert(r.getLong(1) == days.count(d => days.contains(d.plusDays(k))),
        s"overlap count at lag $k")
    }
  }
}
