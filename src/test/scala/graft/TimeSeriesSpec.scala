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
}
