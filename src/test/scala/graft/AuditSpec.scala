package graft

import org.apache.spark.sql.functions._

import graft.operators.{Cdc, Learn, Profile, TimeSeries}

/** Structural contracts for the audit/monitoring pack: referential
  * integrity, CUSUM change points, WOE/IV, incremental agg maintenance.
  */
class AuditSpec extends SparkSpecBase {

  test("fk_orphans: fixture audit is all-clean AND the probe detects a planted orphan") {
    val rows = Profile.fkOrphans(spark, sfDir).collect()
    assert(rows.length == 6)
    assert(rows.forall(_.getLong(2) == 0L), "fixture should be referentially clean")
    assert(rows.forall(_.getLong(1) > 0L))
    // non-vacuity: plant two orphans and prove the same probe counts them
    val s = spark
    import s.implicits._
    val child = Seq(1L, 2L, 3L, 99L, 98L).toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("p")
    val planted = Profile.fkAudit("t", child, "k", parent, "p").head()
    assert(planted.getLong(1) == 5L && planted.getLong(2) == 2L)
  }

  test("ts_cusum: windowed closed form equals the textbook recursion, peak at the shift") {
    // brute-force S_t = max(0, S_{t-1} + d_t) on the fixture's own series
    val got = TimeSeries.queries("ts_cusum")(spark, sfDir).collect()
    val n = got.map(_.getLong(1))
    val days = n.length.toLong
    val total = n.sum
    var sUp = 0L; var sDn = 0L
    got.zipWithIndex.foreach { case (r, i) =>
      val d = n(i) * days - total
      sUp = math.max(0L, sUp + d)
      sDn = math.min(0L, sDn + d)
      assert(r.getLong(2) == sUp, s"row $i cusum_up")
      assert(r.getLong(3) == -sDn, s"row $i cusum_down")
    }
    // exactly the argmax rows are flagged
    val mx = got.map(_.getLong(2)).max
    assert(got.forall(r => r.getBoolean(4) == (r.getLong(2) == mx)))
  }

  test("woe_bins: bins partition the events, IV is the fixed-point fold, non-negative") {
    val bins = Learn.queries("woe_bins")(spark, sfDir).collect()
    assert(bins.map(_.getInt(0)).toSeq == bins.map(_.getInt(0)).toSeq.sorted)
    val nRows = bins.map(_.getLong(1)).sum
    assert(nRows == graft.Tables.events(spark, sfDir).count())
    // every IV contribution (g-b)·ln(g/b) is >= 0 by construction
    assert(bins.forall(_.getLong(5) >= 0L))
    val total = Learn.queries("woe_iv_total")(spark, sfDir).head()
    assert(total.getLong(0) == bins.length)
    assert(math.abs(total.getDouble(1) -
      bins.map(_.getLong(5)).sum / 1e6) < 1e-9)
  }

  test("incr_agg_merge == direct full recompute (mergeable-state contract)") {
    val merged = Cdc.queries("incr_agg_merge")(spark, sfDir)
      .drop("n_partials")
    val o = graft.Tables.orders(spark, sfDir)
    val direct = o.select(col("o_orderpriority"),
      col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2))
        .as("price"),
      to_date(col("o_orderdate")).as("day"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum("price").cast("double").as("total"),
        min("day").cast("string").as("first_day"),
        max("day").cast("string").as("last_day"))
    assert(merged.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(merged).count() == 0)
  }

  test("anomaly_mad: agrees with a driver-side median/MAD recompute per group") {
    val rows = TimeSeries.queries("anomaly_mad")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val vals = graft.Tables.events(spark, sfDir)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
    def median(xs: Array[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    rows.foreach { r =>
      val xs = vals(r.getString(0)).map(_._2)
      val med = median(xs)
      val mad = median(xs.map(x => math.abs(x - med)))
      assert(math.abs(r.getDouble(3) - med) < 1e-6, s"median ${r.getString(0)}")
      assert(math.abs(r.getDouble(4) - mad) < 1e-6, s"mad ${r.getString(0)}")
      val out = xs.count(x => math.abs(x - med) > 3 * 1.4826 * mad)
      assert(r.getLong(2) == out, s"outlier count ${r.getString(0)}")
      assert(r.getLong(1) == xs.length)
    }
  }

  test("feature_bins_equidepth: balanced partition with monotone non-overlapping ranges") {
    val bins = Learn.queries("feature_bins_equidepth")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(bins.map(_._1).toSeq == (0 until Learn.FeatureBins))
    val total = graft.Tables.events(spark, sfDir).count()
    assert(bins.map(_._2).sum == total, "bins must partition the rows")
    assert(bins.map(_._2).max - bins.map(_._2).min <= 1,
      s"equi-depth bins must be balanced: ${bins.map(_._2).toSeq}")
    bins.foreach { case (_, _, lo, hi) => assert(lo <= hi) }
    bins.sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._3, "ranges must be ordered")
      case _ =>
    }
  }

  test("k-anonymity: planted singleton flagged, summary consistent with classes") {
    import spark.implicits._
    import java.sql.Timestamp
    // 6-row class (2 users -> l_div 2, meets k=5) + a singleton class
    val ts = Timestamp.valueOf("2024-01-05 10:00:00")
    val ev = ((1 to 6).map(i =>
      (100L + i % 2, "view", ts, 42.0)) :+ ((999L, "purchase", ts, 480.0)))
      .toDF("user_id", "event_type", "ts", "value")
    val byType = Profile.kanonClasses(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(byType("view") == ((4L, 6L, 2L)), s"view class: ${byType("view")}")
    assert(byType("purchase") == ((48L, 1L, 1L)), "singleton class present")
    // fixture: summary row is exactly the classes-relation aggregate
    val classes = Profile.queries("kanon_classes")(spark, sfDir).collect()
    val risk = Profile.queries("kanon_risk")(spark, sfDir).head()
    val nEvents = graft.Tables.events(spark, sfDir).count()
    assert(classes.map(_.getLong(3)).sum == nEvents, "classes partition the rows")
    val small = classes.filter(_.getLong(3) < Profile.KAnonK)
    assert(risk.getLong(0) == classes.length)
    assert(risk.getLong(1) == small.length)
    assert(risk.getLong(2) == small.map(_.getLong(3)).sum)
    assert(risk.getLong(1) > 0 && risk.getLong(1) < classes.length,
      "the k threshold must discriminate on the fixture")
    assert(risk.getLong(4) ==
      classes.filter(_.getLong(3) >= Profile.KAnonK).map(_.getLong(4)).min)
  }
}
