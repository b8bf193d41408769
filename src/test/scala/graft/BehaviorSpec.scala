package graft

import org.apache.spark.sql.functions._

import graft.operators.Behavior

class BehaviorSpec extends SparkSpecBase {

  test("funnel: stage counts are monotone and consistent with user paths") {
    val stages = Behavior.queries("funnel_stages")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stages.keySet == Set("1_view", "2_click", "3_purchase"))
    assert(stages("1_view") >= stages("2_click"))
    assert(stages("2_click") >= stages("3_purchase"))
    assert(stages("1_view") > 0)

    val paths = Behavior.queries("funnel_user_paths")(spark, sfDir)
    paths.persist()
    assert(paths.count() == stages("1_view"))
    assert(paths.where(col("t_click_us").isNotNull).count() == stages("2_click"))
    assert(paths.where(col("t_purchase_us").isNotNull).count() == stages("3_purchase"))
    // strict ordering: click after view, purchase after click
    assert(paths.where(col("t_click_us").isNotNull &&
      col("t_click_us") <= col("t_view_us")).count() == 0)
    assert(paths.where(col("t_purchase_us").isNotNull &&
      col("t_purchase_us") <= col("t_click_us")).count() == 0)
    // nobody reaches purchase without click
    assert(paths.where(col("t_purchase_us").isNotNull &&
      col("t_click_us").isNull).count() == 0)
    paths.unpersist()
  }

  test("retention: offset-0 equals cohort size, activity mass conserved") {
    val ret = Behavior.queries("retention_cohorts")(spark, sfDir)
    ret.persist()
    // offset 0 exists for every cohort and equals the cohort's user count
    val cohortSizes = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy("user_id").agg(min("day").as("cohort"))
      .groupBy(col("cohort").cast("string").as("cohort"))
      .agg(count(lit(1)).as("size"))
    val zero = ret.where(col("offset_days") === 0)
      .select(col("cohort"), col("n_users"))
    assert(zero.join(cohortSizes, "cohort")
      .where(col("n_users") =!= col("size")).count() == 0)
    // per-cohort counts never exceed the cohort size
    assert(ret.join(cohortSizes, "cohort")
      .where(col("n_users") > col("size")).count() == 0)
    // total mass = distinct (user, day) pairs
    val distinctActive = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct().count()
    assert(ret.agg(sum("n_users")).head.getLong(0) == distinctActive)
    ret.unpersist()
  }

  test("rolling_dau_wau: wau bounds dau, stickiness in (0,1], day-1 wau equals dau") {
    val rows = graft.operators.Behavior.queries("rolling_dau_wau")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val byDay = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    rows.foreach { r =>
      val (dau, wau, st) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(dau >= 1 && wau >= dau, s"wau $wau < dau $dau on ${r.getString(0)}")
      assert(st > 0.0 && st <= 1.0)
    }
    // the first observed day's trailing week contains only itself
    val firstDay = rows.map(_.getString(0)).min
    assert(byDay(firstDay)._2 == byDay(firstDay)._1,
      "first day's WAU must equal its DAU")
  }

  test("ts_interarrival: ordered quantiles, gap counts reconcile with event counts") {
    val rows = graft.operators.Behavior.queries("ts_interarrival")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, med, p90, mx) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(n > 0 && med > 0 && med <= p90 && p90 <= mx)
    }
    // n_gaps per type = n_events(type) - n_(user,type) groups
    val ev = Tables.events(spark, sfDir)
    val perType = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val groups = ev.select("user_id", "event_type").distinct()
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val t = r.getString(0)
      assert(r.getLong(1) == perType(t) - groups(t))
    }
  }

  test("funnel_latency: transition counts equal stage totals; gaps strictly positive") {
    import graft.operators.Behavior
    val lat = Behavior.queries("funnel_latency")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(4))).toMap
    val stages = Behavior.queries("funnel_stages")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(lat.keySet == Set("1_view_to_click", "2_click_to_purchase"))
    // every click-stage user has a view->click gap; same for purchases
    assert(lat("1_view_to_click")._1 == stages("2_click"))
    assert(lat("2_click_to_purchase")._1 == stages("3_purchase"))
    lat.values.foreach { case (_, med, mx) =>
      assert(med > 0.0 && mx >= med, "strictly-ordered funnel gaps are positive")
    }
  }

  test("benford_prices: full digit support, frequencies reconcile and sum to one") {
    import graft.operators.Profile
    val rows = Profile.queries("benford_prices")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1 to 9))
    val nOrders = graft.Tables.orders(spark, sfDir).count()
    assert(rows.map(_._2).sum == nOrders, "digit counts partition the orders")
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4,
      "Benford expected frequencies are a distribution")
  }

  test("chat_render: turn merge is maximal; counts reconcile; truncation honest") {
    val rows = graft.operators.Behavior.queries("chat_render")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nEvents = Tables.events(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum == nEvents, "every event lands in a turn")
    rows.foreach { r =>
      val (nEv, nTurns) = (r.getLong(1), r.getLong(2))
      val (nChars, head, trunc) = (r.getInt(3), r.getString(4), r.getBoolean(5))
      assert(nTurns >= 1 && nTurns <= nEv)
      assert(trunc == (nChars > 300))
      assert(head.length <= 300 && (trunc || head.length == nChars))
      // adjacent rendered turns always alternate roles (the merge is maximal)
      val roles = head.split(" <eot> ", -1).toSeq.dropRight(if (trunc) 1 else 0)
        .map(_.takeWhile(_ != ':'))
      roles.sliding(2).foreach {
        case Seq(a, b) => assert(a != b, s"unmerged adjacent turns: $roles")
        case _ =>
      }
    }
  }
}
