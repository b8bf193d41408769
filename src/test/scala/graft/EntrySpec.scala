package graft

/** Smoke coverage of the driver contract surface: entry() and every
  * SparkEntry.queries entry runs and (where meaningful) returns rows at
  * sf0.001. Value-level correctness is covered by the DuckDB oracle at
  * sf0.01 (driver t2) and tools/check_oracle.py locally.
  */
class EntrySpec extends SparkSpecBase {

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("all queries execute at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sfDir).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("no global window over an unbounded relation (single-task-cliff ban)") {
    // A window with an empty (or all-foldable, e.g. partitionBy(lit(1)))
    // partition spec moves its ENTIRE child relation through one task —
    // the cliff that made vocab_table/woe_bins 'weak at scale'. Allowed
    // only when the child is bounded by construction:
    //  (a) structurally: the child output carries "_pid" — the ≤numParts-row
    //      offset aggregate inside Ranking.globalRank/globalCumSum;
    //  (b) an audited case whitelisted here WITH its bound.
    // set SWEEP_NOWL=1 to disable the whitelist and list every global
    // window (how this inventory was produced)
    val bounded: Map[String, String] = if (sys.env.contains("SWEEP_NOWL")) Map.empty else Map(
      // eval_auc came OFF this list in round 7: its cumulative-count window
      // now rides Ranking.globalCumSum (structurally bounded via _pid)
      "q_skyline_parts" -> "phase-2 pass over the union of 32 shard-local skylines (frontier-sized)",
      "sample_mixture" -> "mixtureRates window over the |sources|-row per-source aggregate",
      "sample_mixture_stats" -> "same |sources|-row mixtureRates aggregate",
      "sample_weighted" -> "top-K selection window over a limit(WeightedK) relation",
      "cluster_balanced_rates" -> "clusterRates window over the |clusters|-row aggregate",
      "cluster_balanced_sample" -> "same |clusters|-row clusterRates aggregate",
      "ts_cusum" -> "global max over the day-grain CUSUM relation: ≤ calendar-days rows",
      "q_winsorize" -> "group-offset cumsum over the groupBy(l_returnflag) aggregate: ≤ |distinct return flags| rows (the r11 rank-based bounds pass)"
    )
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.optimizedPlan
      val bad = plan.collect {
        case w: LWindow if w.partitionSpec.isEmpty || w.partitionSpec.forall(_.foldable) => w
      }.filterNot(w => w.child.output.exists(_.name == "_pid"))
      if (bad.nonEmpty && !bounded.contains(name)) Some(s"$name: ${bad.head.simpleString(60)}")
      else None
    }
    assert(offenders.isEmpty,
      s"global windows over unbounded relations (route through Ranking.globalRank/" +
        s"globalCumSum or whitelist with an audited bound):\n${offenders.mkString("\n")}")
  }

  test("no query output carries a non-atomic column (driver-harness sortability)") {
    // The driver's oracle compare loads each result into pandas and sorts
    // by ALL columns before hashing; an array/map/struct cell is unhashable
    // as a pandas sort key and crashes the gate (seen round 3:
    // emb_quantize_sq8, inverted_shingle_index). Contract: every
    // SparkEntry.queries output column must be an atomic type — encode
    // lists as ordered comma-joined strings / JSON instead.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      fn(spark, sfDir).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
                  f.dataType.isInstanceOf[MapType] ||
                  f.dataType.isInstanceOf[StructType] =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty,
      s"non-atomic output columns crash the driver's pandas sort:\n${offenders.mkString("\n")}")
  }
}
