package graft

import org.apache.spark.sql.functions._

/** Table-loader contracts — the events loader must normalize `ts` to
  * Spark's native TIMESTAMP across every fixture generation (parquet
  * TIMESTAMP(NANOS) in early driver rounds, TIMESTAMP(MICROS) now, plain
  * INT64 nanos as the degenerate case) without leaking session state.
  */
class TablesSpec extends SparkSpecBase {

  private val flag = "spark.sql.legacy.parquet.nanosAsLong"

  test("events loader yields native TIMESTAMP ts and leaks no session state") {
    assert(spark.conf.getOption(flag).forall(_ == "false"))
    // drive the UNDERLYING loader, not the memoized Tables.events entry —
    // a cache hit would skip the flag logic and pass vacuously
    val ev = Tables.eventsWithTs(spark, sfDir)
    // no legacy flag left behind, whichever path the fixture took
    assert(spark.conf.getOption(flag).forall(_ == "false"),
      "loader leaked nanosAsLong into the session")
    assert(ev.count() > 0)
    assert(ev.schema("ts").dataType.typeName === "timestamp")
  }

  test("ts values agree with the raw stored micros under the UTC session") {
    // The fixture is TIMESTAMP(MICROS, isAdjustedToUTC=false): a raw read
    // surfaces TIMESTAMP_NTZ. The loader's cast must be the identity on
    // the stored micros value (session timezone pinned to UTC).
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    if (raw.schema("ts").dataType.typeName == "timestamp_ntz") {
      val a = raw.select(col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      val b = Tables.events(spark, sfDir)
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        "loader ts diverges from raw stored micros")
    }
  }

  test("a plain INT64 nanos ts is truncated to micros") {
    val dir = java.nio.file.Files.createTempDirectory("tables_int64_ts").toString
    spark.range(3).select(col("id").as("event_id"),
        (col("id") * 1000000000L + 123456789L).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType.typeName === "timestamp")
    val got = ev.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted
    // id·10⁹ + 123456789 ns → id·10⁶ + 123456 us: sub-µs bits truncate
    assert(got.toSeq == Seq(123456L, 1123456L, 2123456L), got.toSeq)
  }

  test("invalidate(dir) drops the memoized listing so a rewrite is visible") {
    val dir = java.nio.file.Files.createTempDirectory("tables_invalidate").toString
    spark.range(3).select(col("id").as("doc_id"), lit("a").as("text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(Tables.documents(spark, dir).count() === 3)
    // rewrite with MORE rows: without invalidate the memoized relation's
    // snapshot of the file listing is stale (FileNotFound or stale rows)
    spark.range(5).select(col("id").as("doc_id"), lit("b").as("text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Tables.invalidate(dir)
    assert(Tables.documents(spark, dir).count() === 5)
  }

  test("events loader restores a pre-existing explicit flag value") {
    spark.conf.set(flag, "true")
    try {
      // underlying loader: the memoized entry would skip the flag logic
      Tables.eventsWithTs(spark, sfDir).count()
      assert(spark.conf.get(flag) === "true", "explicit prior value clobbered")
    } finally spark.conf.unset(flag)
  }
}
