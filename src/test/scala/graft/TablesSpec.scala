package graft

/** Table-loader contracts — most importantly that the events loader's
  * nanos-timestamp legacy flag is scoped to its own read and does not
  * mutate session state observable by later reads.
  */
class TablesSpec extends SparkSpecBase {

  private val flag = "spark.sql.legacy.parquet.nanosAsLong"

  test("events loader scopes the nanosAsLong flag to its own read") {
    assert(spark.conf.getOption(flag).forall(_ == "false"))
    val ev = Tables.events(spark, sfDir)
    // restored immediately: the session no longer carries the legacy flag
    assert(spark.conf.getOption(flag).forall(_ == "false"),
      "loader leaked nanosAsLong into the session")
    // the scoped df still executes fine after the restore
    assert(ev.count() > 0)
    assert(ev.schema("ts").dataType.typeName === "timestamp")
  }

  test("a subsequent unscoped nanos-parquet read still gets the default refusal") {
    Tables.events(spark, sfDir).count()
    val e = intercept[Exception] {
      spark.read.parquet(s"$sfDir/events.parquet").count()
    }
    assert(e.getMessage.contains("PARQUET_TYPE_ILLEGAL"),
      s"expected Spark's default TIMESTAMP(NANOS) refusal, got: ${e.getMessage.take(200)}")
  }

  test("events loader restores a pre-existing explicit flag value") {
    spark.conf.set(flag, "true")
    try {
      Tables.events(spark, sfDir).count()
      assert(spark.conf.get(flag) === "true", "explicit prior value clobbered")
    } finally spark.conf.unset(flag)
  }
}
