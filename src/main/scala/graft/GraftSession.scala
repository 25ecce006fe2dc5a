package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's required/recommended settings. */
object GraftSession {

  /** Apply engine settings to a builder: non-ANSI casts (the reference's
    * permissive coercions, `data/RecordConverter.java:302-336`), UTC, AQE,
    * and local-appropriate shuffle parallelism.
    */
  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // the driver's synthetic events table carries ns timestamps, which
      // Spark's parquet reader only supports as epoch-nanos longs
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Settings applied when reusing an externally created session — the
    * full set the builder configures (an external session missing
    * nanosAsLong crashes on ns-timestamp parquet; one missing the
    * extension registrations lacks every graft SQL function).
    */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    GraftExtensions.register(spark)
    spark
  }
}
