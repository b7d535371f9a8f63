package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet testdata (TESTDATA.md).
  *
  * At 100 TB the same API points at a partitioned parquet/lakehouse
  * directory; everything downstream is layout-agnostic DataFrames, so only
  * this file changes. Reads are plain `spark.read.parquet`, which keeps
  * predicate pushdown, column pruning and partition pruning intact.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables that should always be broadcast in joins. */
  val smallDims: Set[String] = Set("region", "nation")

  /** Per-table QUERY-SURFACE timestamp precision ceiling in
    * ticks/second (the reference's per-database PRECISION
    * 'ms'|'us'|'ns', sql.y:923). Only `events` carries a timestamp.
    * The stored layout is currently parquet `timestamp[us]` (the
    * legacy layout was a raw ns-epoch Long — [[eventsAt]] handles
    * both); the value here is the finest precision the query surface
    * offers, not the storage tick. The default surface exposes µs;
    * other precisions read through [[eventsAt]] — epoch Longs pass
    * through every window/join/fill operator unchanged, so precision
    * is purely table metadata, exactly as in the reference. */
  val precisionPerSec: Map[String, Long] = Map(
    "events" -> 1000000000L)

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `events` with `ts` as an epoch Long in the requested precision
    * (ticks/second: 1e3 ms, 1e6 µs, 1e9 ns). The stored column may be
    * either a raw epoch Long at ns (legacy layout, read via
    * `nanosAsLong`) or a parquet `timestamp[us]` (current driver
    * layout, surfacing as TIMESTAMP/TIMESTAMP_NTZ). Both normalize to
    * the Long epoch domain here, so every downstream window/join/fill
    * operator sees one ts representation. Rescaling uses integer
    * DIV/multiply — never double division, which corrupts low-order
    * digits at the ~1.7e18 ns epoch scale. */
  def eventsAt(spark: SparkSession, sfDir: String,
      perSecond: Long): DataFrame = {
    require(Set(1000L, 1000000L, 1000000000L).contains(perSecond),
      s"precision must be ms/us/ns ticks-per-second, got $perSecond")
    import org.apache.spark.sql.functions.{col, expr, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType,
      TimestampType}
    // The NTZ→LTZ cast below reads the session zone; epoch extraction
    // only matches DuckDB's epoch_us() under UTC. Sessions pin UTC at
    // build time (Verify/Bench/SparkTestSession) — fail loudly rather
    // than silently produce shifted epochs under a foreign session.
    require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
      "graft sessions must pin spark.sql.session.timeZone=UTC at build" +
        " time (see Verify.scala) — events epoch extraction depends on it")
    // Range predicates on the normalized Long ts must still prune the
    // parquet scan; the rule re-derives them on the stored column.
    graft.plans.TsRangePushdown.install(spark)
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => // stored ns epoch
        val div = 1000000000L / perSecond
        if (div == 1L) raw
        else raw.withColumn("ts", expr(s"ts DIV ${div}L"))
      case TimestampNTZType =>
        // stored timestamp[us] surfacing as NTZ: the internal repr IS
        // epoch-µs, so the normalization is a zero-cost reinterpret
        // (graft_ntz_micros) — not per-row timezone-cast machinery
        val us = graft.functions.NativeExpressions.ntzMicros(col("ts"))
        val c =
          if (perSecond == 1000000L) us
          else if (perSecond == 1000L)
            org.apache.spark.sql.GraftColumnShim.column(
              org.apache.spark.sql.catalyst.expressions.IntegralDivide(
                org.apache.spark.sql.GraftColumnShim.expression(us),
                org.apache.spark.sql.catalyst.expressions.Literal(1000L)))
          else us.multiply(1000L)
        raw.withColumn("ts", c)
      case _ => // stored timestamp[us] surfacing as LTZ (reader-conf
        // dependent): UTC-session cast chain, exact same values
        val us = unix_micros(col("ts").cast(TimestampType))
        val c =
          if (perSecond == 1000000L) us
          else if (perSecond == 1000L) expr(
            "unix_micros(cast(ts as timestamp)) DIV 1000L")
          else us.multiply(1000L)
        raw.withColumn("ts", c)
    }
  }

  /** The `events` table carries a nanosecond-precision timestamp, which
    * Spark's parquet reader rejects ([PARQUET_TYPE_ILLEGAL]). Read it as a
    * Long (ns since epoch) and expose `ts` in the Long-microsecond domain —
    * the same truncation DuckDB applies when it loads timestamp[ns], so
    * oracle comparisons line up exactly. This mirrors the reference's
    * ns-precision databases (SURVEY §1.2: Long epoch + precision metadata).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    eventsAt(spark, sfDir, 1000000L)
}
