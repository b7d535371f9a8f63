package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schemaless ingest (SURVEY.md §3.2; clientSml.c, taos.h:87-89): the
  * three wire protocols parsed into typed DataFrames. Pure column
  * expressions (codegen'd, streaming-safe: the same parser lowers over a
  * readStream of text lines).
  *
  * Schema evolution: the parsed frames carry tags/fields as maps;
  * [[pivotFields]] turns known field names into columns, and writing with
  * `mergeSchema` gives the auto-add-column behavior of the reference.
  */
object Schemaless {

  // -------------------- InfluxDB line protocol --------------------
  // measurement[,tag=v...] field=v[,field=v...] [ts]
  // e.g.  meters,location=SF,groupid=2 current=10.3,voltage=219i 1626006833639000000

  def parseLineProtocol(lines: DataFrame, col0: String = "value"): DataFrame = {
    val l = col(col0)
    val head = split(l, " ").getItem(0)
    val fieldsStr = split(l, " ").getItem(1)
    val tsStr = split(l, " ").getItem(2)
    val measurement = split(head, ",").getItem(0)
    val tagsStr = when(instr(head, ",") > 0,
      expr(s"substring(split($col0, ' ')[0], " +
        s"instr(split($col0, ' ')[0], ',') + 1)"))
    lines.select(
      measurement.as("measurement"),
      kvMap(tagsStr).as("tags"),
      kvMap(fieldsStr).as("fields_raw"),
      tsStr.cast(LongType).as("ts_ns"))
      .withColumn("ts_us", expr("ts_ns DIV 1000"))
      .withColumn("fields", transform_values(col("fields_raw"),
        (_, v) => regexp_replace(v, "[i]$", "").cast(DoubleType)))
      .drop("fields_raw")
  }

  /** "k=v,k=v" → map<string,string> (no escaped-comma support: the
    * reference's full escaping table is out of scope for round 1). */
  private def kvMap(s: Column): Column =
    when(s.isNull, map())
      .otherwise(map_from_entries(transform(split(s, ","),
        kv => struct(split(kv, "=").getItem(0).as("key"),
          split(kv, "=").getItem(1).as("value")))))

  // -------------------- OpenTSDB telnet --------------------
  // put <metric> <ts> <value> [tag=v ...]

  def parseTelnet(lines: DataFrame, col0: String = "value"): DataFrame = {
    val parts = split(col(col0), "\\s+")
    lines
      .filter(parts.getItem(0) === "put")
      .select(
        parts.getItem(1).as("metric"),
        parts.getItem(2).cast(LongType).as("ts_raw"),
        parts.getItem(3).cast(DoubleType).as("value"),
        map_from_entries(filter(
          transform(slice(parts, 5, 64),
            kv => struct(split(kv, "=").getItem(0).as("key"),
              split(kv, "=").getItem(1).as("value"))),
          e => e.getField("key").isNotNull && e.getField("key") =!= ""))
          .as("tags"))
      // telnet timestamps are s or ms; normalize to µs
      .withColumn("ts_us",
        when(col("ts_raw") < 10000000000L, col("ts_raw") * 1000000L)
          .otherwise(col("ts_raw") * 1000L))
      .drop("ts_raw")
  }

  // -------------------- OpenTSDB JSON --------------------
  // {"metric":"m","timestamp":1626006833,"value":10.3,"tags":{...}}

  val tsdbJsonSchema: StructType = StructType(Seq(
    StructField("metric", StringType),
    StructField("timestamp", LongType),
    StructField("value", DoubleType),
    StructField("tags", MapType(StringType, StringType))))

  def parseTsdbJson(lines: DataFrame, col0: String = "value"): DataFrame =
    lines.select(from_json(col(col0), tsdbJsonSchema).as("j"))
      .select(col("j.metric").as("metric"),
        col("j.timestamp").as("ts_raw"),
        col("j.value").as("value"), col("j.tags").as("tags"))
      .withColumn("ts_us",
        when(col("ts_raw") < 10000000000L, col("ts_raw") * 1000000L)
          .otherwise(col("ts_raw") * 1000L))
      .drop("ts_raw")

  /** Pivot selected field/tag names to real columns (schema-on-ingest:
    * write with mergeSchema to auto-add new columns, as the reference's
    * schemaless path auto-alters the stable). */
  def pivotFields(parsed: DataFrame, fieldNames: Seq[String],
      tagNames: Seq[String]): DataFrame = {
    val fields = fieldNames.map(f =>
      element_at(col("fields"), f).as(f))
    val tags = tagNames.map(t => element_at(col("tags"), t).as(s"tag_$t"))
    parsed.select(Seq(col("measurement"), col("ts_us")) ++ tags ++
      fields: _*)
  }
}
