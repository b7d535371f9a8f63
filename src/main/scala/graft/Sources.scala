package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.SourceOps

/** Source/sink operator queries (SURVEY §2.1): virtual table scan,
  * upsert dedup-on-read, last-row scan, catalog tables. CSV FILE
  * tables and DELETE are exercised in SourcesSpec (they need scratch
  * files, not the read-only testdata). */
object Sources {
  import Lowering.usToMs

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- virtual table: click/view/purchase value columns on (user,ts) --
    "vtable_scan" -> { (s, dir) =>
      val e = ev(s, dir)
      val srcs = Seq("click", "view", "purchase").map(t =>
        t -> e.filter(col("event_type") === t)
          .select(col("user_id"), col("ts"), col("value")))
      SourceOps.virtualTable(srcs, Seq("user_id", "ts"), "value")
        .select(col("user_id"), usToMs(col("ts")).as("ts_ms"),
          col("click_v"), col("view_v"), col("purchase_v"))
        .orderBy(col("user_id"), col("ts_ms"))
    },
    // ---- upsert: re-ingested rows (event_id%5=0, value+1000) win ----
    "upsert_dedup" -> { (s, dir) =>
      val base = ev(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .withColumn("_seq", lit(0L))
      val updates = base.filter(col("event_id") % 5 === 0)
        .withColumn("value", col("value") + 1000)
        .withColumn("_seq", lit(1L))
      SourceOps.upsertLatest(base.unionByName(updates),
          Seq("user_id", "ts", "event_id"), "_seq")
        .select(col("user_id"), usToMs(col("ts")).as("ts_ms"),
          col("event_id"), col("value"))
        .orderBy(col("user_id"), col("ts_ms"), col("event_id"))
    },
    // ---- last_row(*): the newest full row per user (cachescan) ----
    "last_row" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      ev(s, dir).withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .select(col("user_id"), usToMs(col("ts")).as("ts_ms"),
          col("event_id"), col("event_type"), col("value"))
        .orderBy(col("user_id"))
    },
    // ---- information_schema.ins_columns (footer-only metadata) ----
    "sys_columns" -> { (s, dir) =>
      SourceOps.insColumns(s, dir)
        .orderBy(col("table_name"), col("ordinal"))
    },
    // ---- TagScan (tagscanoperator.c): enumerate the tag dimension
    // WITHOUT touching data columns. Tags are denormalized columns here
    // (SURVEY §1.1), so this is a 2-column pruned scan + distinct — the
    // parquet reader never materializes ts/value/payload (ReadSchema is
    // asserted in PlanSpec). ----
    "tag_scan" -> { (s, dir) =>
      ev(s, dir)
        .select(col("user_id"), col("event_type"))
        .distinct()
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_types"),
          array_join(sort_array(collect_set(col("event_type"))), ",")
            .as("types"))
        .orderBy(col("user_id"))
    })

  def oracleSql: Map[String, String] = Map(
    "vtable_scan" ->
      """SELECT user_id, epoch_us(ts) // 1000 AS ts_ms,
           max(CASE WHEN event_type = 'click' THEN value END) AS click_v,
           max(CASE WHEN event_type = 'view' THEN value END) AS view_v,
           max(CASE WHEN event_type = 'purchase' THEN value END)
             AS purchase_v
         FROM events
         WHERE event_type IN ('click', 'view', 'purchase')
         GROUP BY user_id, epoch_us(ts)
         ORDER BY user_id, ts_ms""",
    "upsert_dedup" ->
      """WITH all_rows AS (
           SELECT user_id, ts, event_id, value, 0 AS seq FROM events
           UNION ALL
           SELECT user_id, ts, event_id, value + 1000, 1 FROM events
           WHERE event_id % 5 = 0),
         r AS (SELECT *, row_number() OVER
             (PARTITION BY user_id, ts, event_id ORDER BY seq DESC) AS rn
           FROM all_rows)
         SELECT user_id, epoch_us(ts) // 1000 AS ts_ms, event_id, value
         FROM r WHERE rn = 1 ORDER BY user_id, ts_ms, event_id""",
    "last_row" ->
      """WITH r AS (SELECT *, row_number() OVER (PARTITION BY user_id
             ORDER BY ts DESC, event_id DESC) AS rn
           FROM events)
         SELECT user_id, epoch_us(ts) // 1000 AS ts_ms, event_id,
           event_type, value
         FROM r WHERE rn = 1 ORDER BY user_id""",
    "tag_scan" ->
      """WITH t AS (SELECT DISTINCT user_id, event_type FROM events)
         SELECT user_id, count(*) AS n_types,
           string_agg(event_type, ',' ORDER BY event_type) AS types
         FROM t GROUP BY user_id ORDER BY user_id""")
}
