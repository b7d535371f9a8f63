package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Sources and sinks beyond the plain parquet scan (SURVEY §2.1):
  * FILE tables (CSV with declared schema), virtual tables (per-source
  * columns aligned on the timestamp key), upsert dedup-on-read,
  * DELETE as partition rewrite, and information_schema-style catalog
  * tables. */
object SourceOps {

  /** FILE table (sql.y:2670, `FROM FILE('path','schema')`): CSV read
    * with an explicit schema — schema-on-read never infers (inference
    * would scan the file twice and can drift between runs). */
  def csvTable(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = false, delimiter: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  /** Virtual table (virtualtablescanoperator.c:702): one value column
    * per source, aligned on `alignKeys` (the ts primary key + tags).
    * Lowered as union+pivot — a single hash aggregate, not a chain of
    * N-1 full outer joins, so it stays one shuffle for any number of
    * source tables. Each source must carry alignKeys + `valueCol`. */
  def virtualTable(sources: Seq[(String, DataFrame)], alignKeys: Seq[String],
      valueCol: String): DataFrame = {
    val tagged = sources.map { case (name, df) =>
      df.select(alignKeys.map(col) :+ lit(name).as("_src") :+
        col(valueCol).as("_v"): _*)
    }.reduce(_ unionByName _)
    val aggs = sources.map { case (name, _) =>
      max(when(col("_src") === name, col("_v"))).as(s"${name}_v")
    }
    tagged.groupBy(alignKeys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Upsert semantics (parInsertSql.c dedup, sql.y:3250 composite PK):
    * last-writer-wins per `keys`, ordered by `seqCol` (ingest order).
    * Dedup-on-read form; at scale the same expression runs in the
    * compaction job instead of every query (SURVEY §7.4 risk 5). */
  def upsertLatest(df: DataFrame, keys: Seq[String],
      seqCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).desc)
    df.withColumn("_upsert_rn", row_number().over(w))
      .filter(col("_upsert_rn") === 1).drop("_upsert_rn")
  }

  /** DELETE FROM tbl WHERE cond (dataDeleter.c): read-filter-overwrite
    * of a parquet directory via a staging path + atomic-ish rename. At
    * 100 TB the same rewrite is partition-pruned to the partitions the
    * predicate touches; this single-directory form is the local
    * building block. */
  def deleteWhere(spark: SparkSession, dir: String, cond: Column): Long = {
    val fs = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    val src = new org.apache.hadoop.fs.Path(dir)
    val tmp = new org.apache.hadoop.fs.Path(dir + ".__delete_staging")
    val before = spark.read.parquet(dir)
    val kept = before.filter(!coalesce(cond, lit(false)))
    kept.write.mode("overwrite").parquet(tmp.toString)
    val deleted =
      before.count() - spark.read.parquet(tmp.toString).count()
    fs.delete(src, true)
    fs.rename(tmp, src)
    deleted
  }

  /** _block_dist() (BlockDistScan, sysscanoperator.c:7525): storage
    * block statistics straight from parquet footers — row groups, row
    * counts, compressed/uncompressed bytes — no data pages read. The
    * parquet row group is the exact analog of the reference's storage
    * block, and its footer stats are the reference's SMA. */
  def blockDist(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.get(conf)
    val files = fs.listStatus(new Path(dir))
      .filter(_.getPath.getName.endsWith(".parquet"))
    val rows = files.flatMap { f =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(f.getPath, conf))
      try {
        import scala.jdk.CollectionConverters._
        reader.getFooter.getBlocks.asScala.zipWithIndex.map {
          case (b, i) =>
            (f.getPath.getName, i, b.getRowCount, b.getCompressedSize,
              b.getTotalByteSize)
        }
      } finally reader.close()
    }.toSeq
    import spark.implicits._
    rows.toDF("file", "row_group", "n_rows", "compressed_bytes",
      "uncompressed_bytes")
  }

  /** Bucketed co-located layout (SURVEY §4.3: hash(table)→vgroup,
    * ts-ordered within): writing a table bucketed and sorted by its key
    * lets every later join/aggregation on that key skip the exchange —
    * the batch analog of the reference's vnode partitioning. At 100 TB
    * this is the storage layout for the hot join keys (tbname/device). */
  def writeBucketed(df: DataFrame, tableName: String, buckets: Int,
      bucketCol: String, sortCols: Seq[String]): Unit =
    df.write.format("parquet").mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .saveAsTable(tableName)

  /** information_schema.ins_columns (systable.h:26-112): column catalog
    * of every known table, from parquet footers only (no data scan). */
  def insColumns(spark: SparkSession, sfDir: String): DataFrame = {
    val rows = graft.Tables.all.flatMap { t =>
      val schema = graft.Tables(spark, sfDir, t).schema
      schema.fields.zipWithIndex.map { case (f, i) =>
        (t, f.name, i + 1, f.dataType.simpleString, f.nullable)
      }
    }
    import spark.implicits._
    rows.toDF("table_name", "col_name", "ordinal", "col_type", "nullable")
  }

  /** information_schema.ins_tables: table names + row counts (parquet
    * footer metadata — Spark serves count(*) without reading data). */
  def insTables(spark: SparkSession, sfDir: String): DataFrame = {
    val rows = graft.Tables.all.map { t =>
      (t, graft.Tables(spark, sfDir, t).count())
    }
    import spark.implicits._
    rows.toDF("table_name", "n_rows")
  }

  /** FederatedScan (reference executor
    * federatedscanoperator.c:16 — external MySQL/PostgreSQL/InfluxDB
    * tables surfaced as scannable operators with condition pushdown).
    *
    * Spark-first lowering: the built-in JDBC source. Filters and column
    * pruning push into the remote database automatically (visible as
    * PushedFilters in the scan node), which is the reference's
    * tag/time-condition pushdown. For scale, pass `partition` =
    * (column, lower, upper, n) so the read issues n range-sliced
    * queries in parallel instead of one giant result set — the 100 TB
    * path; a single-connection read is only for small dimension
    * tables. */
  def federatedScan(spark: SparkSession, url: String, table: String,
      driver: String, partition: Option[(String, Long, Long, Int)] = None,
      props: Map[String, String] = Map.empty): DataFrame = {
    var r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", driver)
    partition.foreach { case (c, lo, hi, n) =>
      r = r.option("partitionColumn", c)
        .option("lowerBound", lo).option("upperBound", hi)
        .option("numPartitions", n)
    }
    props.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }
}
