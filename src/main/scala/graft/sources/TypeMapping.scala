package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference type system → Spark types (SURVEY §1.2; taos.h:33-56).
  *
  * Spark has no unsigned integers, so unsigned types WIDEN to the next
  * signed type — value semantics preserved exactly; UBIGINT widens to
  * DECIMAL(20,0), the only lossless container for 2^64-1. Timestamps:
  * ms/µs-precision databases map to TimestampType (µs internally);
  * ns-precision databases keep a LongType epoch-ns column (Spark
  * timestamps cannot hold ns) with the precision recorded in column
  * metadata, exactly how the testdata `events.ts` column arrives.
  */
object TypeMapping {

  /** TDengine type ids (taos.h:33-56). */
  object T {
    val BOOL = 1; val TINYINT = 2; val SMALLINT = 3; val INT = 4
    val BIGINT = 5; val FLOAT = 6; val DOUBLE = 7; val VARCHAR = 8
    val TIMESTAMP = 9; val NCHAR = 10; val UTINYINT = 11
    val USMALLINT = 12; val UINT = 13; val UBIGINT = 14; val JSON = 15
    val VARBINARY = 16; val DECIMAL = 17; val BLOB = 18
    val MEDIUMBLOB = 19; val GEOMETRY = 20; val DECIMAL64 = 21
  }

  sealed trait TsPrecision { def unitUs: Double }
  case object Milli extends TsPrecision { val unitUs = 1000.0 }
  case object Micro extends TsPrecision { val unitUs = 1.0 }
  case object Nano extends TsPrecision { val unitUs = 0.001 }

  /** Spark type for a reference type id (+ decimal scale where the type
    * carries one). */
  def sparkType(tid: Int, scale: Int = 0,
      precision: TsPrecision = Micro): DataType = tid match {
    case T.BOOL => BooleanType
    case T.TINYINT => ByteType
    case T.SMALLINT => ShortType
    case T.INT => IntegerType
    case T.BIGINT => LongType
    case T.UTINYINT => ShortType // widen
    case T.USMALLINT => IntegerType // widen
    case T.UINT => LongType // widen
    case T.UBIGINT => DecimalType(20, 0) // only lossless choice
    case T.FLOAT => FloatType
    case T.DOUBLE => DoubleType
    case T.VARCHAR | T.NCHAR | T.JSON => StringType
    case T.VARBINARY | T.BLOB | T.MEDIUMBLOB | T.GEOMETRY => BinaryType
    case T.DECIMAL => DecimalType(38, scale)
    case T.DECIMAL64 => DecimalType(18, scale)
    case T.TIMESTAMP => precision match {
      case Nano => LongType // ns epoch; TimestampType is µs-bounded
      case _ => TimestampType
    }
    case other =>
      throw new IllegalArgumentException(s"unknown type id $other")
  }

  /** Reinterpret a column carrying raw unsigned bits (as the signed
    * type of the same width) into its widened Spark type. E.g. a byte
    * 0xFF read as TINYINT -1 becomes USMALLINT... 255. This is the
    * ingest-side conversion for unsigned columns arriving through
    * signed containers (parquet/JDBC have no unsigned either). */
  def widenUnsigned(c: Column, tid: Int): Column = tid match {
    case T.UTINYINT =>
      (c.cast(ShortType) + lit(256) * (c < 0).cast(ShortType))
        .cast(ShortType)
    case T.USMALLINT =>
      (c.cast(IntegerType) + lit(65536) * (c < 0).cast(IntegerType))
        .cast(IntegerType)
    case T.UINT =>
      (c.cast(LongType) + lit(4294967296L) * (c < 0).cast(LongType))
        .cast(LongType)
    case T.UBIGINT =>
      // reinterpret the signed-64 bit pattern as unsigned: negative
      // values shift up by 2^64
      (c.cast(DecimalType(20, 0)) +
        when(c < 0, lit(BigDecimal("18446744073709551616")))
          .otherwise(lit(BigDecimal(0)))).cast(DecimalType(20, 0))
    case _ => c
  }

  /** ns-precision epoch → µs TimestampType (truncating, the engine's
    * internal precision) and back. */
  def nsToTimestamp(c: Column): Column = timestamp_micros(
    (c - pmod(c, lit(1000L))).cast(LongType) / lit(1000L) cast LongType)
  def timestampToNs(c: Column): Column =
    unix_micros(c) * lit(1000L)

  /** Attach the declared precision/width as column metadata (the
    * VARCHAR length bound and timestamp precision the reference keeps
    * in its schema). */
  def withTypeMeta(df: DataFrame, colName: String,
      meta: Map[String, String]): DataFrame = {
    val mb = new MetadataBuilder()
    meta.foreach { case (k, v) => mb.putString(k, v) }
    df.withColumn(colName, df(colName).as(colName, mb.build()))
  }
}
