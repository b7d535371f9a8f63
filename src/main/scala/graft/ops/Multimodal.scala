package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata alongside. The Spark-side shape —
  * schema, partition-friendly batch iteration, feature schema — is real
  * and tested; the actual codec calls are STUBBED (no image/audio
  * libraries in this container) behind [[decodeStub]], clearly marked.
  *
  * At scale: payload bytes stay columnar in parquet; `mapPartitions`
  * streams batches through the (native) decoder without collecting, and
  * the output is an ordinary DataFrame any downstream operator consumes.
  */
object Multimodal {

  /** Canonical media-table schema: payload + sidecar metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = false),
    StructField("mime", StringType),
    StructField("meta", MapType(StringType, StringType))))

  /** Extracted-feature schema produced by [[extractFeatures]]. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  /** STUB — stands in for the real codec (libjpeg/ffmpeg/...); produces
    * deterministic fake dimensions from the payload so plumbing tests are
    * stable. Swap this single function for a real decoder in production.
    */
  def decodeStub(kind: String, payload: Array[Byte]): (Int, Int, Int) = {
    val len = payload.length.toLong
    val w = (64 + (len * 7919) % 960).toInt
    val h = (64 + (len * 104729) % 960).toInt
    val frames = if (kind == "video") (1 + (len % 240)).toInt else 1
    (w, h, frames)
  }

  /** Batch feature extraction: streams each partition through the decoder
    * — the Scala analog of a pandas_udf/mapInPandas stage (iterator in,
    * iterator out, no materialization). */
  def extractFeatures(media: DataFrame, featureDim: Int = 8): DataFrame = {
    val schema = media.schema
    val idI = schema.fieldIndex("media_id")
    val kindI = schema.fieldIndex("kind")
    val payI = schema.fieldIndex("payload")
    val enc = RowEncoder.encoderFor(featureSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val kind = r.getString(kindI)
        val payload = r.getAs[Array[Byte]](payI)
        val (w, h, frames) = decodeStub(kind, payload)
        // STUB feature vector: byte histogram folded to featureDim dims
        // (a real pipeline would run the model here).
        val feat = new Array[Float](featureDim)
        var i = 0
        while (i < payload.length) {
          feat((payload(i) & 0xff) % featureDim) += 1f
          i += 1
        }
        Row(r.getLong(idI), kind, payload.length.toLong, w, h, frames,
          feat.toSeq)
      }
    }(enc)
  }

  /** Frame-row schema produced by [[sampleFrames]]. */
  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("frame_payload", BinaryType)))

  /** Frame sampling: every `everyN`-th frame of each video becomes its
    * own row (images/audio emit one frame). 1→N iterator-to-iterator
    * stage — constant memory per row, no collect; the frame payload is
    * a STUB byte window standing in for the real frame decode. */
  def sampleFrames(media: DataFrame, everyN: Int): DataFrame = {
    val schema = media.schema
    val idI = schema.fieldIndex("media_id")
    val kindI = schema.fieldIndex("kind")
    val payI = schema.fieldIndex("payload")
    val enc = RowEncoder.encoderFor(frameSchema)
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val kind = r.getString(kindI)
        val payload = r.getAs[Array[Byte]](payI)
        val (_, _, frames) = decodeStub(kind, payload)
        (0 until frames by everyN).map { idx =>
          // STUB frame bytes: a deterministic window of the payload
          val from = if (frames == 0) 0 else (idx * payload.length) / frames
          val until = math.min(payload.length, from + 16)
          Row(r.getLong(idI), idx, frames,
            java.util.Arrays.copyOfRange(payload, from, until))
        }
      }
    }(enc)
  }

  /** Aspect-preserving resize of decoded dimensions (the metadata half
    * of a resize stage; the pixel transform is the stubbed codec's
    * job). scale = min(tw/w, th/h), never upscales. */
  def resizeDims(features: DataFrame, targetW: Int,
      targetH: Int): DataFrame = {
    val scale = least(lit(targetW) / col("width").cast("double"),
      lit(targetH) / col("height").cast("double"), lit(1.0))
    features
      .withColumn("out_width",
        greatest(floor(col("width") * scale), lit(1)).cast("int"))
      .withColumn("out_height",
        greatest(floor(col("height") * scale), lit(1)).cast("int"))
  }

  /** Builds a media table from any (id, text) source — the testdata has
    * no real binaries, so documents stand in as deterministic payloads. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("application/octet-stream").as("mime"),
      map(lit("source"), col("source")).as("meta"))
}
