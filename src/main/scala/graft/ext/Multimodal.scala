package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (SURVEY.md §7.4): image/audio/video payloads
  * as opaque `binary` columns with typed metadata, plus the Spark-side
  * plumbing for per-batch decode / feature-extract operators.
  *
  * The decode step itself is STUBBED with a deterministic fake — the
  * image/audio codecs are not in this container — but the schema,
  * partition-preserving mapPartitions plumbing, batch shape, and output
  * contract are real and tested (per the builder brief).
  *
  * 100 TB design notes: payload bytes never visit the driver; decode is
  * `mapPartitions` (one codec init per partition, streamed rows); metadata
  * travels in a sibling struct so pruning the payload column keeps
  * metadata-only scans cheap (columnar parquet reads skip the blob pages).
  */
object Multimodal {

  /** Typed metadata carried beside every payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("durationMs", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", mediaMetaType)))

  /** Wrap a text corpus as fake media rows: payload = UTF-8 bytes, mime
    * derived from the source column. Used to exercise the pipeline without
    * real codecs. */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String,
                   sourceCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        concat(lit("text/plain;src="), col(sourceCol)).as("mime"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("durationMs")).as("meta"))

  /** Output row of the decode/feature stage. */
  case class MediaFeature(media_id: Long, mime: String, byte_len: Int,
                          checksum: String, feature: Array[Float])

  /** Deterministic fake "decode + feature-extract": in production this is
    * the codec call (??? boundary); here it derives a stable 8-dim feature
    * from the payload bytes so tests can assert end-to-end. Lane values
    * are integer byte sums (exact in float32 below 2²⁴, i.e. payloads to
    * ~65 KB/lane), which keeps the fake's output bit-reproducible by the
    * relational oracle — a float-normalized accumulation would be
    * unverifiable float32 rounding. */
  def stubDecode(payload: Array[Byte]): Array[Float] = {
    val f = new Array[Float](8)
    var i = 0
    while (i < payload.length) { f(i % 8) += (payload(i) & 0xff).toFloat; i += 1 }
    f
  }

  /** Deterministic fake "resize": in production the codec decodes, scales
    * to w×h and re-encodes (??? boundary — codec not in this container);
    * the stub emits a w·h-byte payload sampled stride-wise from the input
    * so tests can assert shape + determinism. */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h)
    if (payload.nonEmpty) {
      var i = 0
      while (i < out.length) {
        out(i) = payload((i.toLong * payload.length / out.length).toInt)
        i += 1
      }
    }
    out
  }

  /** Deterministic fake "frame sampling": production decodes video and
    * samples n frames; the stub cuts the payload into n equal byte spans.
    * The Spark-side shape (one input row → n frame rows, partition
    * preserved) is the real contract. */
  case class Frame(media_id: Long, frame_no: Int, frame: Array[Byte])

  def sampleFrames(media: DataFrame, n: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          val span = math.max(1, payload.length / n)
          (0 until n).iterator.map { k =>
            val from = math.min(k * span, payload.length)
            val until = math.min((k + 1) * span, payload.length)
            Frame(id, k, java.util.Arrays.copyOfRange(payload, from, until))
          }
        }
      }
  }

  /** Resize as a partition-preserving Dataset op. */
  def resizeAll(media: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => (id, resizeStub(p, w, h)) })
      .toDF("media_id", "payload_resized")
  }

  /** mapPartitions decode: one "codec" per partition, streaming rows —
    * the real-shape plumbing for binary decode at scale. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("meta.mime"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        // per-partition init point (codec handles, model weights, …)
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, payload, mime) =>
          md.reset()
          val sum = md.digest(payload).map("%02x".format(_)).mkString
          MediaFeature(id, mime, payload.length, sum, stubDecode(payload))
        }
      }
  }
}
