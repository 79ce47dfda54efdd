package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.Multimodal

/** Multimodal binary-column plumbing (SURVEY §7.4): schema, decode /
  * feature-extract / resize / frame-sample batch shapes over a
  * deterministic stub codec. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private lazy val media = {
    import spark.implicits._
    val docs = Seq((1L, "hello multimodal world", "srcA"),
      (2L, "binary payloads at scale", "srcB"))
      .toDF("doc_id", "text", "source")
    Multimodal.asMediaTable(docs, "doc_id", "text", "source")
  }

  test("media table carries binary payload + typed metadata struct") {
    assert(media.schema("payload").dataType.typeName === "binary")
    val mime = media.filter(col("media_id") === 1)
      .select("meta.mime").head().getString(0)
    assert(mime === "text/plain;src=srcA")
  }

  test("feature extraction: one codec init per partition, stable features") {
    val f = Multimodal.extractFeatures(media).collect()
      .map(x => x.media_id -> x).toMap
    assert(f(1L).byte_len === "hello multimodal world".length)
    assert(f(1L).feature.length === 8)
    // deterministic: same payload → same feature vector + checksum
    val again = Multimodal.extractFeatures(media).collect()
      .map(x => x.media_id -> x).toMap
    assert(f(1L).checksum === again(1L).checksum)
    assert(f(1L).feature.toSeq === again(1L).feature.toSeq)
  }

  test("resize emits fixed w*h byte payloads") {
    val out = Multimodal.resizeAll(media, 4, 3).collect()
    assert(out.forall(_.getAs[Array[Byte]]("payload_resized").length === 12))
  }

  test("frame sampling: one row per frame, partition-preserved contract") {
    val frames = Multimodal.sampleFrames(media, 4).collect()
    assert(frames.length === 8) // 2 payloads × 4 frames
    assert(frames.filter(_.media_id == 1L).map(_.frame_no).sorted.toSeq
      === Seq(0, 1, 2, 3))
    // spans reassemble to a prefix of the original payload
    val joined = frames.filter(_.media_id == 2L).sortBy(_.frame_no)
      .flatMap(_.frame)
    val orig = "binary payloads at scale".getBytes("UTF-8")
    assert(joined.toSeq === orig.take(joined.length).toSeq)
  }
}
