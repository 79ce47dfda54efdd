package graft

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.ReferenceFixtures._
import graft.sources.{PayloadTransport, ReconnectingReader}
import graft.stream.Pipeline

/** DSv2 `transis` source: framing at the source boundary, micro-batch
  * offset tracking, and the S2 reconnect budget
  * (reference `transis_consumer.py:49-151`). */
class TransisSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def writePayload(path: String, docs: String*): Unit =
    Files.write(Paths.get(path), docs.map(_ + NUL).mkString.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  test("batch read frames NUL-delimited documents") {
    val f = Files.createTempFile("transis", ".payload").toString
    writePayload(f, singleSiteDoc, multiSiteDoc, errorDoc)
    val df = spark.read.format("transis").option("path", f).load()
    assert(df.count() === 3)
    assert(df.columns.toSeq === Seq("value"))
  }

  test("micro-batch stream tracks document offsets incrementally") {
    val f = Files.createTempFile("transis-stream", ".payload").toString
    writePayload(f, singleSiteDoc)
    val raw = spark.readStream.format("transis").option("path", f).load()
    val records = Pipeline.payloadToRecords(raw)
    val q = records.writeStream.outputMode("append")
      .format("memory").queryName("transis_records").start()
    try {
      q.processAllAvailable()
      assert(spark.table("transis_records").count() === 1)
      // push two more documents — only the delta is read next batch
      writePayload(f, multiSiteDoc, emptyMessagesDoc)
      q.processAllAvailable()
      assert(spark.table("transis_records").count() === 3) // 1 + 2 sites
    } finally q.stop()
  }

  /** Transport failing `failures` times before each successful doc. */
  class FlakyTransport(docs: Seq[String], failEvery: Int) extends PayloadTransport {
    var calls = 0
    override def available(): Long = docs.length.toLong
    override def read(from: Long, until: Long): Iterator[String] = {
      calls += 1
      if (calls % failEvery != 0)
        throw new java.io.IOException(s"connection reset (call $calls)")
      docs.iterator.slice(from.toInt, until.toInt)
    }
  }

  test("S2: reconnect budget of 3 with per-document reset") {
    // every 3rd connection attempt succeeds → within budget, stream survives
    val t = new FlakyTransport(Seq("a", "b", "c"), failEvery = 3)
    val got = new ReconnectingReader(t, maxReconnects = 3).read(0, 3).toList
    assert(got === List("a", "b", "c"))
  }

  test("S2: exceeding the reconnect budget fails the stream") {
    val alwaysDown = new PayloadTransport {
      override def available(): Long = 1L
      override def read(from: Long, until: Long): Iterator[String] =
        throw new java.io.IOException("down")
    }
    val ex = intercept[java.io.IOException] {
      new ReconnectingReader(alwaysDown, maxReconnects = 3).read(0, 1).toList
    }
    assert(ex.getMessage.contains("after 3 reconnects"))
  }
}
