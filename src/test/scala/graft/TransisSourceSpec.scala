package graft

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.fixtures.ReferenceFixtures._
import graft.sources.{HttpPayloadTransport, PayloadTransport, ReconnectingReader}
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
    assert(df.columns.toSeq === Seq("value", "doc_type", "dt"))
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

  /** Minimal in-process HTTP server: connection i is served by script(i)
    * (the last behavior repeats). A behavior serves the payload bytes,
    * optionally truncated, then closes — an EOF-terminated HTTP/1.0 body,
    * which is how the live feed's dropped connections appear to clients.
    * Records each request's Authorization header. */
  class LoopbackServer(script: Seq[Array[Byte]]) {
    /** When set, every connection serves this body instead of the script —
      * lets streaming tests grow the payload between micro-batches. */
    @volatile var body: Array[Byte] = _
    private val server = new java.net.ServerSocket(0)
    val authHeaders = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val requestLines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile private var running = true
    def port: Int = server.getLocalPort
    def url: String = s"http://127.0.0.1:$port/transis/pushservice"
    private var served = 0
    private val thread = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          val resp =
            if (body != null) body
            else script(math.min(served, script.length - 1))
          served += 1
          val in = sock.getInputStream
          // read request headers up to the blank line
          val req = new StringBuilder
          var prev = 0
          var b = in.read()
          while (b >= 0 && !req.endsWith("\r\n\r\n")) {
            req.append(b.toChar); b = if (req.endsWith("\r\n\r\n")) -1 else in.read()
          }
          req.toString.linesIterator
            .find(_.toLowerCase.startsWith("authorization:"))
            .foreach(h => authHeaders.add(h.split(":", 2)(1).trim))
          req.toString.linesIterator.take(1).foreach(requestLines.add)
          val out = sock.getOutputStream
          out.write("HTTP/1.0 200 OK\r\nContent-Type: text/xml\r\nConnection: close\r\n\r\n"
            .getBytes("UTF-8"))
          out.write(resp)
          out.flush()
          sock.close()
        } catch { case _: Throwable if !running => () case _: java.io.IOException => () }
      }
    })
    thread.setDaemon(true)
    thread.start()
    def close(): Unit = { running = false; server.close() }
  }

  private def payloadBytes(docs: String*): Array[Byte] =
    docs.map(_ + NUL).mkString.getBytes("UTF-8")

  test("S1: HTTP transport reads the push stream over a real socket, with basic auth") {
    val full = payloadBytes(singleSiteDoc, multiSiteDoc, errorDoc)
    val srv = new LoopbackServer(Seq(full))
    try {
      val df = spark.read.format("transis")
        .option("path", srv.url)
        .option("username", "user").option("password", "pw")
        .load()
      assert(df.count() === 3)
      // reference transis_consumer.py:49-68: authenticated GET
      val expected = "Basic " + java.util.Base64.getEncoder
        .encodeToString("user:pw".getBytes("UTF-8"))
      assert(srv.authHeaders.contains(expected), srv.authHeaders.toString)
    } finally srv.close()
  }

  test("S2 over HTTP: connection cuts resume at the next offset; budget resets per document") {
    val full = payloadBytes("doc-a", "doc-b", "doc-c")
    // connection 1 dies mid-doc-b; connection 2 dies mid-doc-c;
    // connection 3+ serves everything. With maxReconnects = 1 the stream
    // only survives if the budget resets after each delivered document.
    val srv = new LoopbackServer(Seq(
      java.util.Arrays.copyOfRange(full, 0, 9),
      java.util.Arrays.copyOfRange(full, 0, 16),
      full))
    try {
      val t = new HttpPayloadTransport(srv.url, stallTimeoutMs = 5000)
      val got = new ReconnectingReader(t, maxReconnects = 1).read(0, 3).toList
      assert(got === List("doc-a", "doc-b", "doc-c"))
    } finally srv.close()
  }

  test("available() on a bounded endpoint issues ONE GET per call, not two") {
    // Round-3 regression: a call that opened a fresh counting connection
    // read it to EOF, then unconditionally re-opened and read to EOF
    // again — doubling per-trigger network/CPU on bounded endpoints.
    val srv = new LoopbackServer(Seq(payloadBytes("doc-a", "doc-b")))
    try {
      val t = new HttpPayloadTransport(srv.url, stallTimeoutMs = 5000)
      assert(t.available() === 2L)
      assert(srv.requestLines.size === 1, srv.requestLines.toString)
      // next call: the EOF'd connection is gone, so exactly one fresh GET
      assert(t.available() === 2L)
      assert(srv.requestLines.size === 2, srv.requestLines.toString)
      t.close()
    } finally srv.close()
  }

  test("parked connections expire after the idle TTL") {
    import graft.sources.TransisConnCache
    val srv = new LoopbackServer(Seq(payloadBytes("doc-a", "doc-b")))
    val saved = TransisConnCache.maxIdleMs
    try {
      val t = new HttpPayloadTransport(srv.url, stallTimeoutMs = 5000)
      // serve [0,1): the framer parks at position 1 for the next batch
      assert(new ReconnectingReader(t, 1).read(0, 1).toList === List("doc-a"))
      // fresh park is reclaimable…
      assert(TransisConnCache.take(s"${srv.url}|null", 1L).isDefined)
      // …but one older than the TTL is closed and dropped
      assert(new ReconnectingReader(t, 1).read(0, 1).toList === List("doc-a"))
      TransisConnCache.maxIdleMs = 0L
      Thread.sleep(5)
      assert(TransisConnCache.take(s"${srv.url}|null", 1L).isEmpty)
    } finally { TransisConnCache.maxIdleMs = saved; srv.close() }
  }

  test("a partition reader abandoned mid-range closes its connection") {
    val srv = new LoopbackServer(Seq(payloadBytes("doc-a", "doc-b", "doc-c")))
    try {
      val t = new HttpPayloadTransport(srv.url, stallTimeoutMs = 5000)
      val it = new ReconnectingReader(t, 1).read(0, 3)
      assert(it.next() === "doc-a")
      it.close() // abandoned at doc 1 of [0,3): must close, not park
      assert(graft.sources.TransisConnCache
        .take(s"${srv.url}|null", 1L).isEmpty)
    } finally srv.close()
  }

  test("S2 over HTTP: a permanently dead endpoint exhausts the budget") {
    val srv = new LoopbackServer(Seq(payloadBytes("doc-a").take(2)))
    try {
      val t = new HttpPayloadTransport(srv.url, stallTimeoutMs = 5000)
      val ex = intercept[java.io.IOException] {
        new ReconnectingReader(t, maxReconnects = 2).read(0, 1).toList
      }
      assert(ex.getMessage.contains("after 2 reconnects"))
    } finally srv.close()
  }

  test("checkpointed restart resumes at the committed document offset") {
    val f = Files.createTempFile("transis-restart", ".payload").toString
    val ckpt = Files.createTempDirectory("transis-ckpt").toString
    val out = Files.createTempDirectory("transis-out").toString
    def run(): Unit = {
      val raw = spark.readStream.format("transis").option("path", f).load()
      val q = Pipeline.payloadToRecords(raw).writeStream
        .outputMode("append").option("checkpointLocation", ckpt)
        .format("parquet").option("path", out).start()
      try q.processAllAvailable() finally q.stop()
    }
    writePayload(f, singleSiteDoc)
    run()
    assert(spark.read.parquet(out).count() === 1)
    // stream is DOWN while two documents arrive; the restarted query must
    // read ONLY the delta past the committed offset (doc-index offsets +
    // WAL): cumulative output = 1 + 2 site rows. A full re-read would
    // duplicate the first-period record (4 rows, 2 copies of epoch1543).
    writePayload(f, multiSiteDoc, emptyMessagesDoc)
    run()
    val rows = spark.read.parquet(out)
    assert(rows.count() === 3)
    assert(rows
      .filter(col("collectionendtimestamp_plus_3_mins") === epoch1543)
      .count() === 1) // committed doc exactly once — never replayed
  }

  test("S1 streaming over HTTP: micro-batches advance with the live payload") {
    val srv = new LoopbackServer(Seq.empty)
    srv.body = payloadBytes(singleSiteDoc)
    try {
      val raw = spark.readStream.format("transis")
        .option("path", srv.url).load()
      val records = Pipeline.payloadToRecords(raw)
      val q = records.writeStream.outputMode("append")
        .format("memory").queryName("http_stream").start()
      try {
        q.processAllAvailable()
        assert(spark.table("http_stream").count() === 1)
        // the feed grows by two documents — only the delta is read
        srv.body = payloadBytes(singleSiteDoc, multiSiteDoc, emptyMessagesDoc)
        q.processAllAvailable()
        assert(spark.table("http_stream").count() === 3) // 1 + 2 sites
      } finally q.stop()
    } finally srv.close()
  }

  test("admission control: a backfill drains in bounded batches and AvailableNow stops") {
    val f = Files.createTempFile("transis-admission", ".payload").toString
    writePayload(f, (1 to 7).map(i => s"doc-$i"): _*)
    // 7-doc payload, 3 docs/batch: without admission control a restart
    // over a replayable payload arrives as ONE mega-batch; with it the
    // backfill is 3 + 3 + 1, and AvailableNow drains then terminates
    val raw = spark.readStream.format("transis")
      .option("path", f).option("maxdocsperbatch", "3").load()
    val q = raw.select(col("value")).writeStream.outputMode("append")
      .format("memory").queryName("transis_admission")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "AvailableNow query did not terminate")
    assert(spark.table("transis_admission").count() === 7)
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length === 3, batches.map(_.numInputRows).mkString(","))
    assert(batches.forall(_.numInputRows <= 3),
      batches.map(_.numInputRows).mkString(","))
  }

  /** Live push server: accepts connections, serves `initial` after the
    * HTTP headers, and KEEPS the socket open (the reference's real
    * ingress — one streaming GET that stays up). Counts accepts. */
  class LiveServer(initial: Array[Byte]) {
    private val server = new java.net.ServerSocket(0)
    val accepted = new java.util.concurrent.atomic.AtomicInteger(0)
    private val socks =
      new java.util.concurrent.ConcurrentLinkedQueue[java.net.Socket]()
    @volatile private var running = true
    def url: String = s"http://127.0.0.1:${server.getLocalPort}/transis/pushservice"
    private val thread = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          accepted.incrementAndGet()
          socks.add(sock)
          val in = sock.getInputStream
          val req = new StringBuilder
          var b = in.read()
          while (b >= 0 && !req.endsWith("\r\n\r\n")) {
            req.append(b.toChar)
            b = if (req.endsWith("\r\n\r\n")) -1 else in.read()
          }
          val out = sock.getOutputStream
          out.write("HTTP/1.0 200 OK\r\nContent-Type: text/xml\r\n\r\n"
            .getBytes("UTF-8"))
          out.write(initial)
          out.flush() // socket intentionally left open
        } catch {
          case _: Throwable if !running => ()
          case _: java.io.IOException => ()
        }
      }
    })
    thread.setDaemon(true)
    thread.start()
    def close(): Unit = {
      running = false
      server.close()
      socks.forEach(s => try s.close() catch { case _: java.io.IOException => () })
    }
  }

  test("HTTP offsets are incremental: O(1) connections across micro-batches") {
    // Live connection, 2 docs, 1 doc/batch → 2 micro-batches. Round-2
    // behavior opened a full-stream-re-reading connection per trigger
    // PLUS one per batch (≥5 accepts here); incremental counting + the
    // parked reader connection need exactly 2: one counting, one reading.
    val srv = new LiveServer(payloadBytes("doc-a", "doc-b"))
    try {
      val raw = spark.readStream.format("transis")
        .option("path", srv.url).option("stalltimeoutms", "2000")
        .option("maxdocsperbatch", "1").load()
      val q = raw.select(col("value")).writeStream.outputMode("append")
        .format("memory").queryName("transis_live_conns").start()
      try {
        q.processAllAvailable()
        assert(spark.table("transis_live_conns").count() === 2)
        assert(srv.accepted.get() === 2, s"accepted=${srv.accepted.get()}")
      } finally q.stop()
    } finally srv.close()
  }

  test("AvailableNow over HTTP resumes from checkpoint, one doc per batch") {
    // The reference's full consume loop: resume where the consumer left
    // off, one document at a time (transis_consumer.py:115-151), but with
    // checkpointed exactly-once offsets. Run 1 drains 2 docs and STOPS
    // (AvailableNow); the feed grows; run 2 reads ONLY the delta.
    val ckpt = Files.createTempDirectory("transis-an-ckpt").toString
    val out = Files.createTempDirectory("transis-an-out").toString
    val srv = new LoopbackServer(Seq.empty)
    def run(): Unit = {
      val raw = spark.readStream.format("transis")
        .option("path", srv.url).option("stalltimeoutms", "5000")
        .option("maxdocsperbatch", "1").load()
      val q = raw.select(col("value")).writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "AvailableNow did not terminate")
    }
    try {
      srv.body = payloadBytes("doc-a", "doc-b")
      run()
      assert(spark.read.parquet(out).count() === 2)
      srv.body = payloadBytes("doc-a", "doc-b", "doc-c", "doc-d")
      run()
      val rows = spark.read.parquet(out)
      assert(rows.count() === 4) // delta only: committed docs never replayed
      assert(rows.filter(col("value") === "doc-a").count() === 1)
    } finally srv.close()
  }

  test("S4 pushdown: doc_type/dt predicates vanish from the post-scan plan") {
    import org.apache.spark.sql.functions.col
    val f = Files.createTempFile("transis-pd", ".payload").toString
    writePayload(f, singleSiteDoc, multiSiteDoc, topologyDoc, errorDoc)
    val df = spark.read.format("transis").option("path", f).load()
      .filter(col("doc_type") === "DetectorCountMessages" &&
        col("dt") >= "2019-10-01")
      .select("value")
    // transport-evaluated: topology (wrong type) and error (no date) gone
    assert(df.count() === 2)
    val plan = df.queryExecution.executedPlan.toString
    // no residual Filter NODE: both predicates were fully handled by the
    // scan (the scan description itself advertises PushedDocFilters)
    assert(!plan.contains("isnotnull"), plan.take(1000))
    assert(!plan.matches("(?s).*\\bFilter \\(.*"), plan.take(1000))
    assert(plan.contains("PushedDocFilters: DocFilters(Some(DetectorCountMessages),Some(2019-10-01))"),
      plan.take(1000))
  }

  test("S4 pushdown over HTTP: predicates ride the URL as getFromDate params") {
    import org.apache.spark.sql.functions.col
    val full = payloadBytes(singleSiteDoc, topologyDoc)
    val srv = new LoopbackServer(Seq(full))
    try {
      val n = spark.read.format("transis").option("path", srv.url).load()
        .filter(col("doc_type") === "DetectorCountMessages" &&
          col("dt") >= "2019-10-01")
        .count()
      assert(n === 1) // server ignores params; client-side recheck filters
      val lines = srv.requestLines.toArray.mkString("\n")
      assert(lines.contains("types=DetectorCountMessages"), lines)
      assert(lines.contains("startDate=2019-10-01"), lines)
    } finally srv.close()
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
