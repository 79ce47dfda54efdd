package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1/S2: the push-stream source as a DataSource V2 `MicroBatchStream`
  * (SURVEY.md §2.1; reference `transis_consumer.py:49-151`).
  *
  * The reference opens a streaming HTTP GET, frames documents on NUL bytes
  * and retries the connection up to `max_transis_reconnects` times, with the
  * counter reset after every successfully-read document
  * (`transis_consumer.py:13,41-47,140-148`). Here the transport is
  * abstracted behind [[PayloadTransport]]: http(s) paths use
  * [[HttpPayloadTransport]] (the reference's streaming GET with basic
  * auth and stall timeout, exercised against a loopback server in
  * `TransisSourceSpec`); other paths use [[FilePayloadTransport]] for
  * file-backed streams in tests and local runs.
  *
  * Offsets are document indices, so Structured Streaming checkpointing gives
  * exactly-once source tracking — strictly stronger than the reference's
  * resume-at-now behavior (SURVEY §2.9, allowed upgrade).
  *
  * Usage: `spark.readStream.format("transis").option("path", f).load()`
  * → one row per framed document: `value` (the raw doc) plus `doc_type`
  * and `dt` metadata columns that exist so S4 date/type predicates have
  * a column to push down into the transport (TransisScanBuilder).
  */
trait PayloadTransport extends Serializable {
  /** Number of documents currently available. */
  def available(): Long
  /** Read documents [from, until). May throw transient IO errors. */
  def read(from: Long, until: Long): Iterator[String]
  /** Release any long-lived resources (driver-side offset tracking). */
  def close(): Unit = ()
}

/** Pull-based NUL framer over a byte stream: produces exactly one
  * document per call and never reads past a document boundary — so a
  * LIVE connection can be parked between micro-batches without blocking
  * on bytes the server hasn't sent yet (an eagerly-prefetching iterator
  * would hang the batch waiting for the next document's terminator). */
private[graft] final class NulFramer(in: java.io.InputStream) {
  private val buf = new java.io.ByteArrayOutputStream()
  private var eof = false
  /** Next complete non-empty document, or null at EOF (a trailing
    * unterminated fragment is discarded — a connection cut mid-document
    * must not surface a truncated doc). */
  def nextDoc(): String = {
    while (!eof) {
      val b = in.read()
      if (b < 0) { eof = true; buf.reset() }
      else if (b == 0) {
        val doc = buf.toString(java.nio.charset.StandardCharsets.UTF_8.name())
        buf.reset()
        if (doc.trim.nonEmpty) return doc
      } else buf.write(b)
    }
    null
  }
  def close(): Unit = try in.close() catch { case _: java.io.IOException => () }
}

/** Executor-side connection parking lot (the CachedKafkaConsumer idea):
  * a framer that finished batch [a,b) is parked at position b; the next
  * batch asking for [b,c) on the same endpoint continues the SAME
  * connection instead of re-opening and re-skipping b documents. A
  * sequential replay therefore costs O(stream) bytes and O(1)
  * connections total, not O(batches) connections / O(stream·batches)
  * bytes. Misses (restart at an earlier offset, executor loss, broken
  * connection) fall back to open-and-skip. One entry per endpoint;
  * replacing a parked entry closes the old connection. */
private[graft] object TransisConnCache {
  private case class Parked(pos: Long, framer: NulFramer, parkedAtMs: Long)
  private val entries =
    new java.util.concurrent.ConcurrentHashMap[String, Parked]()
  /** Idle TTL: a parked connection not reclaimed within this window is
    * closed on next access (abandoned queries would otherwise leak one
    * socket per endpoint for the JVM's life; most servers would have
    * dropped the idle socket anyway, so continuing it would just burn a
    * reconnect attempt). Sequential micro-batches reclaim within
    * seconds, far inside any sane TTL. */
  private[graft] var maxIdleMs: Long = 10 * 60 * 1000L
  private def expired(e: Parked, now: Long): Boolean =
    now - e.parkedAtMs > maxIdleMs
  /** Claim the parked framer for `key` if it sits exactly at `from`
    * and hasn't idled past the TTL. */
  def take(key: String, from: Long): Option[NulFramer] = {
    val e = entries.remove(key)
    if (e == null) None
    else if (e.pos == from && !expired(e, System.currentTimeMillis()))
      Some(e.framer)
    else { e.framer.close(); None }
  }
  def park(key: String, pos: Long, framer: NulFramer): Unit = {
    val now = System.currentTimeMillis()
    val old = entries.put(key, Parked(pos, framer, now))
    if (old != null) old.framer.close()
    // opportunistic reap: parking is the only regular write, so sweep
    // other endpoints' expired entries here (no background thread)
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val kv = it.next()
      if (expired(kv.getValue, now)) { kv.getValue.framer.close(); it.remove() }
    }
  }
  /** Close and drop the parked connection for one endpoint. */
  def drop(key: String): Unit = {
    val e = entries.remove(key)
    if (e != null) e.framer.close()
  }

  /** Close and drop every parked connection (tests / shutdown). */
  def clear(): Unit = {
    val it = entries.values().iterator()
    while (it.hasNext) { it.next().framer.close(); it.remove() }
  }
}

/** NUL-framed documents in a single growable file (empty fragments are
  * dropped — F1, reference `transis_consumer.py:89`). Pushed-down doc
  * filters are applied while framing — the file stands in for the
  * server, so the filter runs where the server's would. */
class FilePayloadTransport(path: String, filters: DocFilters = DocFilters())
    extends PayloadTransport {
  private def docs(): Array[String] = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      .split("\u0000").iterator.filter(_.trim.nonEmpty)
      .filter(filters.matches).toArray
  }
  override def available(): Long = docs().length.toLong
  override def read(from: Long, until: Long): Iterator[String] =
    docs().iterator.slice(from.toInt, until.toInt)
}

/** Live HTTP transport: the reference's ingress — a streaming GET with
  * basic auth, `Content-type: text/xml`, `Connection: close`, and a stall
  * timeout (reference `transis_consumer.py:49-68`: Transis tends to stop
  * sending without closing the connection, so reads that stall longer
  * than `stallTimeoutMs` abort and count against the reconnect budget).
  *
  * Documents are framed on NUL bytes as they stream in
  * (`transis_consumer.py:127-139`); empty fragments are dropped (F1). A
  * `read(from, until)` opens a fresh connection and skips the first
  * `from` documents, so offset ranges are reproducible against a
  * replayable endpoint (the test server, or a replay proxy in front of
  * the live feed); against a live-only push stream the skip counts from
  * stream start, i.e. "resume at now" — exactly the reference's
  * semantics. A stream that ends before delivering the requested range
  * throws IOException so [[ReconnectingReader]] applies the S2 budget. */
class HttpPayloadTransport(url: String,
                           stallTimeoutMs: Int = 20 * 60 * 1000,
                           username: String = null,
                           password: String = null,
                           filters: DocFilters = DocFilters())
    extends PayloadTransport {

  /** Pushed filters ride as the reference's URL params
    * (`getFromDate?startDate=…&types=…`); they are also re-checked
    * client-side after framing, so a server that ignores them still
    * yields correct (just less efficient) results. */
  private def effectiveUrl: String =
    if (filters.isEmpty) url
    else url + (if (url.contains("?")) "&" else "?") +
      filters.queryParams.mkString("&")

  private def open(): java.io.InputStream = {
    val conn = new java.net.URL(effectiveUrl).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("GET")
    conn.setConnectTimeout(stallTimeoutMs)
    conn.setReadTimeout(stallTimeoutMs)
    conn.setRequestProperty("Content-type", "text/xml;charset=\"utf-8\"")
    conn.setRequestProperty("Connection", "close")
    if (username != null) {
      val cred = java.util.Base64.getEncoder.encodeToString(
        s"$username:$password".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      conn.setRequestProperty("Authorization", s"Basic $cred")
    }
    val code = conn.getResponseCode
    if (code >= 400) // raise_for_status
      throw new java.io.IOException(s"HTTP $code from $url")
    // the reference reads the socket one byte at a time
    // (transis_consumer.py:127, iter_content(1)) — a pathology SURVEY
    // §4.1 calls out, not something to reproduce: buffer the stream so
    // per-byte framing reads hit memory, not the socket
    new java.io.BufferedInputStream(conn.getInputStream, 64 << 10)
  }

  private def cacheKey: String = s"$effectiveUrl|$username"

  // ---- driver-side incremental offset tracking -------------------------
  // One persistent counting connection; newly-arrived frames are counted
  // per trigger instead of re-reading the whole stream per latestOffset
  // (round-2 available() re-opened and re-counted EVERYTHING each call —
  // O(stream²) bytes over a session). Against a live push stream the
  // connection lives for the whole query; against a bounded replayable
  // endpoint EOF closes it and the NEXT call re-opens (a fresh GET is the
  // only way plain HTTP exposes growth), counting the replay cheaply and
  // taking the high-water mark.
  @transient private var countIn: java.io.InputStream = _
  @transient private var countBuf: java.io.ByteArrayOutputStream = _
  private var connCount = 0L // matching docs framed on current connection
  private var hwm = 0L       // high-water mark across connections
  private var everRead = false

  /** Feed `n` bytes into the counting framer. */
  private def feed(chunk: Array[Byte], n: Int): Unit = {
    var i = 0
    while (i < n) {
      val b = chunk(i)
      if (b == 0) {
        val doc = countBuf.toString(
          java.nio.charset.StandardCharsets.UTF_8.name())
        countBuf.reset()
        if (doc.trim.nonEmpty && filters.matches(doc)) {
          connCount += 1
          if (connCount > hwm) hwm = connCount
        }
      } else countBuf.write(b.toInt)
      i += 1
    }
  }

  /** Documents currently observed on the endpoint. Against a LIVE push
    * connection this drains whatever has already arrived (plus at most
    * one blocking read — the push-stream "wait for the server to send",
    * reference transis_consumer.py:115-126, bounded by the stall
    * timeout) and counts incrementally: one connection for the query's
    * whole life, each byte read once. A bounded endpoint signals EOF;
    * growth there is only visible through a fresh GET, so EOF re-opens
    * (at most once per call) and the replayed count folds into the
    * high-water mark. A connection OPENED within this call that reaches
    * EOF is already a complete current view — no second GET (round 3
    * reopened unconditionally after any EOF, reading a bounded endpoint
    * twice per trigger). */
  override def available(): Long = synchronized {
    val chunk = new Array[Byte](8192)
    var openedThisCall = false
    var go = true
    try {
      while (go) {
        if (countIn == null) {
          if (openedThisCall) go = false // this call's fresh GET already drained
          else {
            countIn = open()
            openedThisCall = true
            countBuf = new java.io.ByteArrayOutputStream()
            connCount = 0
            everRead = false
          }
        }
        if (go) {
          // one blocking read per call when nothing is buffered — the
          // only way to tell "no data yet" from "connection ended"
          var blockedOnce = false
          var inner = true
          while (inner) {
            if (countIn.available() == 0 && everRead && blockedOnce) inner = false
            else {
              if (countIn.available() == 0) blockedOnce = true
              val n = countIn.read(chunk, 0, chunk.length)
              if (n < 0) { // EOF: bounded endpoint fully drained
                countIn.close(); countIn = null; inner = false
              } else { everRead = true; feed(chunk, n) }
            }
          }
          if (countIn != null) go = false // alive and drained: done
        }
      }
    } catch {
      case _: java.net.SocketTimeoutException =>
        // idle longer than the stall budget: KEEP the connection (a live
        // feed with no traffic is indistinguishable from a wedged server
        // by any client; the reader path owns reconnect recovery, and a
        // recovered server resumes on this same socket incrementally)
        ()
      case _: java.io.IOException => // broken connection: reconnect next
        if (countIn != null) {
          try countIn.close() catch { case _: java.io.IOException => () }
        }
        countIn = null
    }
    hwm
  }

  override def close(): Unit = synchronized {
    if (countIn != null) {
      try countIn.close() catch { case _: java.io.IOException => () }
      countIn = null
    }
    // release any connection parked for this endpoint in THIS JVM (local
    // mode / driver-side reads); executor-side entries age out through
    // the server's own idle timeout and the IOException-miss fallback
    TransisConnCache.drop(cacheKey)
  }

  /** Read [from, until), continuing a parked connection when one sits at
    * exactly `from` (sequential micro-batches never re-open or re-skip);
    * otherwise open and skip. The connection is parked again — still
    * open — once the batch is fully served. */
  override def read(from: Long, until: Long): Iterator[String] = {
    val framer = TransisConnCache.take(cacheKey, from).getOrElse {
      val f = new NulFramer(open())
      var skipped = 0L
      while (skipped < from) {
        val d = f.nextDoc()
        if (d == null) {
          f.close()
          throw new java.io.IOException(
            s"transis stream ended before resume offset $from")
        }
        if (filters.matches(d)) skipped += 1
      }
      f
    }
    new Iterator[String] with java.io.Closeable {
      private var served = from
      override def hasNext: Boolean = served < until
      override def next(): String = {
        if (!hasNext) throw new NoSuchElementException
        var d = framer.nextDoc()
        while (d != null && !filters.matches(d)) d = framer.nextDoc()
        if (d == null) {
          framer.close()
          throw new java.io.IOException(
            s"transis stream ended at doc $served before requested $until")
        }
        served += 1
        if (served == until) TransisConnCache.park(cacheKey, until, framer)
        d
      }
      /** Abandoned mid-range (task kill/retry, query stopped): the framer
        * sits at an offset no sequential successor will ask for, so close
        * it rather than park it. Fully-served iterators already parked —
        * close() is then a no-op (double-close of the stream is safe). */
      override def close(): Unit = if (served < until) framer.close()
    }
  }
}

/** Cheap per-document metadata probes (no XML parse): the root's first
  * child element name and the first `date="yyyy-MM-dd…"` attribute. These
  * back the `doc_type` / `dt` source columns and the S4 predicate
  * pushdown (SURVEY §4.2 row 1). */
object TransisDocMeta {
  private val childElem =
    "(?s)<\\s*(?:[A-Za-z0-9]+:)?TransisResponse[^>]*>\\s*<\\s*(?:[A-Za-z0-9]+:)?([A-Za-z0-9]+)".r
  private val dateAttr = "date=\"(\\d{4}-\\d{2}-\\d{2})".r
  def docType(doc: String): String =
    childElem.findFirstMatchIn(doc).map(_.group(1)).orNull
  def docDate(doc: String): String =
    dateAttr.findFirstMatchIn(doc).map(_.group(1)).orNull
}

/** S4 pushdown state: the `types=` / `startDate=` server params of the
  * reference's `getFromDate` (`transis_consumer.py:166-173`), evaluated
  * by the transport. HTTP mode forwards them as URL query params (the
  * real server-side pushdown) and re-applies them client-side for
  * defense in depth; file mode evaluates them while framing — either
  * way matching documents are selected BEFORE rows reach Spark, and the
  * post-scan Filter node disappears. */
case class DocFilters(docType: Option[String] = None,
                      fromDate: Option[String] = None) extends Serializable {
  def isEmpty: Boolean = docType.isEmpty && fromDate.isEmpty
  def matches(doc: String): Boolean =
    docType.forall(t => TransisDocMeta.docType(doc) == t) &&
      fromDate.forall { d =>
        val dd = TransisDocMeta.docDate(doc); dd != null && dd >= d
      }
  def queryParams: Seq[String] = {
    // URL-encode values: reference dates carry '+' timezone offsets and
    // ':' which would decode as a space / confuse the query string (the
    // reference encodes via requests' params=, transis_consumer.py:169).
    def enc(v: String) = java.net.URLEncoder.encode(
      v, java.nio.charset.StandardCharsets.UTF_8)
    docType.map(t => s"types=${enc(t)}").toSeq ++
      fromDate.map(d => s"startDate=${enc(d)}").toSeq
  }
}

/** Serializable transport selector: http(s) paths get the live HTTP
  * transport, anything else the file transport. Carried into executors
  * by the input partitions. */
case class TransportConfig(path: String,
                           stallTimeoutMs: Int = 20 * 60 * 1000,
                           username: String = null,
                           password: String = null,
                           filters: DocFilters = DocFilters()) extends Serializable {
  def newTransport(): PayloadTransport =
    if (path.startsWith("http://") || path.startsWith("https://"))
      new HttpPayloadTransport(path, stallTimeoutMs, username, password, filters)
    else new FilePayloadTransport(path, filters)
}

/** S2 reconnect budget: bounded retries around a transport read; the
  * budget resets after each successfully delivered document (reference
  * `transis_consumer.py:140`). */
class ReconnectingReader(transport: PayloadTransport, maxReconnects: Int) {
  def read(from: Long, until: Long): Iterator[String] with java.io.Closeable =
    new Iterator[String] with java.io.Closeable {
    private var pos = from
    private var attempts = 0
    private var inner: Iterator[String] = Iterator.empty
    private def reconnect(): Unit = { inner = transport.read(pos, until) }
    /** Release the underlying transport iterator when the range was
      * abandoned before `until` (task kill, query stop, reconnect give-up)
      * — otherwise the HTTP framer it holds leaks its connection. */
    override def close(): Unit = inner match {
      case c: java.io.Closeable => c.close()
      case _ => ()
    }
    override def hasNext: Boolean = pos < until
    override def next(): String = {
      while (true) {
        try {
          if (!inner.hasNext) reconnect()
          val doc = inner.next()
          pos += 1
          attempts = 0 // reset per successful document
          return doc
        } catch {
          case e: java.io.IOException =>
            attempts += 1
            // close the broken transport iterator before discarding it —
            // its framer still holds the dead HTTP connection (the
            // "stream ended" path closes itself; double-close is safe)
            inner match {
              case c: java.io.Closeable =>
                try c.close() catch { case _: java.io.IOException => () }
              case _ => ()
            }
            inner = Iterator.empty
            if (attempts > maxReconnects)
              throw new java.io.IOException(
                s"transis stream failed after $maxReconnects reconnects", e)
        }
      }
      throw new IllegalStateException("unreachable")
    }
  }
}

case class DocOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

class TransisSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "transis"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TransisSourceProvider.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new TransisTable(
      TransportConfig(
        properties.get("path"),
        Option(properties.get("stalltimeoutms")).map(_.toInt)
          .getOrElse(20 * 60 * 1000),
        properties.get("username"),
        properties.get("password")),
      Option(properties.get("maxreconnects")).map(_.toInt).getOrElse(3),
      Option(properties.get("maxdocsperbatch")).map { v =>
        val n = v.toLong
        // ReadLimit.maxRows takes an Int: reject rather than let a
        // too-large value overflow into a negative/garbage row limit
        require(n > 0 && n <= Int.MaxValue,
          s"maxdocsperbatch must be in (0, ${Int.MaxValue}], got $n")
        n
      })
}

object TransisSourceProvider {
  /** `value` is the raw document; `doc_type` / `dt` are cheap metadata
    * probes (TransisDocMeta) that exist to give S4 predicates a column
    * to land on — filters on them push into the transport. */
  val schema: StructType = StructType(Seq(
    StructField("value", StringType),
    StructField("doc_type", StringType),
    StructField("dt", StringType)))
}

class TransisTable(config: TransportConfig, maxReconnects: Int,
                   maxDocsPerBatch: Option[Long] = None)
    extends Table with SupportsRead {
  override def name(): String = s"transis(${config.path})"
  override def schema(): StructType = TransisSourceProvider.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TransisScanBuilder(config, maxReconnects, maxDocsPerBatch)
}

/** S4 pushdown (SURVEY §4.2 row 1): `doc_type = X` → `types=X`,
  * `dt >= D` → `startDate=D`. Accepted filters are FULLY handled by the
  * transport, so they are removed from the post-scan plan (no residual
  * Filter node); everything else stays Spark-side. Column pruning drops
  * unprojected metadata columns from the rows the reader materializes. */
class TransisScanBuilder(config: TransportConfig, maxReconnects: Int,
                         maxDocsPerBatch: Option[Long] = None)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  import org.apache.spark.sql.sources._

  private var docFilters = DocFilters()
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = TransisSourceProvider.schema

  override def pushFilters(fs: Array[Filter]): Array[Filter] = {
    // Multiple dt lower bounds conjoin to their max (ISO-8601 strings
    // order lexicographically = chronologically), so pushing the max
    // fully handles EVERY `dt >=` conjunct. Multiple doc_type equalities
    // to distinct values can't all ride one `types=` param: push one and
    // keep the rest as residual Spark filters — the transport returns a
    // superset and Spark finishes the conjunction. (Claiming filters
    // handled whose value was never pushed would silently drop them.)
    val typeEqs = fs.collect { case EqualTo("doc_type", v: String) => v }.distinct
    val dateGtes = fs.collect { case GreaterThanOrEqual("dt", v: String) => v }
    val typeEq = typeEqs.headOption
    val dateGte = if (dateGtes.nonEmpty) Some(dateGtes.max) else None
    docFilters = DocFilters(typeEq, dateGte)
    val handled: Filter => Boolean = {
      case EqualTo("doc_type", v: String) => typeEq.contains(v)
      case IsNotNull("doc_type") => typeEq.isDefined // implied by equality
      case GreaterThanOrEqual("dt", _: String) => dateGte.isDefined
      case IsNotNull("dt") => dateGte.isDefined // implied by >= bound
      case _ => false
    }
    pushed = fs.filter(handled)
    fs.filterNot(handled)
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = {
    val keep = requiredSchema.fieldNames.toSet
    required = StructType(
      TransisSourceProvider.schema.fields.filter(f => keep.contains(f.name)))
  }

  override def build(): Scan =
    new TransisScan(config.copy(filters = docFilters), required,
      maxReconnects, maxDocsPerBatch)
}

class TransisScan(config: TransportConfig, schema: StructType,
                  maxReconnects: Int,
                  maxDocsPerBatch: Option[Long] = None) extends Scan {
  override def readSchema(): StructType = schema
  override def description(): String =
    s"transis(${config.path}) PushedDocFilters: ${config.filters}"
  override def toBatch: Batch = new TransisBatch(config, schema, maxReconnects)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new TransisMicroBatchStream(config, schema, maxReconnects, maxDocsPerBatch)
}

case class TransisInputPartition(config: TransportConfig, from: Long, until: Long)
  extends InputPartition

class TransisPartitionReaderFactory(schema: StructType, maxReconnects: Int)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[TransisInputPartition]
    val docs = new ReconnectingReader(
      part.config.newTransport(), maxReconnects)
      .read(part.from, part.until)
    val fields: Array[String => UTF8String] = schema.fieldNames.map {
      case "value" => (d: String) => UTF8String.fromString(d)
      case "doc_type" => (d: String) =>
        UTF8String.fromString(TransisDocMeta.docType(d))
      case "dt" => (d: String) =>
        UTF8String.fromString(TransisDocMeta.docDate(d))
    }
    new PartitionReader[InternalRow] {
      private var current: String = _
      override def next(): Boolean =
        if (docs.hasNext) { current = docs.next(); true } else false
      override def get(): InternalRow =
        InternalRow.fromSeq(fields.toIndexedSeq.map(_.apply(current)))
      // park-or-close the underlying framer: a reader torn down
      // mid-range (task kill/retry, query stop) must not leak its
      // HTTP connection
      override def close(): Unit = docs.close()
    }
  }
}

/** One-shot batch read (S3-flavored: whole current payload). */
class TransisBatch(config: TransportConfig, schema: StructType,
                   maxReconnects: Int) extends Batch {
  override def planInputPartitions(): Array[InputPartition] = {
    val n = config.newTransport().available()
    Array(TransisInputPartition(config, 0L, n))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new TransisPartitionReaderFactory(schema, maxReconnects)
}

/** Micro-batch driver with admission control: batches are bounded by
  * `maxDocsPerBatch` (`ReadLimit.maxRows`) so a restart/backfill over a
  * large replayable payload arrives as many bounded batches rather than
  * ONE mega-batch — the reference's generator likewise delivers one
  * document at a time (`transis_consumer.py:115-151`; set
  * `maxDocsPerBatch=1` for exactly that cadence). `Trigger.AvailableNow`
  * pins the target offset at query start, drains it in bounded batches,
  * and stops. */
class TransisMicroBatchStream(config: TransportConfig, schema: StructType,
                              maxReconnects: Int,
                              maxDocsPerBatch: Option[Long] = None)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  private val transport = config.newTransport()
  private var availableNowTarget: Option[Long] = None
  private var lastSeen = 0L

  override def initialOffset(): Offset = DocOffset(0L)

  override def getDefaultReadLimit: ReadLimit =
    maxDocsPerBatch.map(n => ReadLimit.maxRows(n.toInt))
      .getOrElse(ReadLimit.allAvailable())

  override def prepareForTriggerAvailableNow(): Unit = {
    lastSeen = transport.available()
    availableNowTarget = Some(lastSeen)
  }

  /** Admission-controlled end offset: everything available, capped to
    * start + maxRows, and never past an AvailableNow pin. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val avail = availableNowTarget.getOrElse {
      lastSeen = transport.available(); lastSeen
    }
    val s = start.asInstanceOf[DocOffset].n
    val end = limit match {
      case mr: ReadMaxRows => math.min(avail, s + mr.maxRows())
      case _ => avail
    }
    DocOffset(math.max(end, s))
  }

  /** Spark calls the two-arg admission-controlled variant above. */
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this")

  override def reportLatestOffset(): Offset = DocOffset(lastSeen)

  override def deserializeOffset(json: String): Offset =
    DocOffset(json.trim.toLong)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[DocOffset].n
    val e = end.asInstanceOf[DocOffset].n
    if (e <= s) Array.empty
    else Array(TransisInputPartition(config, s, e))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new TransisPartitionReaderFactory(schema, maxReconnects)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = transport.close()
}
