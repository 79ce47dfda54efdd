package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
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
    conn.getInputStream
  }

  /** Frame the byte stream into non-empty NUL-delimited documents. A
    * trailing unterminated fragment is discarded (a connection cut
    * mid-document must not surface a truncated doc). */
  private def frames(in: java.io.InputStream): Iterator[String] =
    new Iterator[String] {
      private val buf = new java.io.ByteArrayOutputStream()
      private var nextDoc: String = _
      private var eof = false
      private def advance(): Unit = {
        nextDoc = null
        while (nextDoc == null && !eof) {
          val b = in.read()
          if (b < 0) { eof = true; buf.reset() } // drop partial tail
          else if (b == 0) {
            val doc = buf.toString(
              java.nio.charset.StandardCharsets.UTF_8.name())
            buf.reset()
            if (doc.trim.nonEmpty) nextDoc = doc
          } else buf.write(b)
        }
      }
      advance()
      override def hasNext: Boolean = nextDoc != null
      override def next(): String = {
        val d = nextDoc; advance(); d
      }
    }

  /** Documents currently served by the endpoint (bounded/replayable
    * endpoints only — a live push stream never ends; there the
    * micro-batch driver should bound batches by wall clock instead). */
  override def available(): Long = {
    val in = open()
    try frames(in).filter(filters.matches).size.toLong finally in.close()
  }

  override def read(from: Long, until: Long): Iterator[String] =
    new Iterator[String] {
      private val in = open()
      private val it = frames(in).filter(filters.matches).drop(from.toInt)
      private var served = from
      override def hasNext: Boolean = served < until
      override def next(): String = {
        if (!hasNext) throw new NoSuchElementException
        if (!it.hasNext) {
          in.close()
          throw new java.io.IOException(
            s"transis stream ended at doc $served before requested $until")
        }
        served += 1
        val d = it.next()
        if (served == until) in.close()
        d
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
  def read(from: Long, until: Long): Iterator[String] = new Iterator[String] {
    private var pos = from
    private var attempts = 0
    private var inner: Iterator[String] = Iterator.empty
    private def reconnect(): Unit = { inner = transport.read(pos, until) }
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
      Option(properties.get("maxreconnects")).map(_.toInt).getOrElse(3))
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

class TransisTable(config: TransportConfig, maxReconnects: Int)
    extends Table with SupportsRead {
  override def name(): String = s"transis(${config.path})"
  override def schema(): StructType = TransisSourceProvider.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TransisScanBuilder(config, maxReconnects)
}

/** S4 pushdown (SURVEY §4.2 row 1): `doc_type = X` → `types=X`,
  * `dt >= D` → `startDate=D`. Accepted filters are FULLY handled by the
  * transport, so they are removed from the post-scan plan (no residual
  * Filter node); everything else stays Spark-side. Column pruning drops
  * unprojected metadata columns from the rows the reader materializes. */
class TransisScanBuilder(config: TransportConfig, maxReconnects: Int)
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
    new TransisScan(config.copy(filters = docFilters), required, maxReconnects)
}

class TransisScan(config: TransportConfig, schema: StructType,
                  maxReconnects: Int) extends Scan {
  override def readSchema(): StructType = schema
  override def description(): String =
    s"transis(${config.path}) PushedDocFilters: ${config.filters}"
  override def toBatch: Batch = new TransisBatch(config, schema, maxReconnects)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new TransisMicroBatchStream(config, schema, maxReconnects)
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
      override def close(): Unit = ()
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

class TransisMicroBatchStream(config: TransportConfig, schema: StructType,
                              maxReconnects: Int)
    extends MicroBatchStream {
  private val transport = config.newTransport()
  override def initialOffset(): Offset = DocOffset(0L)
  override def latestOffset(): Offset = DocOffset(transport.available())
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
  override def stop(): Unit = ()
}
