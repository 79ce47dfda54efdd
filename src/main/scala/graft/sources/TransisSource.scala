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
  * abstracted behind [[PayloadTransport]]: the production implementation is
  * the same HTTP GET (not constructible in this offline container); the
  * bundled [[FilePayloadTransport]] serves file-backed streams for tests and
  * local runs.
  *
  * Offsets are document indices, so Structured Streaming checkpointing gives
  * exactly-once source tracking — strictly stronger than the reference's
  * resume-at-now behavior (SURVEY §2.9, allowed upgrade).
  *
  * Usage: `spark.readStream.format("transis").option("path", f).load()`
  * → single `value: STRING` column, one row per framed document.
  */
trait PayloadTransport extends Serializable {
  /** Number of documents currently available. */
  def available(): Long
  /** Read documents [from, until). May throw transient IO errors. */
  def read(from: Long, until: Long): Iterator[String]
}

/** NUL-framed documents in a single growable file (empty fragments are
  * dropped — F1, reference `transis_consumer.py:89`). */
class FilePayloadTransport(path: String) extends PayloadTransport {
  private def docs(): Array[String] = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      .split("\u0000").iterator.filter(_.trim.nonEmpty).toArray
  }
  override def available(): Long = docs().length.toLong
  override def read(from: Long, until: Long): Iterator[String] =
    docs().iterator.slice(from.toInt, until.toInt)
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
    new TransisTable(properties.get("path"),
      Option(properties.get("maxreconnects")).map(_.toInt).getOrElse(3))
}

object TransisSourceProvider {
  val schema: StructType = StructType(Seq(StructField("value", StringType)))
}

class TransisTable(path: String, maxReconnects: Int)
    extends Table with SupportsRead {
  override def name(): String = s"transis($path)"
  override def schema(): StructType = TransisSourceProvider.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = TransisSourceProvider.schema
      override def toBatch: Batch = new TransisBatch(path, maxReconnects)
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new TransisMicroBatchStream(path, maxReconnects)
    }
}

case class TransisInputPartition(path: String, from: Long, until: Long)
  extends InputPartition

class TransisPartitionReaderFactory(maxReconnects: Int)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[TransisInputPartition]
    val docs = new ReconnectingReader(
      new FilePayloadTransport(part.path), maxReconnects)
      .read(part.from, part.until)
    new PartitionReader[InternalRow] {
      private var current: String = _
      override def next(): Boolean =
        if (docs.hasNext) { current = docs.next(); true } else false
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(current))
      override def close(): Unit = ()
    }
  }
}

/** One-shot batch read (S3-flavored: whole current payload). */
class TransisBatch(path: String, maxReconnects: Int) extends Batch {
  override def planInputPartitions(): Array[InputPartition] = {
    val n = new FilePayloadTransport(path).available()
    Array(TransisInputPartition(path, 0L, n))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new TransisPartitionReaderFactory(maxReconnects)
}

class TransisMicroBatchStream(path: String, maxReconnects: Int)
    extends MicroBatchStream {
  private val transport = new FilePayloadTransport(path)
  override def initialOffset(): Offset = DocOffset(0L)
  override def latestOffset(): Offset = DocOffset(transport.available())
  override def deserializeOffset(json: String): Offset =
    DocOffset(json.trim.toLong)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[DocOffset].n
    val e = end.asInstanceOf[DocOffset].n
    if (e <= s) Array.empty
    else Array(TransisInputPartition(path, s, e))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new TransisPartitionReaderFactory(maxReconnects)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
