package graft.sink

/** AWS-SDK-v2-shaped [[KinesisClient]], bound by REFLECTION at runtime:
  * the engine builds and tests fully offline (no SDK jars in this
  * build), and a deployment gets real `putRecords` calls by dropping
  * the SDK on the classpath — no recompile, no code change, the same
  * [[KinesisSink]] retry/batching semantics (K1–K4) on top.
  *
  * The call shape mirrors the reference's boto3 usage
  * (`kinesis_producer.py:58-85`): one `PutRecords` per chunk,
  * `FailedRecordCount` + per-record `ErrorCode` surfaced for the
  * throttle-subset retry. SDK v2 names mapped 1:1:
  * {{{
  *   KinesisClient.create()
  *   PutRecordsRequestEntry.builder().data(SdkBytes).partitionKey(k).build()
  *   PutRecordsRequest.builder().streamName(s).records(entries).build()
  *   client.putRecords(req).failedRecordCount() / .records()[i].errorCode()
  * }}}
  *
  * Class names are injectable so the wire-up is testable offline: the
  * spec points them at stub classes with the same method shapes and
  * drives the exact reflective path a deployment runs. Binding errors
  * fail loudly at first use (missing SDK → ClassNotFoundException with
  * the class name), never silently drop records.
  */
class SdkKinesisClient(
    kinesisClientClass: String =
      "software.amazon.awssdk.services.kinesis.KinesisClient",
    modelPackage: String =
      "software.amazon.awssdk.services.kinesis.model",
    sdkBytesClass: String = "software.amazon.awssdk.core.SdkBytes",
    region: Option[String] = None,
    regionClass: String = "software.amazon.awssdk.regions.Region")
    extends KinesisClient {

  // one client per JVM-side instance, built on first put (serializable
  // shell — executors re-bind lazily after deserialization). With a
  // `region`, the builder path pins it EXPLICITLY — `create()` resolves
  // from the host's default provider chain, which silently ignores the
  // configured region (the reference passes region_name to boto3,
  // `main.py:26`; a host defaulted to another region would put to the
  // wrong stream with no warning).
  @transient private lazy val client: AnyRef = region match {
    case None =>
      Class.forName(kinesisClientClass).getMethod("create").invoke(null)
    case Some(r) =>
      val regionObj = Class.forName(regionClass)
        .getMethod("of", classOf[String]).invoke(null, r)
      val builder =
        Class.forName(kinesisClientClass).getMethod("builder").invoke(null)
      call(call(builder, "region", regionObj), "build")
  }

  /** Invoke the single `name` method of `target` accepting `arg`
    * (builder setters and the final call all have arity 1 or 0).
    *
    * The real SDK's concrete classes (DefaultKinesisClient, the model
    * `BuilderImpl`s) are PACKAGE-PRIVATE — a public Method resolved on
    * a non-public declaring class throws IllegalAccessException on
    * invoke. setAccessible(true) clears that check (classpath code in
    * the unnamed module; no module barrier applies). */
  private def call(target: AnyRef, name: String,
                   arg: AnyRef = null): AnyRef = {
    val ms = target.getClass.getMethods.filter(_.getName == name)
    val m =
      if (arg == null) ms.find(_.getParameterCount == 0)
      else ms.find(m => m.getParameterCount == 1 &&
        m.getParameterTypes()(0).isAssignableFrom(arg.getClass))
    val resolved = m.getOrElse(throw new NoSuchMethodException(
      s"${target.getClass.getName}.$name(" +
        s"${Option(arg).map(_.getClass.getName).getOrElse("")})"))
    try resolved.setAccessible(true)
    catch { case _: Exception => () } // fall through: invoke may still work
    resolved.invoke(target, Option(arg).toSeq: _*)
  }

  override def putRecords(records: Seq[KinesisRecord],
                          streamName: String): PutRecordsResult = {
    val sdkBytes = Class.forName(sdkBytesClass)
      .getMethod("fromByteArray", classOf[Array[Byte]])
    val entryBuilder = Class.forName(s"$modelPackage.PutRecordsRequestEntry")
      .getMethod("builder")
    val entries = new java.util.ArrayList[AnyRef](records.size)
    records.foreach { r =>
      var b = entryBuilder.invoke(null)
      b = call(b, "data", sdkBytes.invoke(null, r.data))
      b = call(b, "partitionKey", r.partitionKey)
      entries.add(call(b, "build")): Unit
    }
    var rb = Class.forName(s"$modelPackage.PutRecordsRequest")
      .getMethod("builder").invoke(null)
    rb = call(rb, "streamName", streamName)
    rb = call(rb, "records", entries)
    val resp = call(client, "putRecords", call(rb, "build"))
    val failed = call(resp, "failedRecordCount") match {
      case null => 0
      case n: java.lang.Integer => n.intValue()
      case other => other.toString.toInt
    }
    val outcomes = call(resp, "records") match {
      case l: java.util.List[_] =>
        l.toArray.map { e =>
          PutOutcome(Option(call(e.asInstanceOf[AnyRef], "errorCode"))
            .map(_.toString))
        }.toSeq
      case _ => Seq.fill(records.size)(PutOutcome(None))
    }
    PutRecordsResult(failed, outcomes)
  }
}
