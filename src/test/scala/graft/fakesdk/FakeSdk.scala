package graft.fakesdk

/** Offline stand-ins with the EXACT method shapes `SdkKinesisClient`
  * reflects over (builder chains, `create()` statics, response
  * accessors) — the spec points the adapter's class-name knobs here and
  * drives the same reflective path a deployment runs against the real
  * SDK. Records whose partition key starts with `fail-` come back with
  * the throttle error code, so the K3 retry-subset contract is
  * exercisable end-to-end. */
object FakeSdkState {
  val requests =
    new java.util.concurrent.ConcurrentLinkedQueue[PutRecordsRequest]()
  /** Regions pinned through the builder path (create() records none —
    * it resolves from the provider chain, which is the bug the builder
    * path exists to avoid). */
  val regions = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  def reset(): Unit = { requests.clear(); regions.clear() }
}

/** `software.amazon.awssdk.regions.Region` shape. */
class Region private (val id: String)
object Region {
  def of(id: String): Region = new Region(id)
}

class SdkBytes private (val bytes: Array[Byte]) {
  def asUtf8String(): String = new String(bytes, "UTF-8")
}
object SdkBytes {
  def fromByteArray(b: Array[Byte]): SdkBytes = new SdkBytes(b)
}

class PutRecordsRequestEntry private[fakesdk] (val data: SdkBytes,
                                               val partitionKey: String)
object PutRecordsRequestEntry {
  def builder(): Builder = new Builder(null, null)
  class Builder private[fakesdk] (d: SdkBytes, pk: String) {
    def data(b: SdkBytes): Builder = new Builder(b, pk)
    def partitionKey(k: String): Builder = new Builder(d, k)
    def build(): PutRecordsRequestEntry = new PutRecordsRequestEntry(d, pk)
  }
}

class PutRecordsRequest private[fakesdk] (
    val streamName: String, val entries: java.util.List[PutRecordsRequestEntry])
object PutRecordsRequest {
  def builder(): Builder = new Builder(null, null)
  class Builder private[fakesdk] (
      name: String, es: java.util.List[PutRecordsRequestEntry]) {
    def streamName(s: String): Builder = new Builder(s, es)
    def records(c: java.util.Collection[_]): Builder = {
      val l = new java.util.ArrayList[PutRecordsRequestEntry]()
      c.forEach(e => l.add(e.asInstanceOf[PutRecordsRequestEntry]): Unit)
      new Builder(name, l)
    }
    def build(): PutRecordsRequest = new PutRecordsRequest(name, es)
  }
}

class PutRecordsResultEntry private[fakesdk] (code: String) {
  def errorCode(): String = code
}

class PutRecordsResponse private[fakesdk] (
    failed: Int, outcomes: java.util.List[PutRecordsResultEntry]) {
  def failedRecordCount(): java.lang.Integer = Integer.valueOf(failed)
  def records(): java.util.List[PutRecordsResultEntry] = outcomes
}

class KinesisClient {
  def putRecords(req: PutRecordsRequest): PutRecordsResponse = {
    FakeSdkState.requests.add(req): Unit
    val outcomes = new java.util.ArrayList[PutRecordsResultEntry]()
    var failed = 0
    req.entries.forEach { e =>
      if (e.partitionKey.startsWith("fail-")) {
        failed += 1
        outcomes.add(new PutRecordsResultEntry(
          "ProvisionedThroughputExceededException")): Unit
      } else outcomes.add(new PutRecordsResultEntry(null)): Unit
    }
    new PutRecordsResponse(failed, outcomes)
  }
}
object KinesisClient {
  def create(): KinesisClient = new KinesisClient
  def builder(): Builder = new Builder
  class Builder private[fakesdk] () {
    private var r: Region = null
    def region(x: Region): Builder = { r = x; this }
    def build(): KinesisClient = {
      if (r != null) FakeSdkState.regions.add(r.id): Unit
      new KinesisClient
    }
  }
}

/** Secrets Manager shapes `SdkSecretsClient` reflects over. Secrets
  * served from [[FakeSecretsState.secrets]]; an id absent there throws
  * (the ResourceNotFound path the real SDK would take). Ids in
  * [[FakeSecretsState.binaryIds]] answer through secretBinary()
  * instead of secretString() — the SecretBinary branch. */
object FakeSecretsState {
  val secrets =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  val binaryIds =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  val regions = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  def reset(): Unit = { secrets.clear(); binaryIds.clear(); regions.clear() }
}

class GetSecretValueRequest private[fakesdk] (val secretId: String)
object GetSecretValueRequest {
  def builder(): Builder = new Builder(null)
  class Builder private[fakesdk] (id: String) {
    def secretId(s: String): Builder = new Builder(s)
    def build(): GetSecretValueRequest = new GetSecretValueRequest(id)
  }
}

class GetSecretValueResponse private[fakesdk] (s: String, b: SdkBytes) {
  def secretString(): String = s
  def secretBinary(): SdkBytes = b
}

class SecretsManagerClient {
  def getSecretValue(req: GetSecretValueRequest): GetSecretValueResponse = {
    val v = FakeSecretsState.secrets.get(req.secretId)
    if (v == null) throw new RuntimeException(
      s"ResourceNotFoundException: ${req.secretId}")
    if (FakeSecretsState.binaryIds.contains(req.secretId))
      new GetSecretValueResponse(null,
        SdkBytes.fromByteArray(v.getBytes("UTF-8")))
    else new GetSecretValueResponse(v, null)
  }
}
object SecretsManagerClient {
  def create(): SecretsManagerClient = new SecretsManagerClient
  def builder(): Builder = new Builder
  class Builder private[fakesdk] () {
    private var r: Region = null
    def region(x: Region): Builder = { r = x; this }
    def build(): SecretsManagerClient = {
      if (r != null) FakeSecretsState.regions.add(r.id): Unit
      new SecretsManagerClient
    }
  }
}
