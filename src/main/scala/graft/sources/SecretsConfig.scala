package graft.sources

import org.apache.spark.sql.SparkSession

/** Minimal Secrets Manager surface the config resolver needs — one
  * secret id in, the secret's string payload out. The live binding is
  * [[SdkSecretsClient]] (reflective SDK v2); specs inject stubs. */
trait SecretsClient {
  def getSecret(secretId: String): String
}

/** AWS-SDK-v2-shaped Secrets Manager client, bound by REFLECTION at
  * runtime — same pattern as [[graft.sink.SdkKinesisClient]]: the
  * engine builds and tests fully offline (no SDK jars in this build),
  * and a deployment gets real `GetSecretValue` calls by dropping the
  * SDK on the classpath. Call shape mirrors the reference's boto3
  * usage (`utils.py:68-112`, `get_secret`): one GetSecretValue per id,
  * string payload preferred, binary payload decoded to UTF-8 when the
  * string is absent (SDK v2's `secretBinary()` returns raw bytes —
  * boto3 returns base64, which the reference decodes by hand; the v2
  * adapter needs no manual decode, same resulting payload). SDK v2
  * names mapped 1:1:
  * {{{
  *   SecretsManagerClient.builder().region(Region.of(r)).build()
  *   GetSecretValueRequest.builder().secretId(name).build()
  *   client.getSecretValue(req).secretString() / .secretBinary()
  * }}}
  * Class names are injectable so the exact reflective path is testable
  * offline against SDK-shaped stubs. Binding errors fail loudly at
  * first use (missing SDK → ClassNotFoundException naming the class),
  * never silently return an empty secret. */
class SdkSecretsClient(
    region: Option[String] = None,
    clientClass: String =
      "software.amazon.awssdk.services.secretsmanager.SecretsManagerClient",
    modelPackage: String =
      "software.amazon.awssdk.services.secretsmanager.model",
    regionClass: String = "software.amazon.awssdk.regions.Region")
    extends SecretsClient {

  @transient private lazy val client: AnyRef = region match {
    case None =>
      Class.forName(clientClass).getMethod("create").invoke(null)
    case Some(r) =>
      // pin the region EXPLICITLY, like the reference passes
      // region_name to boto3 (utils.py:71-75) — `create()` resolves
      // from the host chain and would silently read another region's
      // secret namespace
      val regionObj = Class.forName(regionClass)
        .getMethod("of", classOf[String]).invoke(null, r)
      val builder =
        Class.forName(clientClass).getMethod("builder").invoke(null)
      call(call(builder, "region", regionObj), "build")
  }

  // the real SDK's concrete classes are package-private — same
  // accessibility handling as SdkKinesisClient.call
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
    catch { case _: Exception => () }
    resolved.invoke(target, Option(arg).toSeq: _*)
  }

  override def getSecret(secretId: String): String = {
    val rb = Class.forName(s"$modelPackage.GetSecretValueRequest")
      .getMethod("builder").invoke(null)
    val req = call(call(rb, "secretId", secretId), "build")
    val resp = call(client, "getSecretValue", req)
    call(resp, "secretString") match {
      case s: String => s
      case null => call(resp, "secretBinary") match {
        case null => throw new IllegalStateException(
          s"secret $secretId has neither SecretString nor SecretBinary")
        case bytes: AnyRef =>
          // SdkBytes.asUtf8String() — already-decoded raw bytes
          call(bytes, "asUtf8String").asInstanceOf[String]
      }
      case other => other.toString
    }
  }
}

/** S10's LIVE half: resolve the connector's credentials from AWS
  * Secrets Manager with local-file fallback — the Spark restatement of
  * the reference's `get_config()` (`utils.py:38-66`): two JSON secrets
  * (Transis service credentials, DI-framework database credentials)
  * feed the config, and ANY failure along that path falls back to a
  * local JSON config file WHOLE, logged loudly (the reference's
  * `local_config.json` escape hatch for local runs).
  *
  * The resolved values land as `spark.graft.*` session conf overrides,
  * so [[GraftConfig.fromSparkConf]] — and therefore every consumer —
  * stays a single plain-conf surface; this resolver is an optional
  * bootstrap step in front of it, exactly the "secrets outside the
  * engine" boundary SURVEY §2.1 draws, now with the live fetch
  * in-repo. Opt-in: nothing happens unless the secret ids are
  * configured.
  *
  * Conf surface:
  *  - `spark.graft.secrets.transisId` — Secrets Manager id of the
  *    Transis credentials JSON ({hostname, port, username, password});
  *  - `spark.graft.secrets.diId` — id of the DI database JSON
  *    ({host, username, password}; database name fixed to `postgres`
  *    like the reference, `utils.py:48-52`);
  *  - `spark.graft.secrets.region` — Secrets Manager region (default
  *    the reference's `ap-southeast-2`);
  *  - `spark.graft.secrets.localConfig` — fallback file (default
  *    `local_config.json`), the reference's 3-section shape;
  *
  * schema/job names and the Kinesis section stay plain conf (the
  * reference reads them from environment variables beside the secrets
  * — conf is the Spark-native equivalent; the local-config fallback
  * DOES carry them, matching the reference's file shape). */
object SecretsConfig {

  /** Where the resolved config came from: "secrets" (both fetches
    * parsed), "local" (fallback file), or "conf" (no secret ids
    * configured — nothing resolved, plain conf applies). */
  def resolve(spark: SparkSession,
              client: Option[SecretsClient] = None): String = {
    val transisId = spark.conf.getOption("spark.graft.secrets.transisId")
    val diId = spark.conf.getOption("spark.graft.secrets.diId")
    if (transisId.isEmpty && diId.isEmpty) return "conf"
    val region = spark.conf
      .getOption("spark.graft.secrets.region").orElse(Some("ap-southeast-2"))
    try {
      val c = client.getOrElse(new SdkSecretsClient(region = region))
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      def fetch(id: Option[String]) = id.map(i => mapper.readTree(
        c.getSecret(i)))
      fetch(transisId).foreach { t =>
        Seq("hostname", "port", "username", "password").foreach { k =>
          Option(t.get(k)).foreach(v =>
            spark.conf.set(s"spark.graft.transis.$k", v.asText()))
        }
      }
      fetch(diId).foreach { d =>
        Option(d.get("host")).foreach(h => spark.conf.set(
          "spark.graft.di.jdbcUrl",
          s"jdbc:postgresql://${h.asText()}/postgres"))
        Option(d.get("username")).foreach(u =>
          spark.conf.set("spark.graft.di.user", u.asText()))
        Option(d.get("password")).foreach(p =>
          spark.conf.set("spark.graft.di.password", p.asText()))
      }
      "secrets"
    } catch {
      case e: Exception =>
        // the reference logs and falls back WHOLE (utils.py:61-65) —
        // same here, loudly, never a silent half-resolved config
        org.apache.log4j.Logger.getLogger(getClass).error(
          "secret resolution failed - falling back to " +
            "the local config file: " + e)
        val file = spark.conf
          .getOption("spark.graft.secrets.localConfig")
          .getOrElse("local_config.json")
        applyLocalConfig(spark, file)
        "local"
    }
  }

  /** Load the reference-shaped 3-section local config JSON and land
    * every section as `spark.graft.*` overrides. Fails loudly when the
    * file is absent/unparseable — at this point BOTH config paths are
    * gone, the reference's get_config would throw too. */
  private[sources] def applyLocalConfig(spark: SparkSession,
                                        file: String): Unit = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(file)), java.nio.charset.StandardCharsets.UTF_8)
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(text)
    def at(sect: String, k: String): Option[String] =
      Option(root.get(sect)).flatMap(s => Option(s.get(k))).map(_.asText())
    def nested(sect: String, sub: String, k: String): Option[String] =
      Option(root.get(sect)).flatMap(s => Option(s.get(sub)))
        .flatMap(s => Option(s.get(k))).map(_.asText())
    Seq("hostname", "port", "username", "password").foreach { k =>
      at("transis_config_prod", k).foreach(v =>
        spark.conf.set(s"spark.graft.transis.$k", v))
    }
    for {
      host <- nested("di_framework_config", "connection_details", "host")
      db <- nested("di_framework_config", "connection_details", "database")
        .orElse(Some("postgres"))
    } spark.conf.set("spark.graft.di.jdbcUrl",
      s"jdbc:postgresql://$host/$db")
    nested("di_framework_config", "connection_details", "user")
      .foreach(spark.conf.set("spark.graft.di.user", _))
    nested("di_framework_config", "connection_details", "password")
      .foreach(spark.conf.set("spark.graft.di.password", _))
    at("di_framework_config", "schema_name")
      .foreach(spark.conf.set("spark.graft.di.schemaName", _))
    at("di_framework_config", "job_name")
      .foreach(spark.conf.set("spark.graft.di.jobName", _))
    at("kinesis_config", "region_name")
      .foreach(spark.conf.set("spark.graft.kinesis.regionName", _))
    at("kinesis_config", "stream_name")
      .foreach(spark.conf.set("spark.graft.kinesis.streamName", _))
  }
}
