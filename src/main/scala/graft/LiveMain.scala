package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery
import graft.sink.{DiFramework, JdbcProcCaller, KinesisClient, KinesisSink,
  ProcCaller, SdkKinesisClient}
import graft.sources.GraftConfig
import graft.stream.Pipeline

/** The deployable LIVE entry point — the Spark restatement of the
  * reference's `main.py:21-37`: read the 3-section config, build the
  * Transis consumer, the Kinesis producer, and the DI-framework
  * client, wire them into the connector, run until terminated, and on
  * a fatal error mark the job failed and release the DB connection
  * (`main.py:31-36` closes the connection; the Spark shape also lands
  * the D4 error terminal state, which the reference's main never did).
  *
  * Config is the plain `spark.graft.*` conf surface ([[GraftConfig]]);
  * the two external adapters default to the REAL deployment bindings —
  * the reflective AWS-SDK-v2 Kinesis client and the bind-parameter
  * JDBC ProcCaller — and are injectable, so the rehearsal spec drives
  * the IDENTICAL wiring end-to-end against the in-repo transport/SDK
  * stubs ('LiveMainSpec'). */
object LiveMain {

  /** Everything [[wire]] built — main's fatal handler and the
    * rehearsal spec need the query plus the resources to release. */
  final case class Wired(query: StreamingQuery, di: DiFramework,
                         caller: ProcCaller)

  /** Build and START the connector: Transis push-stream source →
    * framed/parsed/filtered detector-count records → job-bracketed
    * fixed-batch Kinesis push ([[Pipeline.run]] wires D1–D4 around
    * K1–K6 per micro-batch). `spark.graft.transis.path` overrides the
    * URL derived from hostname/port — a file path runs the same wiring
    * over the file transport (local rehearsal, exactly how the specs
    * drive it). */
  def wire(spark: SparkSession,
           clientFactory: Option[() => KinesisClient] = None,
           procCaller: Option[ProcCaller] = None,
           secretsClient: Option[graft.sources.SecretsClient] = None)
      : Wired = {
    // S10 live half: when secret ids are configured, resolve the
    // Transis/DI credentials from AWS Secrets Manager (reflective SDK
    // v2 adapter) with the reference's whole-file local fallback —
    // landing as spark.graft.* overrides so fromSparkConf below stays
    // the single config surface (utils.py:38-66 restated)
    graft.sources.SecretsConfig.resolve(spark, secretsClient): Unit
    val cfg = GraftConfig.fromSparkConf(spark)
    val path = spark.conf.getOption("spark.graft.transis.path")
      .getOrElse(s"http://${cfg.transis.hostname}:${cfg.transis.port}/")
    val raw = spark.readStream.format("transis")
      .option("path", path)
      .option("username", cfg.transis.username)
      .option("password", cfg.transis.password)
      .option("stalltimeoutms",
        (cfg.transis.streamTimeoutSecs * 1000L).toString)
      .option("maxreconnects", cfg.transis.maxReconnects.toString)
      .load()
    val records = Pipeline.payloadToRecords(raw)
    val region = Option(cfg.kinesis.regionName).filter(_.nonEmpty)
    val factory = clientFactory.getOrElse(
      () => new SdkKinesisClient(region = region))
    val sink = new KinesisSink(factory, cfg.kinesis.streamName,
      cfg.kinesis.batchSize)
    val caller = procCaller.getOrElse {
      val props = new java.util.Properties()
      props.setProperty("user", cfg.di.user)
      props.setProperty("password", cfg.di.password)
      new JdbcProcCaller(cfg.di.jdbcUrl, props)
    }
    val di = new DiFramework(caller, cfg.di.schemaName, cfg.di.jobName)
    // fail fast rather than default to a temp dir: a fresh checkpoint
    // per launch silently discards stream progress on restart AND
    // resets the batch-id/publish namespace (Pipeline.streamTagOf keys
    // off this path), replaying already-delivered pushes
    val checkpoint = spark.conf.getOption("spark.graft.checkpointDir")
      .getOrElse(throw new IllegalArgumentException(
        "spark.graft.checkpointDir must be set: the streaming " +
          "checkpoint is the source's exactly-once progress state"))
    val shards = spark.conf.getOption("spark.graft.kinesis.shards")
      .map(_.toInt).getOrElse(1)
    Wired(Pipeline.run(records, sink, di, checkpoint, shards), di, caller)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-transis-kinesis")
      .withExtensions(new GraftExtensions).getOrCreate()
    val wired = wire(spark)
    try wired.query.awaitTermination()
    catch {
      case e: Exception =>
        // the reference's fatal path (main.py:31-36): log and close the
        // DB connection; additionally land the D4 error terminal state
        // so the audit trail records WHY the job vanished
        try wired.di.errorJob(s"fatal: ${e.getMessage}")
        catch { case _: Exception => () }
        try wired.caller.close() catch { case _: Exception => () }
        throw e
    }
  }
}
