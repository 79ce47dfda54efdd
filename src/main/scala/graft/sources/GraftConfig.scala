package graft.sources

import org.apache.spark.sql.SparkSession

/** S10 (SURVEY.md §2.1): the reference's 3-section JSON config — Transis
  * connection, DI-framework Postgres, Kinesis stream (reference
  * `local_config.json:1-22`, `utils.py:38-66`) — surfaced the Spark way:
  * plain `spark.graft.*` conf keys (settable via `--conf`, spark-defaults,
  * or programmatically). Secrets-manager indirection stays outside the
  * engine exactly as SURVEY prescribes: whatever injects the conf values
  * owns secret resolution.
  */
case class TransisConfig(hostname: String, port: Int, username: String,
                         password: String, streamTimeoutSecs: Int,
                         maxReconnects: Int)
case class DiFrameworkConfig(jdbcUrl: String, user: String, password: String,
                             schemaName: String, jobName: String)
case class KinesisConfig(regionName: String, streamName: String,
                         batchSize: Int)

case class GraftConfig(transis: TransisConfig, di: DiFrameworkConfig,
                       kinesis: KinesisConfig)

object GraftConfig {
  private def get(s: SparkSession, key: String, default: String): String =
    s.conf.getOption(s"spark.graft.$key").getOrElse(default)

  def fromSparkConf(s: SparkSession): GraftConfig = GraftConfig(
    TransisConfig(
      hostname = get(s, "transis.hostname", "localhost"),
      port = get(s, "transis.port", "8080").toInt,
      username = get(s, "transis.username", ""),
      password = get(s, "transis.password", ""),
      // reference defaults: 20-min stall timeout, 3 reconnects
      // (transis_consumer.py:13)
      streamTimeoutSecs = get(s, "transis.streamTimeoutSecs", "1200").toInt,
      maxReconnects = get(s, "transis.maxReconnects", "3").toInt),
    DiFrameworkConfig(
      jdbcUrl = get(s, "di.jdbcUrl", ""),
      user = get(s, "di.user", ""),
      password = get(s, "di.password", ""),
      schemaName = get(s, "di.schemaName", "di"),
      jobName = get(s, "di.jobName", "transis_kinesis")),
    KinesisConfig(
      regionName = get(s, "kinesis.regionName", "ap-southeast-2"),
      streamName = get(s, "kinesis.streamName", "detector-counts"),
      // reference: 10 records/put, half the 1000 rec/s/shard limit
      // (kinesis_producer.py:28-30)
      batchSize = get(s, "kinesis.batchSize", "10").toInt))
}
