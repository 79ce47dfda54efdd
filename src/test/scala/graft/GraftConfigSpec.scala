package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.GraftConfig

class GraftConfigSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("S10: conf keys override reference-derived defaults") {
    val s = spark.newSession()
    val defaults = GraftConfig.fromSparkConf(s)
    assert(defaults.transis.streamTimeoutSecs === 1200) // 20-min stall
    assert(defaults.transis.maxReconnects === 3)
    assert(defaults.kinesis.batchSize === 10)
    s.conf.set("spark.graft.kinesis.streamName", "test-stream")
    s.conf.set("spark.graft.transis.port", "9443")
    val cfg = GraftConfig.fromSparkConf(s)
    assert(cfg.kinesis.streamName === "test-stream")
    assert(cfg.transis.port === 9443)
  }
}
