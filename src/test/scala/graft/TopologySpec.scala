package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.ReferenceFixtures._
import graft.model.Schemas
import graft.ops.Topology
import graft.parse.TransisXml

/** X1–X6 unnests + drop-empties semantics (SURVEY §2.5; reference
  * `transis_response_models.py:175-209`). */
class TopologySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val sites = Topology.sites(TransisXml.parse(
    Seq(topologyDoc).toDF("fragment"), Schemas.topologyResponse))

  test("X1: one row per site") {
    assert(sites.count() === 4) // 100, 200, 2087, 8
  }

  test("X2: arms unnest prepends sId; empty Arms collection drops site 200") {
    val rows = Topology.arms(sites).orderBy("aId")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq === Seq(("100", "1", "North"), ("100", "2", "South")))
  }

  test("X3-X5: detectors / streets / sgs unnests") {
    assert(Topology.detectors(sites).count() === 1)
    assert(Topology.streets(sites).collect().map(_.getString(2)).toSeq
      === Seq("Main St"))
    assert(Topology.sgs(sites).count() === 2)
  }

  test("X6: phases double-unnest yields (sId, phase, sgNo) rows") {
    val rows = Topology.phases(sites).orderBy("name", "sgNo")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq ===
      Seq(("100", "A", "1"), ("100", "A", "2"), ("100", "B", "3")))
  }

  test("K5: CSV sink quotes every field (transis_response_models.py:113-117)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    Topology.writeCsv(Topology.arms(sites), dir)
    val csv = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .toArray.map(_.toString).filter(_.endsWith(".csv")).head
    val lines = scala.io.Source.fromFile(csv).getLines().toSeq
    assert(lines.head === "\"sId\",\"aId\",\"name\"")
    assert(lines.contains("\"100\",\"1\",\"North\""))
  }
}
