package graft.model

import org.apache.spark.sql.types._

/** Explicit StructTypes for the Transis XML documents (SURVEY.md §1.2).
  *
  * Attribute fields carry the Spark XML attribute prefix `_`. Namespace
  * prefixes (`ns2:`) are stripped textually before parsing
  * (TransisXml.stripNamespaces) — a documented deviation from the reference,
  * which keeps prefixes in its ElementTree tags (reference
  * `transis_response_models.py:288-292`).
  *
  * Design note: schemas are explicit rather than inferred so that the parquet
  * scan/from_xml path stays deterministic across batches; the reference's
  * first-record CSV-header inference (`transis_response_models.py:200-209`)
  * is deliberately replaced by full-schema declarations (SURVEY §7.5).
  */
object Schemas {

  /** `Detector[@Did,@count]` — reference `transis_response_models.py:39-43`. */
  val detector: StructType = StructType(Seq(
    StructField("_Did", StringType),
    StructField("_count", StringType)))

  /** `DetectorCountMessage[@Sid,@date,@reg]/Detectors/Detector*` —
    * reference `transis_response_models.py:15-50`. */
  val detectorCountMessage: StructType = StructType(Seq(
    StructField("_Sid", StringType),
    StructField("_date", StringType),
    StructField("_reg", StringType),
    StructField("Detectors", StructType(Seq(
      StructField("Detector", ArrayType(detector)))))))

  /** Root `TransisResponse` for detector-count documents — reference
    * `transis_response_models.py:281-317`. `_error` + `Errors/Error[@msg]`
    * model the error-document branch (P4). */
  val transisResponse: StructType = StructType(Seq(
    StructField("_error", StringType),
    StructField("DetectorCountMessages", StructType(Seq(
      StructField("DetectorCountMessage", ArrayType(detectorCountMessage))))),
    StructField("Errors", StructType(Seq(
      StructField("Error", ArrayType(StructType(Seq(
        StructField("_msg", StringType))))))))))

  /** Canonical output record of the system (`to_dict`, reference
    * `transis_response_models.py:27-44`): see SURVEY §1.2 field table. */
  val outputRecord: StructType = StructType(Seq(
    StructField("collectionIntervalSecs", IntegerType, nullable = false),
    StructField("region", StringType),
    StructField("siteId", StringType),
    StructField("collectionendtimestamp_plus_3_mins", LongType),
    StructField("detectorCounts", MapType(StringType, StringType))))

  /** Topology: `SiteLayouts/SiteLayout` with nested child collections —
    * reference `transis_response_models.py:129-209,213-268`. The attribute
    * sets here cover the test fixtures; production documents with extra
    * attributes parse via the same shapes extended per deployment (the
    * reference infers them from the first record — SURVEY §1.2). */
  val arm: StructType = StructType(Seq(
    StructField("_aId", StringType), StructField("_name", StringType)))
  val street: StructType = StructType(Seq(
    StructField("_stId", StringType), StructField("_name", StringType)))
  val sg: StructType = StructType(Seq(
    StructField("_sgId", StringType), StructField("_type", StringType)))
  /** `Phases/Phase[@name]/SGNos/SGNo(text)*` — the double-unnest source
    * (reference `transis_response_models.py:194-197`). */
  val phase: StructType = StructType(Seq(
    StructField("_name", StringType),
    StructField("SGNos", StructType(Seq(
      StructField("SGNo", ArrayType(StringType)))))))

  val siteLayout: StructType = StructType(Seq(
    StructField("_sId", StringType),
    StructField("_region", StringType),
    StructField("Arms", StructType(Seq(
      StructField("Arm", ArrayType(arm))))),
    StructField("Detectors", StructType(Seq(
      StructField("Detector", ArrayType(detector))))),
    StructField("Streets", StructType(Seq(
      StructField("Street", ArrayType(street))))),
    StructField("SGs", StructType(Seq(
      StructField("SG", ArrayType(sg))))),
    StructField("Phases", StructType(Seq(
      StructField("Phase", ArrayType(phase)))))))

  /** Root `TransisResponse` for topology documents — reference
    * `transis_response_models.py:303-310`. */
  val topologyResponse: StructType = StructType(Seq(
    StructField("_error", StringType),
    StructField("SiteLayouts", StructType(Seq(
      StructField("SiteLayout", ArrayType(siteLayout)))))))

  /** S5 typed `getFromDate` message — StrategicMonitor / Motorway /
    * SiteAlarm share one attribute shape; the element name is the type
    * selector (reference `transis_consumer.py:175-201`; the reference
    * models these as generic attribute bags, so this attribute set is
    * the engine's canonical form). */
  val monitorMessage: StructType = StructType(Seq(
    StructField("_id", StringType),
    StructField("_date", StringType),
    StructField("_reg", StringType),
    StructField("_value", StringType)))

  /** Root response for a typed message collection, e.g.
    * `monitorResponse("Motorway")` → `Motorways/Motorway`. */
  def monitorResponse(elem: String): StructType = StructType(Seq(
    StructField("_error", StringType),
    StructField(elem + "s", StructType(Seq(
      StructField(elem, ArrayType(monitorMessage)))))))

  /** S6 TIRF incident — open records carry no closedDate (reference
    * `transis_consumer.py:203-216`). */
  val tirf: StructType = StructType(Seq(
    StructField("_tirfId", StringType),
    StructField("_status", StringType),
    StructField("_siteId", StringType),
    StructField("_openedDate", StringType),
    StructField("_closedDate", StringType)))

  val tirfResponse: StructType = StructType(Seq(
    StructField("_error", StringType),
    StructField("TIRFs", StructType(Seq(
      StructField("TIRF", ArrayType(tirf)))))))

  /** S7 VMS record (reference `transis_consumer.py:218-225`). */
  val vms: StructType = StructType(Seq(
    StructField("_vmsId", StringType),
    StructField("_location", StringType),
    StructField("_message", StringType),
    StructField("_updatedDate", StringType)))

  val vmsResponse: StructType = StructType(Seq(
    StructField("_error", StringType),
    StructField("VMSs", StructType(Seq(
      StructField("VMS", ArrayType(vms)))))))

  /** S8 topology-change delta (reference `transis_consumer.py:157-164`),
    * the append-only CDC row. */
  val topologyChange: StructType = StructType(Seq(
    StructField("_sId", StringType),
    StructField("_op", StringType),
    StructField("_date", StringType)))

  val topologyChangesResponse: StructType = StructType(Seq(
    StructField("_error", StringType),
    StructField("TopologyChanges", StructType(Seq(
      StructField("TopologyChange", ArrayType(topologyChange)))))))
}
