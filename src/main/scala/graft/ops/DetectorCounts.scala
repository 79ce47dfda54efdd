package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** T1–T4 projection of parsed detector-count documents into the canonical
  * output record (SURVEY.md §1.2 / §2.3; reference `to_dict`,
  * `transis_response_models.py:27-44`).
  *
  * All transforms are builtin codegen'd expressions (SURVEY §2.11: zero
  * custom Catalyst nodes needed for fidelity); the pipeline is stateless and
  * runs unchanged under batch and Structured Streaming.
  */
object DetectorCounts {

  /** ISO-8601-with-offset → epoch seconds (T2; reference `utils.py:21-31`). */
  val isoOffsetFormat = "yyyy-MM-dd'T'HH:mm:ssXXX"

  /** One output record per `DetectorCountMessage` (T1).
    *
    * Input: `parse`d docs already gated by
    * `TransisXml.detectorCountDocs` (error docs + message-less docs removed).
    *
    *  - attrs `reg→region`, `Sid→siteId` (string casts, T1)
    *  - `date` → epoch seconds long (T2)
    *  - literal `collectionIntervalSecs = 300` (T1; reference
    *    `transis_response_models.py:35`)
    *  - `detectorCounts` map keeps ONLY detectors carrying both `Did` and
    *    `count` attrs (T4 guard, reference `transis_response_models.py:41`),
    *    values left as strings for byte fidelity (SURVEY §1.2).
    */
  def toRecords(docs: DataFrame): DataFrame =
    docs
      .select(explode(col("doc.DetectorCountMessages.DetectorCountMessage"))
        .as("m"))
      .select(
        lit(300).as("collectionIntervalSecs"),
        col("m._reg").as("region"),
        col("m._Sid").as("siteId"),
        unix_timestamp(to_timestamp(col("m._date"), isoOffsetFormat))
          .as("collectionendtimestamp_plus_3_mins"),
        map_from_entries(
          transform(
            filter(coalesce(col("m.Detectors.Detector"),
                array().cast("array<struct<_Did:string,_count:string>>")),
              d => d.getField("_Did").isNotNull &&
                d.getField("_count").isNotNull),
            d => struct(d.getField("_Did").as("key"),
              d.getField("_count").as("value"))))
          .as("detectorCounts"))

  /** F3: `is_empty()` predicate — message with zero (valid) detectors
    * (reference `transis_response_models.py:46-50`; defined but never called
    * in the reference pipeline, ported as an available predicate). */
  def nonEmptyRecords(records: DataFrame): DataFrame =
    records.filter(size(col("detectorCounts")) > 0)

  /** Flat per-detector view: one row per (site, detector) — the shape used
    * by the analytics layer and the DuckDB oracle (maps exploded to rows,
    * SURVEY §7.5). */
  def explodedCounts(records: DataFrame): DataFrame =
    records.select(
      col("collectionIntervalSecs"), col("region"), col("siteId"),
      col("collectionendtimestamp_plus_3_mins"),
      explode(col("detectorCounts")).as(Seq("did", "cnt")))

  /** Per-site vehicle totals per period — the natural aggregate over the
    * output records (SURVEY §2.6 note: per-site/region per-window sums). */
  def siteTotals(records: DataFrame): DataFrame =
    explodedCounts(records)
      .groupBy(col("siteId"), col("collectionendtimestamp_plus_3_mins"))
      .agg(sum(col("cnt").cast("int")).as("total_count"))

  /** The implied-but-never-executed enrichment join of SURVEY §2.7:
    * counts ⋈ topology on siteId = sId, LEFT, with the topology dimension
    * broadcast (it is tiny relative to the count stream at any scale). */
  def enrichWithTopology(totals: DataFrame, sites: DataFrame): DataFrame =
    totals.join(
      broadcast(sites.select(col("site._sId").as("sId"),
        col("site._region").as("topo_region"))),
      totals("siteId") === col("sId"), "left")
      .drop("sId")

  /** T3: ingestion-time stamp, ISO-formatted in Australia/Sydney with a
    * colon offset (reference `utils.py:15-19`). Session tz is UTC
    * (build.sbt), so the conversion is explicit. */
  def withReceivedTimestamp(df: DataFrame): DataFrame = {
    // date_format renders offsets in the session tz (UTC), so the Sydney
    // offset (+10:00 / +11:00 across DST) is computed explicitly.
    val local = convert_timezone(lit("UTC"), lit("Australia/Sydney"),
      current_timestamp())
    val offMin = (unix_timestamp(local) - unix_timestamp(current_timestamp())) / 60
    df.withColumn("response_received_timestamp",
      concat(
        date_format(local, "yyyy-MM-dd'T'HH:mm:ss"),
        format_string("+%02d:%02d", (offMin / 60).cast("int"),
          (offMin % 60).cast("int"))))
  }
}
