package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X1–X6: topology denormalization — the reference's only relational "query
  * engine" (`SiteLayouts.get_csv_string`, reference
  * `transis_response_models.py:175-209`): per-site unnest of each child
  * collection with the parent key `sId` prepended (a correlated unnest).
  *
  * Drop-empties semantics: the reference's ElementTree truthiness quirk
  * (empty collections are falsy → skipped; SURVEY.md §2.5 note) maps exactly
  * to `explode` (not `explode_outer`), which produces no rows for null/empty
  * arrays.
  */
object Topology {

  /** Parsed topology docs → one row per site with nested collections
    * (X1 `sites` flatten). */
  def sites(parsed: DataFrame): DataFrame =
    parsed
      .filter(size(col("doc.SiteLayouts.SiteLayout")) > 0)
      .select(explode(col("doc.SiteLayouts.SiteLayout")).as("site"))

  /** Generic child-collection unnest (X2–X5): `(sId, <child attrs…>)` rows.
    *
    * @param collection outer wrapper element, e.g. "Arms"
    * @param element    repeated child element, e.g. "Arm"
    */
  def unnestChild(sitesDf: DataFrame, collection: String,
                  element: String): DataFrame = {
    val exploded = sitesDf.select(
      col("site._sId").as("sId"),
      explode(col(s"site.$collection.$element")).as("child"))
    // promote child attrs (strip the `_` attribute prefix)
    val childFields = exploded.select(col("child.*")).columns
    exploded.select(
      (col("sId") +: childFields.toIndexedSeq.map(f =>
        col(s"child.$f").as(f.stripPrefix("_")))): _*)
  }

  def arms(sitesDf: DataFrame): DataFrame = unnestChild(sitesDf, "Arms", "Arm")
  def detectors(sitesDf: DataFrame): DataFrame =
    unnestChild(sitesDf, "Detectors", "Detector")
  def streets(sitesDf: DataFrame): DataFrame =
    unnestChild(sitesDf, "Streets", "Street")
  def sgs(sitesDf: DataFrame): DataFrame = unnestChild(sitesDf, "SGs", "SG")

  /** X6: the phases double-unnest — one row per (sId, phase name, SGNo text)
    * (reference `transis_response_models.py:194-197`). The reference guards
    * on `site.sgs` but iterates `site.phases` (guard/iterate mismatch); per
    * SURVEY §2.5 the *iteration* semantics are ported: rows come from Phases.
    */
  def phases(sitesDf: DataFrame): DataFrame =
    sitesDf
      .select(col("site._sId").as("sId"),
        explode(col("site.Phases.Phase")).as("phase"))
      .select(col("sId"), col("phase._name").as("name"),
        explode(col("phase.SGNos.SGNo")).as("sgNo"))

  /** K5: CSV sink with every field double-quoted, matching the reference's
    * quote-all row writer (`transis_response_models.py:113-117`). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true").option("quoteAll", "true")
      .csv(path)
}
