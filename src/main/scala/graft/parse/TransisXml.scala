package graft.parse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Framing + parsing of Transis push-stream byte payloads (SURVEY.md §2.2).
  *
  * The reference frames the HTTP byte stream on null bytes
  * (`transis_consumer.py:127-139` streaming; `:88-89` batch split) and parses
  * each fragment with ElementTree (`transis_response_models.py:288-292`).
  * Here the same semantics are declarative column expressions, so they run
  * identically under batch and Structured Streaming and stay inside
  * whole-stage codegen — no RDDs, no UDFs.
  */
object TransisXml {

  /** P1 + F1: split a column of concatenated documents on `\x00`, one row per
    * non-empty fragment (reference `transis_consumer.py:88-89`: drop `b""`).
    */
  def frame(raw: DataFrame, valueCol: String = "value"): DataFrame =
    raw
      .select(explode(split(col(valueCol), "\u0000")).as("fragment"))
      .filter(length(trim(col("fragment"))) > 0)

  /** Strip XML namespace prefixes before parsing. Deviation from the
    * reference (which keeps `ns2:` in tag names); documented in Schemas. */
  def stripNamespaces(c: Column): Column =
    regexp_replace(c, "(</?)[A-Za-z0-9]+:", "$1")

  /** P2: parse one XML document per row against an explicit schema.
    *
    * The parse is wrapped in `explode(array(…))` — a one-element Generate
    * that is semantically the identity but acts as an optimizer barrier:
    * downstream filters/projections reference the generator's output
    * attribute and therefore cannot be collapsed into (and so replicate)
    * the `from_xml` call. Without it, `CollapseProject` + filter pushdown
    * inline the parse into every Post-Scan Filter, evaluating the XML
    * parse 2–4× per row — invisible at fixture scale, but at 100 TB the
    * parse IS the scan cost. `AnalyticsAndPlanSpec` asserts exactly one
    * `from_xml` occurrence in the executed topology plan.
    */
  def parse(framed: DataFrame, schema: StructType,
            fragmentCol: String = "fragment"): DataFrame =
    framed.select(
      explode(array(
        from_xml(stripNamespaces(col(fragmentCol)), schema))).as("doc"))

  /** P4 predicate: root `@error` in {"true","True"} — reference
    * `transis_response_models.py:312-317`. */
  def isErrorDoc(doc: Column): Column =
    doc.getField("_error").isin("true", "True")

  /** P4 side-output: error documents with their first error message
    * (reference raises on these and kills the stream,
    * `transis_consumer.py:134-136`; file/analytics mode routes them to an
    * error sink instead — SURVEY §2.2 P4). */
  def errorDocs(parsed: DataFrame): DataFrame =
    parsed
      .filter(isErrorDoc(col("doc")))
      .select(element_at(col("doc.Errors.Error"), 1)
        .getField("_msg").as("errorMsg"))

  /** P6 raw echo (reference `transis_response_models.py:327-328`
    * `to_string`): the document exactly as framed off the wire. */
  def rawEcho(framed: DataFrame, fragmentCol: String = "fragment"): DataFrame =
    framed.select(col(fragmentCol).as("raw"))

  /** P6 pretty-print (reference `transis_response_models.py:319-325`
    * `to_file`: minidom `toprettyxml(indent="   ")`). Debug-only surface;
    * the JAXP transformer is initialized once per partition (the same
    * opaque-library boundary as the multimodal codecs), rows stream
    * through it. Output is this engine's canonical indented form —
    * deterministic, but not byte-identical to minidom's. */
  def prettyPrint(framed: DataFrame, fragmentCol: String = "fragment",
                  indent: Int = 3): DataFrame = {
    val spark = framed.sparkSession
    import spark.implicits._
    framed.select(col(fragmentCol)).as[String].mapPartitions { docs =>
      val t = javax.xml.transform.TransformerFactory.newInstance().newTransformer()
      t.setOutputProperty(javax.xml.transform.OutputKeys.INDENT, "yes")
      t.setOutputProperty("{http://xml.apache.org/xslt}indent-amount",
        indent.toString)
      docs.map { doc =>
        val out = new java.io.StringWriter()
        t.transform(
          new javax.xml.transform.stream.StreamSource(
            new java.io.StringReader(doc)),
          new javax.xml.transform.stream.StreamResult(out))
        out.toString
      }
    }.toDF("pretty")
  }

  /** F2 + truthiness quirk: keep only documents that actually carry a
    * non-empty `DetectorCountMessages` collection. An empty-but-present
    * element is treated as absent, matching ElementTree falsiness
    * (reference `transis_response_models.py:294-301`; SURVEY §2.5 note). */
  def detectorCountDocs(parsed: DataFrame): DataFrame =
    parsed
      .filter(!isErrorDoc(col("doc")) || col("doc._error").isNull)
      .filter(size(col("doc.DetectorCountMessages.DetectorCountMessage")) > 0)
}
