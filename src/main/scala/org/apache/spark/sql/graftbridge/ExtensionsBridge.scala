package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-visibility bridge: apply a [[SparkSessionExtensions]]' injected
  * functions to a live session's registry. `registerFunctions` is
  * `private[sql]` (sessions normally consume extensions only at builder
  * time), but the surface-parity spec needs to drive the EXACT injection
  * path `spark.sql.extensions` would run, on a session that already
  * exists — getOrCreate reuses the JVM-wide test session, so a
  * builder-time install can't be exercised in-process.
  */
object ExtensionsBridge {
  def applyFunctions(e: SparkSessionExtensions,
                     registry: FunctionRegistry): Unit = {
    e.registerFunctions(registry): Unit
  }
}
