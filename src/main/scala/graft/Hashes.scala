package graft

/** The one md5-to-hex-prefix helper behind every path-derived stable
  * name in the engine (band-table catalog names, artifact roots,
  * stream tags) — three hand-rolled copies of the digest recipe would
  * otherwise have to stay in lockstep by hand. */
object Hashes {
  /** First `hexChars` hex chars of md5(s) (lowercase). */
  def md5Hex(s: String, hexChars: Int): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"${b & 0xff}%02x").mkString.take(hexChars)
}
