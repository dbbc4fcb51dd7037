package graft

/** Collision-proof tags for per-sfDir cache paths, layout dirs, and
  * catalog table names.
  *
  * Earlier rounds derived these from `String.hashCode` (32 bits): two
  * distinct sfDirs with colliding hashCodes would silently share a
  * staged index / sketch store / partitioned layout and probe each
  * other's data with no error. The in-memory caches key by the FULL
  * path, so only the on-disk name could alias — but an on-disk alias
  * is exactly the silent-wrong-data case. A 64-bit SHA-256 prefix
  * makes accidental aliasing ~2⁻⁶⁴ per pair, and the lowercase-hex
  * output stays filesystem- and SQL-identifier-safe everywhere the
  * old tag was used.
  */
object CachePaths {

  /** First 16 hex chars of SHA-256 of `path` (64 bits). */
  def tag(path: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(path.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.take(8).map(b => f"$b%02x").mkString
  }
}
