package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable hashing primitives.
  *
  * Spark's native `hash`/`xxhash64` are Murmur3/XXH64 with Spark-specific
  * seeds — fine inside one engine, but not reproducible by other systems.
  * For operators whose results must be auditable across engines (the
  * DuckDB oracle, or a downstream system re-deriving buckets), we define
  * hashes on top of MD5, which every engine computes identically:
  *
  *   hash32(s) = first 8 hex chars of md5(s), read as an unsigned int
  *
  * DuckDB equivalent: `CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)`.
  *
  * MD5 is ~3-5× slower than Murmur3 but runs inside whole-stage codegen
  * (both `md5` and `conv` are codegen'd expressions), and dedup/LSH cost
  * is dominated by the shuffle, not the hash. Swap in `xxhash64` where
  * cross-engine reproducibility is not required.
  */
object Hashing {

  /** 32-bit unsigned hash of a string column, as LongType in [0, 2^32). */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Seeded variant: independent hash family member `seed`. */
  def hash32(c: Column, seed: Int): Column =
    hash32(concat(lit(s"$seed:"), c))

  /** SQL-expression fragment computing hash32 of `inner` — for use inside
    * higher-order function lambdas where Column composition can't reach. */
  def hash32Sql(inner: String): String =
    s"cast(conv(substr(md5($inner), 1, 8), 16, 10) as bigint)"

  /** Driver-side hash32 of a literal string — same function as the
    * column form (first 8 hex chars of MD5, as an unsigned int), for
    * precomputing small deterministic constants (e.g. a random-sign
    * projection matrix) that both the Spark plan and the DuckDB oracle
    * re-derive identically. Equality with the column form is pinned by
    * ExpressionSpec. */
  def hash32Local(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16)
  }
}
