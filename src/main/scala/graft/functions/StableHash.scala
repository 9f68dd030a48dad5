package graft.functions

/** Deterministic 64-bit hashing used by the dedup candidate generators.
  * Nothing here needs cross-engine parity (candidates are exact-verified);
  * `md5Hash60` DOES have parity — it must equal the SQL form
  * `conv(substr(md5(tok),1,15),16,10)` used by oracles and by
  * Dedup.tokenHash60.
  */
object StableHash {

  /** FNV-1a 64 over UTF-8 bytes with a splitmix finalizer. */
  def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    mix(h)
  }

  /** splitmix64 finalizer. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val hex = "0123456789abcdef".toCharArray

  /** First 15 hex digits of md5(s) as a 60-bit long (= SQL
    * `conv(substr(md5(s),1,15),16,10)`).
    */
  def md5Hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    // 15 hex digits = 7.5 bytes
    var h = 0L
    var i = 0
    while (i < 7) {
      h = (h << 8) | (d(i) & 0xffL)
      i += 1
    }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** xxHash64 over UTF-8 bytes with Spark's SQL seed (42) — byte-equal to
    * the `xxhash64(col)` Column function (same catalyst XXH64 kernel), so
    * a typed-kernel consumer and a Column consumer agree exactly.
    */
  def xx64(s: String): Long = {
    val b = s.getBytes("UTF-8")
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
  }
}
