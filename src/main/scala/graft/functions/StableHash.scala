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

  /** Per-thread reusable MD5 instance: `MessageDigest.getInstance` walks
    * the JCA provider list on every call — measurable in kernels hashing
    * millions of tokens per task. `digest()` resets the instance, so
    * reuse is exact.
    */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex digits of md5(s) as a 60-bit long (= SQL
    * `conv(substr(md5(s),1,15),16,10)`).
    */
  def md5Hash60(s: String): Long = {
    val md = md5Local.get()
    // reset defensively: an exception/interrupt between a previous
    // caller's update() and digest() would otherwise leave residual
    // digest state on this thread and silently corrupt every later hash
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    // 15 hex digits = 7.5 bytes
    var h = 0L
    var i = 0
    while (i < 7) {
      h = (h << 8) | (d(i) & 0xffL)
      i += 1
    }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** [[md5Hash60]] of every length-`l` code-point window of `cps` —
    * byte-equal to hashing `new String(cps, i, l)` per window, but the
    * UTF-8 encoding happens ONCE for the whole array and each window
    * hashes a byte slice: no per-window String/byte[] allocations.
    * Unpaired surrogates encode as '?' exactly like Java's UTF-8
    * CharsetEncoder (REPLACE action), so the bytes match `getBytes`.
    */
  def md5Window60(cps: Array[Int], l: Int): Array[Long] = {
    val n = cps.length - l + 1
    if (n <= 0) return Array.emptyLongArray
    val offs = new Array[Int](cps.length + 1)
    var total = 0
    var i = 0
    while (i < cps.length) {
      val c0 = cps(i)
      val c = if (c0 >= 0xD800 && c0 <= 0xDFFF) '?'.toInt else c0
      total += (if (c < 0x80) 1 else if (c < 0x800) 2
        else if (c < 0x10000) 3 else 4)
      i += 1
      offs(i) = total
    }
    val bytes = new Array[Byte](total)
    var p = 0
    i = 0
    while (i < cps.length) {
      val c0 = cps(i)
      val c = if (c0 >= 0xD800 && c0 <= 0xDFFF) '?'.toInt else c0
      if (c < 0x80) { bytes(p) = c.toByte; p += 1 }
      else if (c < 0x800) {
        bytes(p) = (0xc0 | (c >> 6)).toByte
        bytes(p + 1) = (0x80 | (c & 0x3f)).toByte
        p += 2
      } else if (c < 0x10000) {
        bytes(p) = (0xe0 | (c >> 12)).toByte
        bytes(p + 1) = (0x80 | ((c >> 6) & 0x3f)).toByte
        bytes(p + 2) = (0x80 | (c & 0x3f)).toByte
        p += 3
      } else {
        bytes(p) = (0xf0 | (c >> 18)).toByte
        bytes(p + 1) = (0x80 | ((c >> 12) & 0x3f)).toByte
        bytes(p + 2) = (0x80 | ((c >> 6) & 0x3f)).toByte
        bytes(p + 3) = (0x80 | (c & 0x3f)).toByte
        p += 4
      }
      i += 1
    }
    val md = md5Local.get()
    md.reset() // see md5Hash60: clear any aborted caller's residual state
    Array.tabulate(n) { w =>
      md.update(bytes, offs(w), offs(w + l) - offs(w))
      val d = md.digest()
      var h = 0L
      var k = 0
      while (k < 7) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
      (h << 4) | ((d(7) & 0xf0L) >> 4)
    }
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
