package graft.metadata

/** ULID codec (SURVEY.md F8; reference spec/metadata/Ulid.java): 16 bytes =
  * 48-bit timestamp + 80-bit randomness, canonical form = 26 chars of
  * Crockford base32 (I/L→1, O→0 on decode).
  */
object Ulid {

  private val Encode = "0123456789ABCDEFGHJKMNPQRSTVWXYZ".toCharArray
  private val Decode: Array[Byte] = {
    val d = Array.fill[Byte](128)(-1)
    Encode.zipWithIndex.foreach { case (c, i) =>
      d(c) = i.toByte
      if (c.isLetter) d(c.toLower) = i.toByte
    }
    d('I') = 1; d('i') = 1; d('L') = 1; d('l') = 1; d('O') = 0; d('o') = 0
    d
  }

  /** 16 bytes -> 26-char canonical string. */
  def toCanonical(bytes: Array[Byte]): String = {
    require(bytes.length == 16, s"ULID must be 16 bytes, got ${bytes.length}")
    // 128 bits -> 26 base32 chars (leading char carries only 3 bits)
    val out = new Array[Char](26)
    var acc = BigInt(1, bytes) // positive
    (25 to 0 by -1).foreach { i =>
      out(i) = Encode((acc & 0x1f).toInt)
      acc >>= 5
    }
    new String(out)
  }

  /** 26-char string -> 16 bytes; accepts Crockford confusables. */
  def fromCanonical(s: String): Array[Byte] = {
    require(s.length == 26, s"ULID must be 26 chars, got ${s.length}")
    var acc = BigInt(0)
    s.foreach { c =>
      require(c < 128 && Decode(c) >= 0, s"invalid ULID char: $c")
      acc = (acc << 5) | BigInt(Decode(c).toInt)
    }
    val raw = acc.toByteArray.dropWhile(_ == 0)
    require(raw.length <= 16, s"ULID overflows 128 bits: $s")
    Array.fill[Byte](16 - raw.length)(0) ++ raw
  }

  /** Deterministic ULID from (timestampMs, entropy) — generation for tests
    * and synthesis (per-ordinal determinism, no wall clock).
    */
  def of(timestampMs: Long, entropyHi: Short, entropyLo: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putShort(((timestampMs >>> 32) & 0xffff).toShort)
    bb.putInt((timestampMs & 0xffffffffL).toInt)
    bb.putShort(entropyHi)
    bb.putLong(entropyLo)
    bb.array()
  }
}
