package graft.functions

/** IEEE 754 binary16 <-> binary32 conversion, bit-exact for subnormals,
  * infinities and NaN. Public algorithm; semantics mirror the reference's
  * half-precision support (/root/reference/datatools-testdata-apis/.../types/Half.java:35,
  * DistanceFunction.java:103-128) which the mvec reader relies on
  * (CoreXVecVectorDatasetViewMethods.java:168-194).
  *
  * (JDK 17 has no Float.float16ToFloat — that arrived in JDK 20 — so the
  * conversion is implemented directly.)
  */
object Half {

  /** binary16 bit pattern (low 16 bits of `h`) -> float32. */
  def toFloat(h: Short): Float = {
    val bits = h & 0xffff
    val sign = (bits & 0x8000) << 16
    val exp = (bits >>> 10) & 0x1f
    val mant = bits & 0x3ff
    val f32bits =
      if (exp == 0) {
        if (mant == 0) sign // signed zero
        else {
          // subnormal half: normalize into float32
          var m = mant
          var e = -1
          while ((m & 0x400) == 0) { m <<= 1; e += 1 }
          m &= 0x3ff
          sign | ((127 - 15 - e) << 23) | (m << 13)
        }
      } else if (exp == 0x1f) {
        sign | 0x7f800000 | (mant << 13) // inf / NaN (payload preserved <<13)
      } else {
        sign | ((exp - 15 + 127) << 23) | (mant << 13)
      }
    java.lang.Float.intBitsToFloat(f32bits)
  }

  /** float32 -> binary16 bit pattern, round-to-nearest-even. */
  def fromFloat(f: Float): Short = {
    val bits = java.lang.Float.floatToRawIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    val e = (bits >>> 23) & 0xff
    val m = bits & 0x7fffff
    if (e == 0xff) {
      // inf / NaN
      val nan = if (m != 0) math.max(1, m >>> 13) else 0
      (sign | 0x7c00 | nan).toShort
    } else {
      val exp = e - 127 + 15
      if (exp >= 0x1f) (sign | 0x7c00).toShort // overflow -> inf
      else if (exp <= 0) {
        if (exp < -10) sign.toShort // underflow -> signed zero
        else {
          // subnormal half with round-to-nearest-even
          val full = m | 0x800000
          val shift = 14 - exp
          val half = full >>> shift
          val rem = full & ((1 << shift) - 1)
          val mid = 1 << (shift - 1)
          val rounded =
            if (rem > mid || (rem == mid && (half & 1) == 1)) half + 1 else half
          (sign | rounded).toShort
        }
      } else {
        val half = (sign | (exp << 10) | (m >>> 13))
        val rem = m & 0x1fff
        val rounded =
          if (rem > 0x1000 || (rem == 0x1000 && (half & 1) == 1)) half + 1 else half
        rounded.toShort
      }
    }
  }
}
