package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class HalfSpec extends AnyFunSuite {

  test("golden binary16 values") {
    assert(Half.toFloat(0x0000.toShort) == 0.0f)
    assert(java.lang.Float.floatToRawIntBits(Half.toFloat(0x8000.toShort)) == 0x80000000) // -0
    assert(Half.toFloat(0x3c00.toShort) == 1.0f)
    assert(Half.toFloat(0xc000.toShort) == -2.0f)
    assert(Half.toFloat(0x7bff.toShort) == 65504.0f) // max finite
    assert(Half.toFloat(0x0001.toShort) == 5.9604645e-8f) // min subnormal
    assert(Half.toFloat(0x0400.toShort) == 6.103515625e-5f) // min normal
    assert(Half.toFloat(0x7c00.toShort) == Float.PositiveInfinity)
    assert(Half.toFloat(0xfc00.toShort) == Float.NegativeInfinity)
    assert(Half.toFloat(0x7e00.toShort).isNaN)
    assert(Half.toFloat(0x3555.toShort) == 0.33325195f) // ~1/3
  }

  test("round trip: every non-NaN half survives f16 -> f32 -> f16 bit-exactly") {
    (0 until 0x10000).foreach { bits =>
      val h = bits.toShort
      val f = Half.toFloat(h)
      if (!f.isNaN) {
        assert(Half.fromFloat(f) == h, f"bits=0x$bits%04x")
      } else {
        // NaN must stay NaN (payload may differ)
        assert(Half.toFloat(Half.fromFloat(f)).isNaN)
      }
    }
  }

  test("fromFloat rounds to nearest even") {
    assert(Half.fromFloat(1.0000001f) == 0x3c00.toShort)
    assert(Half.fromFloat(65519.0f) == 0x7bff.toShort) // just below overflow midpoint
    assert(Half.fromFloat(65520.0f) == 0x7c00.toShort) // midpoint -> even -> inf
    assert(Half.fromFloat(1e-10f) == 0x0000.toShort)   // underflow to zero
    assert(Half.fromFloat(1e10f) == 0x7c00.toShort)    // overflow to inf
  }
}
