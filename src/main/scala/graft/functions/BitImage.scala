package graft.functions

/** Braille-glyph rendering of validity bitsets (SURVEY.md F7; reference
  * bitimage/BitImage.java:24, Glyphs.java — the progress-UI visual for
  * chunk-validity BitSets). Each braille cell encodes 8 bits in the
  * standard 2×4 dot layout (U+2800 + dot mask).
  */
object BitImage {

  // braille dot bit positions for (col, row): dots 1-8 map to offsets
  // (0,0)=0x01 (0,1)=0x02 (0,2)=0x04 (1,0)=0x08 (1,1)=0x10 (1,2)=0x20
  // (0,3)=0x40 (1,3)=0x80
  private val dotMask = Array(
    Array(0x01, 0x02, 0x04, 0x40), // column 0, rows 0..3
    Array(0x08, 0x10, 0x20, 0x80)) // column 1, rows 0..3

  /** Render `n` bits (bit i = `isSet(i)`) as a braille string, 8 bits per
    * glyph in column-major 2×4 cells.
    */
  def render(n: Int, isSet: Int => Boolean): String = {
    val cells = (n + 7) / 8
    val sb = new StringBuilder(cells)
    var c = 0
    while (c < cells) {
      var mask = 0
      var j = 0
      while (j < 8) {
        val bit = c * 8 + j
        if (bit < n && isSet(bit)) mask |= dotMask(j / 4)(j % 4)
        j += 1
      }
      sb.append((0x2800 + mask).toChar)
      c += 1
    }
    sb.toString
  }

  def render(bits: java.util.BitSet, n: Int): String = render(n, i => bits.get(i))

  /** Validity summary line like the reference's progress display:
    * `[⣿⣿⣦⠀⠀] 21/40 (52.5%)`.
    */
  def summary(n: Int, isSet: Int => Boolean): String = {
    val set = (0 until n).count(isSet)
    f"[${render(n, isSet)}] $set/$n (${if (n == 0) 0.0 else 100.0 * set / n}%.1f%%)"
  }
}
