package graft.layout

/** Count-suffix parsing (SURVEY.md F3; reference
  * utils/UnitConversions.java:163-203,274-302): "5M" → 5,000,000, with
  * underscore separators, `MAX`, and K/M/B/G/T/P/E suffixes (decimal
  * multipliers, B and G both 1e9).
  */
object Units {

  private val suffixes: Map[String, Long] = Map(
    "K" -> 1000L,
    "M" -> 1000000L,
    "B" -> 1000000000L,
    "G" -> 1000000000L,
    "T" -> 1000000000000L,
    "P" -> 1000000000000000L,
    "E" -> 1000000000000000000L)

  private val pattern = "^([0-9]+)\\s*([A-Za-z]+)?$".r

  /** Parse a count spec; None when unparseable. */
  def longCountFor(spec0: String): Option[Long] = {
    val spec = spec0.replace("_", "").trim match {
      case "MAX" => Long.MaxValue.toString
      case s     => s
    }
    spec match {
      case pattern(num, null) => num.toLongOption
      case pattern(num, unit) =>
        suffixes.get(unit.toUpperCase).flatMap(m => num.toLongOption.map(_ * m))
      case _ => None
    }
  }

  def parseCount(spec: String): Long =
    longCountFor(spec).getOrElse(
      throw new IllegalArgumentException(s"unrecognized count spec: $spec"))
}
