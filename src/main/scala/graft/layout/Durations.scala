package graft.layout

/** Duration-string parsing (SURVEY.md F3; reference
  * utils/UnitConversions.java:49-120,403-433): compound specs like `1h30m`
  * resolved to a requested unit. Unit labels (case-insensitive except the
  * M/m minute-vs-milli distinction follows the reference's labels):
  * s, ms, µs/us, ns, M/m(inutes), H/h(ours), D/d(ays), W/w(eeks), Y/y(ears).
  */
object Durations {

  private val NanosPerSecond = 1000000000L

  val unitNanos: Map[String, Long] = Map(
    "ns" -> 1L,
    "us" -> 1000L, "µs" -> 1000L,
    "ms" -> 1000000L,
    "s" -> NanosPerSecond, "seconds" -> NanosPerSecond, "second" -> NanosPerSecond,
    "m" -> NanosPerSecond * 60, "minutes" -> NanosPerSecond * 60, "minute" -> NanosPerSecond * 60,
    "h" -> NanosPerSecond * 3600, "hours" -> NanosPerSecond * 3600, "hour" -> NanosPerSecond * 3600,
    "d" -> NanosPerSecond * 86400, "days" -> NanosPerSecond * 86400, "day" -> NanosPerSecond * 86400,
    "w" -> NanosPerSecond * 604800L, "weeks" -> NanosPerSecond * 604800L,
    "y" -> NanosPerSecond * 31536000L, "years" -> NanosPerSecond * 31536000L)

  private val part = "([0-9]+)\\s*([a-zA-Zµ]+)".r

  /** Total nanoseconds of a compound spec (`1h30m`, `250ms`, `90`→seconds
    * when unitless). None if unparseable.
    */
  def nanosFor(spec0: String): Option[Long] = {
    val spec = spec0.trim
    if (spec.isEmpty) return None
    if (spec.forall(_.isDigit)) return spec.toLongOption.map(_ * NanosPerSecond)
    val parts = part.findAllMatchIn(spec).toSeq
    val consumed = parts.map(_.matched.length).sum
    if (parts.isEmpty || consumed != spec.replaceAll("\\s", "").length &&
      parts.map(_.matched).mkString != spec) {
      // tolerate internal whitespace: re-check by stripping spaces
      val stripped = spec.replaceAll("\\s", "")
      if (part.findAllMatchIn(stripped).map(_.matched).mkString != stripped) return None
    }
    val nanos = parts.map { m =>
      val n = m.group(1).toLong
      val u = m.group(2)
      // minutes vs millis: lone 'M' is minutes per the reference's labels;
      // 'm' followed by 's' is millis and is matched as "ms" directly
      val key = if (u == "M") "m" else u.toLowerCase
      unitNanos.get(key).map(_ * n)
    }
    if (nanos.exists(_.isEmpty)) None else Some(nanos.flatten.sum)
  }

  def millisFor(spec: String): Option[Long] = nanosFor(spec).map(_ / 1000000L)
  def microsFor(spec: String): Option[Long] = nanosFor(spec).map(_ / 1000L)
  def secondsFor(spec: String): Option[Long] = nanosFor(spec).map(_ / NanosPerSecond)
  def minutesFor(spec: String): Option[Long] = nanosFor(spec).map(_ / (NanosPerSecond * 60))
}
