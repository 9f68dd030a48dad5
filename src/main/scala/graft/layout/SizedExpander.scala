package graft.layout

/** Sized-profile expansion (SURVEY.md P2; reference
  * layoutv2/DSSizedExpander.java:60-380): `sized: [10m, 100m..400m/100m]`
  * becomes one profile per count, windowed `[0..count)` over the default
  * profile's facets. Range forms:
  *
  *  - `10m`            — one entry
  *  - `1m..5m`         — endpoints only
  *  - `100m..400m/100m`— linear with absolute step (suffix ⇒ step)
  *  - `0m..400m/10`    — linear split into N parts (no suffix ⇒ count)
  *  - `fib:1m..400m`   — Fibonacci multiples of start
  *  - `mul:1m..400m/2` — geometric by factor (fractional allowed, default 2)
  *
  * Entry names use the reference's canonical suffix form (`1m`, `2b`, ...).
  */
object SizedExpander {

  final case class SizedEntry(name: String, count: Long)

  private val rangeSpec =
    "^(fib:|mul:)?([\\d_]+[a-zA-Z]*)\\.\\.([\\d_]+[a-zA-Z]*)(?:/([\\d_.]+[a-zA-Z]*))?$".r

  def expandSpec(spec0: String): Seq[SizedEntry] = {
    val spec = spec0.trim
    spec match {
      case rangeSpec(prefix, startS, endS, divisorS) =>
        val start = Units.parseCount(startS)
        val end = Units.parseCount(endS)
        prefix match {
          case "fib:" => fibonacci(start, end)
          case "mul:" =>
            val factor = Option(divisorS).map(_.toDouble).getOrElse(2.0)
            geometric(start, end, factor)
          case _ =>
            Option(divisorS) match {
              case None =>
                if (start == end) Seq(entry(start))
                else Seq(entry(start), entry(end))
              case Some(d) =>
                val hasSuffix = d.replaceAll("[_\\d.]", "").nonEmpty
                if (hasSuffix) linearStep(start, end, Units.parseCount(d))
                else linearCount(start, end, Units.parseCount(d))
            }
        }
      case single => Seq(entry(Units.parseCount(single)))
    }
  }

  def expand(specs: Seq[String]): Seq[SizedEntry] =
    specs.flatMap(expandSpec).distinctBy(_.count).sortBy(_.count)

  private def linearStep(start: Long, end: Long, step: Long): Seq[SizedEntry] = {
    val first = if (start == 0) step else start
    Iterator.iterate(first)(_ + step).takeWhile(_ <= end).map(entry).toSeq
  }

  private def linearCount(start: Long, end: Long, count: Long): Seq[SizedEntry] = {
    if (count <= 0) return Nil
    val step = (end - start) / count
    if (step <= 0) return Nil
    (1L to count).map(i => entry(start + step * i))
  }

  private def fibonacci(start: Long, end: Long): Seq[SizedEntry] = {
    require(start > 0, s"fibonacci expansion needs start > 0, got $start")
    val out = scala.collection.mutable.ArrayBuffer.empty[SizedEntry]
    var a = 1L; var b = 1L
    // bound by a <= end/start so start*a can never overflow long
    while (a <= end / start) {
      out += entry(start * a)
      val next = a + b; a = b; b = next
    }
    out.toSeq
  }

  private def geometric(start: Long, end: Long, factor: Double): Seq[SizedEntry] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[SizedEntry]
    var current = start
    var continue = true
    while (continue && current <= end) {
      out += entry(current)
      val next = math.floor(current * factor).toLong
      if (next <= current) continue = false else current = next
    }
    out.toSeq
  }

  private def entry(count: Long) = SizedEntry(formatCount(count), count)

  /** Canonical short name: largest suffix that divides evenly (1m, 2b...). */
  def formatCount(count: Long): String = {
    if (count <= 0) return count.toString
    val suffixes = Seq(1000000000000L -> "t", 1000000000L -> "b", 1000000L -> "m", 1000L -> "k")
    suffixes.collectFirst {
      case (mult, sfx) if count >= mult && count % mult == 0 => s"${count / mult}$sfx"
    }.getOrElse(count.toString)
  }
}
