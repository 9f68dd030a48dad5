package graft.predicates

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Regex-valued tag filters over tagged items (SURVEY.md P9; reference
  * spec/tagging/TagFilter.java:28-67):
  *
  *  - filter spec: (name, value?) pairs separated by spaces/commas, with
  *    `:` or `=` between name and value (`name1=value1 name2:v2, name3`)
  *  - a bare name matches any item that HAS the tag
  *  - a value is a regex, full-matched against the tag's value; single
  *    quotes around a value are stripped (shell-escape convenience)
  *  - every filter entry must match (conjunction)
  *
  * Spark mapping: items carry a `MapType(String,String)` tags column; the
  * filter compiles to `map_contains_key AND rlike` conjunctions, and a
  * driver-side matcher with explanation log serves the CLI use.
  */
final case class TagFilter(entries: Seq[(String, Option[String])]) {

  /** Compile to a Column over a map<string,string> tags column. */
  def predicate(tags: Column): Column =
    entries.map { case (name, valueOpt) =>
      val has = map_contains_key(tags, lit(name))
      valueOpt match {
        case None => has
        case Some(re) =>
          has && coalesce(element_at(tags, lit(name)), lit(""))
            .rlike("^(?:" + re + ")$")
      }
    }.reduceOption(_ && _).getOrElse(lit(true))

  /** Driver-side match with the reference's explanation log. */
  def matches(tags: Map[String, String]): (Boolean, Seq[String]) = {
    val log = entries.map { case (name, valueOpt) =>
      (tags.get(name), valueOpt) match {
        case (None, _) =>
          (false, s"MISS: item has no tag '$name'")
        case (Some(_), None) =>
          (true, s"MATCH: item has tag '$name'")
        case (Some(v), Some(re)) =>
          if (java.util.regex.Pattern.matches(re, v))
            (true, s"MATCH: tag '$name'='$v' matches /$re/")
          else (false, s"MISS: tag '$name'='$v' does not match /$re/")
      }
    }
    (log.forall(_._1), log.map(_._2))
  }
}

object TagFilter {
  /** Parse `name1=value1 name2:v2, name3` (spaces/commas between entries). */
  def parse(spec: String): TagFilter = {
    val parts = spec.trim.split("[\\s,]+").filter(_.nonEmpty)
    TagFilter(parts.toSeq.map { p =>
      p.split("[:=]", 2) match {
        case Array(n)    => n -> None
        case Array(n, v) =>
          val unquoted =
            if (v.length >= 2 && v.startsWith("'") && v.endsWith("'"))
              v.substring(1, v.length - 1)
            else v
          n -> Some(unquoted)
      }
    })
  }
}
