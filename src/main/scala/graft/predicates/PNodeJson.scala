package graft.predicates

import org.json4s.JsonAST._
import org.json4s.jackson.JsonMethods

/** JSON codec per /root/reference/specs/predicate_format_v1.md:20-147.
  * Node type is inferred from the operator: comparison ops make predicate
  * nodes (`field`, `op`, `values`), AND/OR make conjugate nodes (`op`,
  * `nodes`). Extended (superset, for the typed dialect): `field` may be a
  * string name and values may be strings/booleans/null.
  */
object PNodeJson {

  def render(node: PNode): String = JsonMethods.compact(toJson(node))

  def toJson(node: PNode): JValue = node match {
    case ConjugateNode(isAnd, cs) =>
      JObject(
        "op" -> JString(if (isAnd) "AND" else "OR"),
        "nodes" -> JArray(cs.map(toJson).toList))
    case p: PredicateNode =>
      val fieldJ: JValue =
        p.fieldName.map(JString(_)).getOrElse(JInt(BigInt(p.field)))
      JObject(
        "field" -> fieldJ,
        "op" -> JString(opName(p.op)),
        "values" -> JArray(p.comparands.map(comparandJson).toList))
  }

  private def opName(op: OpType): String = op match {
    case OpType.GT => "GT"; case OpType.LT => "LT"; case OpType.EQ => "EQ"
    case OpType.NE => "NE"; case OpType.GE => "GE"; case OpType.LE => "LE"
    case OpType.IN => "IN"; case OpType.MATCHES => "MATCHES"
  }

  private def comparandJson(c: Comparand): JValue = c match {
    case Comparand.IntVal(v)   => JInt(BigInt(v))
    case Comparand.FloatVal(v) => JDouble(v)
    case Comparand.TextVal(s)  => JString(s)
    case Comparand.BoolVal(b)  => JBool(b)
    case Comparand.NullVal     => JNull
    case Comparand.BytesVal(b) =>
      JString(java.util.Base64.getEncoder.encodeToString(b.toArray))
  }

  def parse(json: String): PNode = fromJson(JsonMethods.parse(json))

  def fromJson(j: JValue): PNode = j match {
    case JObject(fields) =>
      val m = fields.toMap
      val op = m.get("op") match {
        case Some(JString(s)) => s
        case other => throw new IllegalArgumentException(s"missing/invalid op: $other")
      }
      op match {
        case "AND" | "OR" =>
          val nodes = m.get("nodes") match {
            case Some(JArray(ns)) => ns.map(fromJson)
            case other => throw new IllegalArgumentException(s"conjugate needs nodes: $other")
          }
          ConjugateNode(isAnd = op == "AND", nodes)
        case _ =>
          val opT = OpType.parse(op)
          val values = m.get("values") match {
            case Some(JArray(vs)) => vs.map(jsonComparand)
            case None             => Nil
            case other => throw new IllegalArgumentException(s"invalid values: $other")
          }
          m.get("field") match {
            case Some(JInt(i)) =>
              // numeric fields stay in the legacy i64 lane when all values are ints
              val allInts = values.forall(_.isInstanceOf[Comparand.IntVal])
              PredicateNode(i.toInt, None, opT, values, typed = !allInts)
            case Some(JString(name)) =>
              PredicateNode(-1, Some(name), opT, values, typed = true)
            case other => throw new IllegalArgumentException(s"missing/invalid field: $other")
          }
      }
    case other => throw new IllegalArgumentException(s"expected object, got: $other")
  }

  private def jsonComparand(j: JValue): Comparand = j match {
    case JInt(i)      => Comparand.IntVal(i.toLong)
    case JLong(l)     => Comparand.IntVal(l)
    case JDouble(d)   => Comparand.FloatVal(d)
    case JDecimal(d)  => Comparand.FloatVal(d.toDouble)
    case JString(s)   => Comparand.TextVal(s)
    case JBool(b)     => Comparand.BoolVal(b)
    case JNull        => Comparand.NullVal
    case other => throw new IllegalArgumentException(s"invalid comparand: $other")
  }
}
