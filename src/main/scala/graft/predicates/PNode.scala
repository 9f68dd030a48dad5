package graft.predicates

/** Typed predicate-tree AST mirroring the reference's PNode algebra
  * (/root/reference/datatools-vectordata/.../spec/predicates/PNode.java:34,
  * ConjugateNode.java:25, PredicateNode.java:41-51, Comparand.java:27-50,
  * OpType.java:21-38).
  *
  * Wire-format constants (little-endian):
  *  - node type tags  (ConjugateType.java:24-28): PRED=0, AND=1, OR=2
  *  - op ordinals     (OpType.java): GT=0 LT=1 EQ=2 NE=3 GE=4 LE=5 IN=6 MATCHES=7
  *  - comparand tags  (Comparand.java:40-50): INT=0 FLOAT=1 TEXT=2 BOOL=3 BYTES=4 NULL=5
  */
sealed trait OpType { def ordinal: Int; def symbol: String }
object OpType {
  case object GT extends OpType { val ordinal = 0; val symbol = ">" }
  case object LT extends OpType { val ordinal = 1; val symbol = "<" }
  case object EQ extends OpType { val ordinal = 2; val symbol = "=" }
  case object NE extends OpType { val ordinal = 3; val symbol = "!=" }
  case object GE extends OpType { val ordinal = 4; val symbol = ">=" }
  case object LE extends OpType { val ordinal = 5; val symbol = "<=" }
  case object IN extends OpType { val ordinal = 6; val symbol = "IN" }
  case object MATCHES extends OpType { val ordinal = 7; val symbol = "MATCHES" }

  val values: Seq[OpType] = Seq(GT, LT, EQ, NE, GE, LE, IN, MATCHES)

  def fromOrdinal(i: Int): OpType =
    if (i >= 0 && i < values.size) values(i)
    else throw new IllegalArgumentException(s"unknown OpType ordinal: $i")

  /** Accepts both enum names and symbols, per predicate_format_v1.md:44-52. */
  def parse(s: String): OpType = s match {
    case "GT" | ">"  => GT
    case "LT" | "<"  => LT
    case "EQ" | "="  => EQ
    case "NE" | "!=" => NE
    case "GE" | ">=" => GE
    case "LE" | "<=" => LE
    case "IN"        => IN
    case "MATCHES"   => MATCHES
    case other => throw new IllegalArgumentException(s"unknown op: $other")
  }
}

sealed trait Comparand { def tag: Byte }
object Comparand {
  final case class IntVal(value: Long) extends Comparand { val tag = 0: Byte }
  final case class FloatVal(value: Double) extends Comparand { val tag = 1: Byte }
  final case class TextVal(value: String) extends Comparand { val tag = 2: Byte }
  final case class BoolVal(value: Boolean) extends Comparand { val tag = 3: Byte }
  final case class BytesVal(value: Vector[Byte]) extends Comparand { val tag = 4: Byte }
  case object NullVal extends Comparand { val tag = 5: Byte }
}

sealed trait PNode

/** AND/OR over child nodes (ConjugateNode.java:25). */
final case class ConjugateNode(isAnd: Boolean, children: Seq[PNode]) extends PNode
object ConjugateNode {
  def and(children: PNode*): ConjugateNode = ConjugateNode(isAnd = true, children)
  def or(children: PNode*): ConjugateNode = ConjugateNode(isAnd = false, children)
}

/** Single comparison. Field identified by positional index (indexed mode,
  * field >= 0, name empty) or by name (named mode, field == -1)
  * (PredicateNode.java:29-45). `typed=false` carries the legacy i64
  * comparands (wrapped as IntVal here).
  */
final case class PredicateNode(
    field: Int,
    fieldName: Option[String],
    op: OpType,
    comparands: Seq[Comparand],
    typed: Boolean) extends PNode {
  /** Reference fallback naming: `F<idx>` (PNodeSqlCodec.java fieldRef). */
  def effectiveName: String = fieldName.getOrElse(s"F$field")
}

object PredicateNode {
  /** Indexed, legacy i64 comparands (PredicateNode.java:58). */
  def indexed(field: Int, op: OpType, vs: Long*): PredicateNode =
    PredicateNode(field, None, op, vs.map(Comparand.IntVal.apply), typed = false)

  /** Named, legacy i64 comparands (PredicateNode.java:71). */
  def named(name: String, op: OpType, vs: Long*): PredicateNode =
    PredicateNode(-1, Some(name), op, vs.map(Comparand.IntVal.apply), typed = false)

  /** Named, typed comparands (PredicateNode.java:84). */
  def namedTyped(name: String, op: OpType, cs: Comparand*): PredicateNode =
    PredicateNode(-1, Some(name), op, cs, typed = true)
}
