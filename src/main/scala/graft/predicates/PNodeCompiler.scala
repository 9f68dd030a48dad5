package graft.predicates

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiles a PNode tree to a Catalyst Column with the reference evaluator's
  * exact two-valued semantics (PredicateEvaluator.java:45-221):
  *
  *  - a NULL field matches only `EQ` with a Null comparand
  *    (PredicateEvaluator.java:82-84); everything else is false — Spark's
  *    three-valued logic is collapsed at every leaf via when/otherwise so
  *    AND/OR never see SQL NULL.
  *  - the first comparand's type picks the comparison lane: IntVal compares
  *    as i64 (field truncated via longValue, :148-166), FloatVal as f64
  *    (:167-186); mixed-type IN members of other lanes never match.
  *  - MATCHES is a full match (Pattern.matches, :207) — compiled to an
  *    anchored rlike `^(?:re)$` since rlike is find()-style.
  *  - empty comparand list → false (:133).
  */
object PNodeCompiler {

  /** @param resolve maps positional field indices to column names for
    *   indexed-mode predicates (the reference resolves them through
    *   MetadataLayout; `F<idx>` is its fallback naming).
    */
  def compile(node: PNode, resolve: Int => String = i => s"F$i"): Column = node match {
    case ConjugateNode(isAnd, children) =>
      val cs = children.map(compile(_, resolve))
      if (cs.isEmpty) lit(isAnd) // AND() == true, OR() == false
      else if (isAnd) cs.reduce(_ && _)
      else cs.reduce(_ || _)
    case p: PredicateNode =>
      val name = p.fieldName.getOrElse(resolve(p.field))
      leaf(col(name), p)
  }

  private def leaf(c: Column, p: PredicateNode): Column = {
    import Comparand._
    val hasNullComparand = p.comparands.contains(NullVal)
    val nullCase = lit(p.op == OpType.EQ && hasNullComparand)
    if (p.comparands.isEmpty) return lit(false)

    val body: Column = p.comparands.head match {
      case IntVal(_) =>
        val f = c.cast("long")
        val vs = p.comparands.collect { case IntVal(v) => v }
        numericOps(f, p.op, vs.map(lit(_): Column), c)
      case FloatVal(_) =>
        val f = c.cast("double")
        val vs = p.comparands.collect { case FloatVal(v) => v }
        numericOps(f, p.op, vs.map(lit(_): Column), c)
      case TextVal(_) =>
        val vs = p.comparands.collect { case TextVal(v) => v }
        p.op match {
          case OpType.GT => c > vs.head
          case OpType.LT => c < vs.head
          case OpType.GE => c >= vs.head
          case OpType.LE => c <= vs.head
          case OpType.EQ => c === vs.head
          case OpType.NE => c =!= vs.head
          case OpType.IN => c.isin(vs: _*)
          case OpType.MATCHES => c.rlike("^(?:" + vs.head + ")$")
        }
      case BoolVal(v) =>
        val f = c.cast("boolean")
        p.op match {
          case OpType.EQ => f === v
          case OpType.NE => f =!= v
          case _         => lit(false) // bool supports only EQ/NE (:215-221)
        }
      case NullVal =>
        // non-null field vs NULL comparand: no op matches (:82-84 only
        // handles the null-field side); EQ NULL on a present value is false
        lit(false)
      case BytesVal(_) =>
        lit(false) // evaluator has no bytes comparisons (:131-221)
    }
    when(c.isNull, nullCase).otherwise(coalesce(body, lit(false)))
  }

  private def numericOps(f: Column, op: OpType, vs: Seq[Column], raw: Column): Column = op match {
    case OpType.GT => f > vs.head
    case OpType.LT => f < vs.head
    case OpType.EQ => f === vs.head
    case OpType.NE => f =!= vs.head
    case OpType.GE => f >= vs.head
    case OpType.LE => f <= vs.head
    case OpType.IN => if (vs.isEmpty) lit(false) else f.isin(vs: _*)
    case OpType.MATCHES => lit(false) // MATCHES is text-only (:207)
  }
}

/** Driver-side row evaluator with identical semantics — the analogue of
  * PredicateEvaluator.matches for Map-shaped records; used for point lookups
  * and as the differential-test oracle for the Column compiler.
  */
object PNodeEvaluator {

  /** Row-direct evaluation (no per-row Map construction — the hot path for
    * per-query predicate joins): field lookup via the Row's own schema.
    */
  def matchesRow(node: PNode, row: org.apache.spark.sql.Row,
      resolve: Int => String = i => s"F$i"): Boolean =
    node match {
      case ConjugateNode(true, cs)  => cs.forall(matchesRow(_, row, resolve))
      case ConjugateNode(false, cs) => cs.exists(matchesRow(_, row, resolve))
      case p: PredicateNode =>
        val name = p.fieldName.getOrElse(resolve(p.field))
        val i = row.fieldIndex(name)
        if (row.isNullAt(i)) p.op == OpType.EQ && p.comparands.contains(Comparand.NullVal)
        else leaf(row.get(i), p)
    }

  def matches(node: PNode, record: Map[String, Any], resolve: Int => String = i => s"F$i"): Boolean =
    node match {
      case ConjugateNode(true, cs)  => cs.forall(matches(_, record, resolve))
      case ConjugateNode(false, cs) => cs.exists(matches(_, record, resolve))
      case p: PredicateNode =>
        val name = p.fieldName.getOrElse(resolve(p.field))
        record.getOrElse(name, null) match {
          case null => p.op == OpType.EQ && p.comparands.contains(Comparand.NullVal)
          case v    => leaf(v, p)
        }
    }

  private def leaf(v: Any, p: PredicateNode): Boolean = {
    import Comparand._
    if (p.comparands.isEmpty) return false
    (v, p.comparands.head) match {
      case (n: Number, IntVal(_)) =>
        val fv = n.longValue()
        val vs = p.comparands.collect { case IntVal(x) => x }
        cmp(p.op, fv.compareTo(vs.head), vs.contains(fv))
      case (n: Number, FloatVal(_)) =>
        val fv = n.doubleValue()
        val vs = p.comparands.collect { case FloatVal(x) => x }
        cmp(p.op, fv.compareTo(vs.head), vs.contains(fv))
      case (s: String, TextVal(first)) =>
        val vs = p.comparands.collect { case TextVal(x) => x }
        p.op match {
          case OpType.MATCHES => java.util.regex.Pattern.matches(first, s)
          case OpType.IN      => vs.contains(s)
          case op             => cmp(op, s.compareTo(first), vs.contains(s))
        }
      case (b: Boolean, BoolVal(cv)) =>
        p.op match {
          case OpType.EQ => b == cv
          case OpType.NE => b != cv
          case _         => false
        }
      case _ => false // type mismatch between field and comparand lane
    }
  }

  private def cmp(op: OpType, c: Int, in: => Boolean): Boolean = op match {
    case OpType.GT => c > 0
    case OpType.LT => c < 0
    case OpType.EQ => c == 0
    case OpType.NE => c != 0
    case OpType.GE => c >= 0
    case OpType.LE => c <= 0
    case OpType.IN => in
    case OpType.MATCHES => false
  }
}
