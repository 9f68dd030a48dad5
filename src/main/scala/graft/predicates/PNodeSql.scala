package graft.predicates

/** SQL renderers for PNode trees.
  *
  * `reference` reproduces the reference's PNodeSqlCodec output byte-for-byte
  * (PNodeSqlCodec.java:31-130) including its lossy choices (MATCHES→LIKE,
  * `X'...'` bytes placeholder, `= NULL`).
  *
  * `duckdb` renders the COMPILED semantics (PNodeCompiler) as a DuckDB WHERE
  * fragment — full-match regex, IS NULL for EQ-null, explicit casts matching
  * the comparison lanes — so it can serve as the differential-test oracle.
  */
object PNodeSql {

  // ---- reference dialect (parity with PNodeSqlCodec) ----

  def reference(node: PNode): String = node match {
    case ConjugateNode(isAnd, cs) =>
      cs.map(reference).mkString("(", if (isAnd) " AND " else " OR ", ")")
    case p: PredicateNode =>
      val opStr = p.op match {
        case OpType.MATCHES => "LIKE"
        case o              => o.symbol
      }
      if (p.op == OpType.IN)
        s"${p.effectiveName} $opStr (${p.comparands.map(refComparand).mkString(", ")})"
      else
        s"${p.effectiveName} $opStr ${p.comparands.headOption.map(refComparand).getOrElse("")}".stripTrailing()
  }

  private def refComparand(c: Comparand): String = c match {
    case Comparand.IntVal(v)   => v.toString
    case Comparand.FloatVal(v) => v.toString
    case Comparand.TextVal(s)  => "'" + s.replace("'", "''") + "'"
    case Comparand.BoolVal(b)  => if (b) "TRUE" else "FALSE"
    case Comparand.BytesVal(_) => "X'...'"
    case Comparand.NullVal     => "NULL"
  }

  // ---- CQL dialect (parity with PNodeCqlCodec.java:56-110) ----

  /** CQL WHERE fragment: no parenthesized grouping (flat AND/OR chain),
    * MATCHES rendered as a comment (not a CQL keyword).
    */
  def cql(node: PNode): String = node match {
    case ConjugateNode(isAnd, cs) =>
      cs.map(cql).mkString(if (isAnd) " AND " else " OR ")
    case p: PredicateNode =>
      p.op match {
        case OpType.IN =>
          s"${p.effectiveName} IN (${p.comparands.map(refComparand).mkString(", ")})"
        case OpType.MATCHES =>
          val pat = p.comparands.headOption.collect {
            case Comparand.TextVal(s) => s
            case Comparand.IntVal(v)  => v.toString
          }.getOrElse("")
          s"${p.effectiveName} /* MATCHES */ '$pat'"
        case o =>
          s"${p.effectiveName} ${o.symbol} ${p.comparands.headOption.map(refComparand).getOrElse("")}".stripTrailing()
      }
  }

  // ---- CDDL dialect (P8, diagnostics — PNodeCddlCodec.java:33) ----

  /** CDDL-style schema rendering of a predicate tree: conjugates become
    * grouped maps, leaves become `field: constraint` lines.
    */
  def cddl(node: PNode): String = {
    def render(n: PNode, indent: String): String = n match {
      case ConjugateNode(isAnd, cs) =>
        val kw = if (isAnd) "all-of" else "any-of"
        s"$kw {\n" + cs.map(render(_, indent + "  ")).mkString("\n") + s"\n$indent}"
          .linesIterator.map(indent + _).mkString("\n").stripPrefix(indent)
      case p: PredicateNode =>
        val constraint = p.op match {
          case OpType.EQ => p.comparands.headOption.map(refComparand).getOrElse("null")
          case OpType.IN => p.comparands.map(refComparand).mkString("(", " / ", ")")
          case OpType.MATCHES =>
            "text .regexp " + p.comparands.headOption.map(refComparand).getOrElse("''")
          case o => s"number .${cddlOp(o)} ${p.comparands.headOption.map(refComparand).getOrElse("")}"
        }
        s"$indent${p.effectiveName}: $constraint"
    }
    render(node, "")
  }

  private def cddlOp(op: OpType): String = op match {
    case OpType.GT => "gt"; case OpType.LT => "lt"; case OpType.GE => "ge"
    case OpType.LE => "le"; case OpType.NE => "ne"; case o => o.symbol
  }

  // ---- duckdb dialect (oracle for the compiled semantics) ----

  def duckdb(node: PNode, resolve: Int => String = i => s"F$i"): String = node match {
    case ConjugateNode(isAnd, cs) =>
      if (cs.isEmpty) if (isAnd) "TRUE" else "FALSE"
      else cs.map(duckdb(_, resolve)).mkString("(", if (isAnd) " AND " else " OR ", ")")
    case p: PredicateNode =>
      val f = p.fieldName.getOrElse(resolve(p.field))
      duckLeaf(f, p)
  }

  private def duckLeaf(f: String, p: PredicateNode): String = {
    import Comparand._
    val hasNull = p.comparands.contains(NullVal)
    if (p.op == OpType.EQ && hasNull) return s"$f IS NULL"
    if (p.comparands.isEmpty) return "FALSE"
    p.comparands.head match {
      case IntVal(_) =>
        val vs = p.comparands.collect { case IntVal(v) => v.toString }
        // trunc() mirrors Java Number.longValue()/Spark double->long
        // truncation-toward-zero; DuckDB's bare CAST would round-half-even.
        numericSql(s"CAST(trunc($f) AS BIGINT)", p.op, vs)
      case FloatVal(_) =>
        val vs = p.comparands.collect { case FloatVal(v) => v.toString }
        numericSql(s"CAST($f AS DOUBLE)", p.op, vs)
      case TextVal(_) =>
        val vs = p.comparands.collect { case TextVal(v) => "'" + v.replace("'", "''") + "'" }
        p.op match {
          case OpType.MATCHES =>
            val pat = p.comparands.collect { case TextVal(v) => v }.head
            s"regexp_full_match($f, '${pat.replace("'", "''")}')"
          case OpType.IN => s"$f IN (${vs.mkString(", ")})"
          case o         => s"$f ${o.symbol} ${vs.head}"
        }
      case BoolVal(v) =>
        p.op match {
          case OpType.EQ => s"CAST($f AS BOOLEAN) = $v"
          case OpType.NE => s"CAST($f AS BOOLEAN) != $v"
          case _         => "FALSE"
        }
      case NullVal | BytesVal(_) => "FALSE"
    }
  }

  private def numericSql(f: String, op: OpType, vs: Seq[String]): String = op match {
    case OpType.IN      => if (vs.isEmpty) "FALSE" else s"$f IN (${vs.mkString(", ")})"
    case OpType.MATCHES => "FALSE"
    case o              => s"$f ${o.symbol} ${vs.head}"
  }
}
