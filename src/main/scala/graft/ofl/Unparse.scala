package graft.ofl

/** Renders an AST back to OFL source text that re-parses to the same tree —
  * under the parser mode that can express it: ASTs reachable from the v1
  * grammar re-parse in default mode; sugar-only shapes (bare counting
  * primitives, member-type tests) re-parse under
  * `Parser.parse(_, sugar = true)`. Strings are always quoted (single
  * quotes, falling back to double quotes when the value contains one),
  * which sidesteps every keyword/plain-string ambiguity of the grammar;
  * composite children are parenthesized. */
object Unparse {

  def apply(e: Expr): String = expr(e)

  private def quote(s: String): String =
    if (!s.contains("'")) s"'$s'"
    else if (!s.contains("\"")) "\"" + s + "\""
    else throw new OflTypeException(
      s"string <$s> contains both quote kinds; the grammar has no escapes (cpp:87-100)")

  private def expr(e: Expr): String = e match {
    case Or(cs)  => cs.map(factor).mkString(" or ")
    case And(cs) => cs.map(factor).mkString(" and ")
    case other   => factor(other)
  }

  private def factor(e: Expr): String = e match {
    case And(_) | Or(_) => "(" + expr(e) + ")"
    case Not(c)         => "not " + factor(c)
    case other          => primitive(other)
  }

  private def primitive(e: Expr): String = e match {
    case BoolLit(v)       => if (v) "true" else "false"
    case BoolAttrExpr(a)  => "@" + a.name
    case HasKey(k)        => quote(k)
    case CheckTagStr(k, op, v) =>
      val sym = op match {
        case StrOp.Eq => "=="; case StrOp.Ne => "!="
        case other => throw new OflTypeException(s"CheckTagStr with ${other.name}")
      }
      s"${quote(k)} $sym ${quote(v)}"
    case CheckTagRegex(k, op, pat, ci) =>
      val sym = op match {
        case StrOp.Match => "=~"; case StrOp.NotMatch => "!~"
        case other => throw new OflTypeException(s"CheckTagRegex with ${other.name}")
      }
      s"${quote(k)} $sym ${quote(pat)}" + (if (ci) "i" else "")
    case IntCmp(l, op, r) =>
      val sym = op match {
        case IntOp.Eq => "=="; case IntOp.Ne => "!="; case IntOp.Lt => "<"
        case IntOp.Le => "<="; case IntOp.Gt => ">"; case IntOp.Ge => ">="
      }
      s"${intOperand(l)} $sym ${intOperand(r)}"
    case StrCmp(l, op, r) =>
      val lhs = l match {
        case StrAttrExpr(a) => "@" + a.name
        case other => throw new OflTypeException(s"BIN_STR_OP lhs must be @attr: $other")
      }
      val (sym, rhs) = (op, r) match {
        case (StrOp.Eq, StrLit(v))        => ("==", quote(v))
        case (StrOp.Ne, StrLit(v))        => ("!=", quote(v))
        case (StrOp.PrefixEq, StrLit(v))  => ("=^", quote(v))
        case (StrOp.PrefixNe, StrLit(v))  => ("!^", quote(v))
        case (StrOp.Match, RegexLit(p))   => ("=~", quote(p))
        case (StrOp.NotMatch, RegexLit(p)) => ("!~", quote(p))
        case other => throw new OflTypeException(s"bad BIN_STR_OP: $other")
      }
      s"$lhs $sym $rhs"
    case InIntList(attr, op, values, fromFile) =>
      val a = attr match {
        case IntAttrExpr(x) => "@" + x.name
        case other => throw new OflTypeException(s"IN_INT_LIST attr must be @attr: $other")
      }
      val opS = if (op == ListOp.In) "in" else "not in"
      val list = fromFile match {
        case Some(f) => s"(<${quote(f)})"
        case None    => values.mkString("(", ", ", ")")
      }
      s"$a $opS $list"
    case CountTags(s)    => countExpr("@tags", s)
    case CountNodes(s)   => countExpr("@nodes", s)
    case CountMembers(s) => countExpr("@members", s)
    case Not(_) | And(_) | Or(_) => "(" + expr(e) + ")"
    case IntLit(_) | StrLit(_) | RegexLit(_) | IntAttrExpr(_) | StrAttrExpr(_) =>
      throw new OflTypeException(s"$e is not a primitive (grammar cpp:270-279)")
  }

  private def intOperand(e: Expr): String = e match {
    case IntAttrExpr(a) => "@" + a.name
    case IntLit(v)      => v.toString
    case CountTags(s)   => countExpr("@tags", s)
    case CountNodes(s)  => countExpr("@nodes", s)
    case CountMembers(s) => countExpr("@members", s)
    case other => throw new OflTypeException(
      s"int-comparison operand must be attr|value|counting (cpp:256-258): $other")
  }

  private def countExpr(head: String, sub: Expr): String = sub match {
    case BoolLit(true) => head
    // v2 sugar: the member-type test has no v1 surface syntax; its only
    // parseable rendering is the bare-word form (sugar mode)
    case StrCmp(StrAttrExpr(StrAttr.MType), StrOp.Eq, StrLit(t))
        if head == "@members" =>
      s"$head[$t]"
    case other => s"$head[${expr(other)}]"
  }
}
