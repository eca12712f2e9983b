package graft.ofl

import scala.util.control.ControlThrowable

/** Recursive-descent PEG parser for OFL, transcribing the reference's
  * Boost.Spirit Qi grammar rule-for-rule (src/object_filter.cpp:39-321) with
  * identical ordered-alternative, backtracking, and expectation semantics:
  *
  *  - alternatives commit PEG-style: once an alternative succeeds the choice
  *    never reconsiders (Qi `|`);
  *  - `>>` sequences backtrack as a whole; `>` points are expectations that
  *    abort the entire parse (Qi on_error<fail>, cpp:310-317) — a failed
  *    parse without position, mirroring `expression_parser_error{input}`
  *    (cpp:339-341);
  *  - keywords are character literals, not tokens: `note` parses as
  *    `not (e)`, exactly as in the reference;
  *  - the skipper is whitespace or `#`-to-EOL comments (cpp:27-36), applied
  *    before every primitive and once after the whole parse (phrase_parse
  *    post-skip); trailing garbage raises the position-carrying error
  *    (cpp:343-345).
  */
object Parser {

  /** Parse an OFL expression. `sugar = true` enables the v2 EXTENDED SYNTAX
    * the reference DOCUMENTS but its grammar rejects (README.md:76,
    * doc/language.md:123-168): bare integer ⇒ `@id == N`; bare
    * `node`/`way`/`relation` ⇒ entity test (shadowing the has-key reading of
    * those three words — documented deviation, which is why the mode is
    * default-OFF); `@nodes[17]`/`@members[17]` ⇒ `[@ref == 17]`;
    * `@members[way]` ⇒ member-type test; `@members['inner']` ⇒ member-role
    * test. Default mode stays bit-for-bit reference-parity (golden-tested).
    * Out of scope even in sugar mode (no reference eval semantics to conform
    * to): `@timestamp` comparisons and string-list `in` files. */
  def parse(input: String, sugar: Boolean = false): Expr = {
    val s = new State(input, sugar)
    val root =
      try s.expression()
      catch {
        case ExpectFail(what, at) =>
          throw new OflParseException(input, -1, Some((what, at)))
      }
    root match {
      case None => throw new OflParseException(input, -1)
      case Some(e) =>
        s.skip() // qi::skip_flag::postskip
        if (s.pos != input.length) throw new OflParseException(input, s.pos)
        e
    }
  }

  /** Sub-expression context for sugar desugaring (which collection the
    * bracket belongs to). */
  private sealed trait SubCtx
  private case object TagsSub extends SubCtx
  private case object NdsSub extends SubCtx
  private case object MembersSub extends SubCtx

  /** Expectation failure — aborts the whole parse (Qi `>` + on_error<fail>),
    * carrying what was expected and where, for the reference-shaped
    * `ERROR: Expecting <what> here: "<rest>"` diagnostic
    * (object_filter.cpp:310-317). */
  private final case class ExpectFail(expected: String, at: Int)
    extends ControlThrowable

  private final class State(val in: String, val sugar: Boolean = false) {
    var pos: Int = 0
    private val len = in.length

    /** Raise an expectation failure at the current (post-skip) position. */
    def expectFail(what: String): Nothing = { skip(); throw ExpectFail(what, pos) }

    // --- skipper: cpp:27-36 ------------------------------------------------
    def skip(): Unit = {
      var progressed = true
      while (progressed) {
        progressed = false
        while (pos < len && Character.isWhitespace(in.charAt(pos))) {
          pos += 1; progressed = true
        }
        if (pos < len && in.charAt(pos) == '#') {
          pos += 1
          while (pos < len && in.charAt(pos) != '\n') pos += 1
          if (pos < len) pos += 1 // consume '\n'
          progressed = true
        }
      }
    }

    // --- primitives ---------------------------------------------------------
    /** Character-literal string match with pre-skip (qi::lit under a
      * phrase parser). No internal skipping: `lit("not in")` requires the
      * exact text "not in" with a single space. */
    def lit(s: String): Boolean = {
      val save = pos
      skip()
      if (in.regionMatches(pos, s, 0, s.length)) { pos += s.length; true }
      else { pos = save; false }
    }

    /** qi::lexeme single/double quoted string: cpp:87-100. No escapes; the
      * closing quote is an expectation (`>`). */
    private def quoted(q: Char): Option[String] = {
      val save = pos
      skip()
      if (pos < len && in.charAt(pos) == q) {
        pos += 1
        val start = pos
        while (pos < len && in.charAt(pos) != q) pos += 1
        if (pos >= len) throw ExpectFail(s"'$q'", pos) // missing closing quote
        val s = in.substring(start, pos)
        pos += 1
        Some(s)
      } else { pos = save; None }
    }

    /** plain string: cpp:103-107 — `[a-zA-Z][a-zA-Z0-9:_]*`, lexeme. */
    private def plainString(): Option[String] = {
      val save = pos
      skip()
      if (pos < len && isAlpha(in.charAt(pos))) {
        val start = pos
        pos += 1
        while (pos < len && isPlainCont(in.charAt(pos))) pos += 1
        Some(in.substring(start, pos))
      } else { pos = save; None }
    }

    private def isAlpha(c: Char) =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
    private def isPlainCont(c: Char) =
      isAlpha(c) || (c >= '0' && c <= '9') || c == ':' || c == '_'

    /** any kind of string: cpp:110-113 (plain | single | double). */
    def string(): Option[String] =
      plainString().orElse(quoted('\'')).orElse(quoted('"'))

    /** qi::int_parser<int64>: optional sign + digits; fails (backtracks) on
      * overflow, like Qi's extract_int. Lexeme with pre-skip. */
    def int64(): Option[Long] = {
      val save = pos
      skip()
      var p = pos
      var neg = false
      if (p < len && (in.charAt(p) == '-' || in.charAt(p) == '+')) {
        neg = in.charAt(p) == '-'; p += 1
      }
      val dstart = p
      while (p < len && in.charAt(p) >= '0' && in.charAt(p) <= '9') p += 1
      if (p == dstart) { pos = save; return None }
      // accumulate negatively to represent Long.MinValue without overflow
      var acc = 0L
      var i = dstart
      while (i < p) {
        val d = in.charAt(i) - '0'
        if (acc < (Long.MinValue + d) / 10) { pos = save; return None }
        acc = acc * 10 - d
        i += 1
      }
      if (!neg && acc == Long.MinValue) { pos = save; return None }
      pos = p
      Some(if (neg) acc else -acc)
    }

    private def first[T](alts: (() => Option[T])*): Option[T] = {
      for (a <- alts) { val r = a(); if (r.isDefined) return r }
      None
    }

    // --- operators: cpp:116-138 ---------------------------------------------
    def operInt(): Option[IntOp] =
      if (lit("==")) Some(IntOp.Eq)
      else if (lit("!=")) Some(IntOp.Ne)
      else if (lit("<=")) Some(IntOp.Le)
      else if (lit("<")) Some(IntOp.Lt)
      else if (lit(">=")) Some(IntOp.Ge)
      else if (lit(">")) Some(IntOp.Gt)
      else None

    def operStr(): Option[StrOp] =
      if (lit("==")) Some(StrOp.Eq)
      else if (lit("!=")) Some(StrOp.Ne)
      else if (lit("=^")) Some(StrOp.PrefixEq)
      else if (lit("!^")) Some(StrOp.PrefixNe)
      else None

    def operRegex(): Option[StrOp] =
      if (lit("=~")) Some(StrOp.Match)
      else if (lit("!~")) Some(StrOp.NotMatch)
      else None

    def operList(): Option[ListOp] =
      if (lit("in")) Some(ListOp.In)
      else if (lit("not in")) Some(ListOp.NotIn)
      else None

    // --- attributes: cpp:141-162 ---------------------------------------------
    def attrInt(): Option[IntAttrExpr] =
      if (lit("@id")) Some(IntAttrExpr(IntAttr.Id))
      else if (lit("@version")) Some(IntAttrExpr(IntAttr.Version))
      else if (lit("@uid")) Some(IntAttrExpr(IntAttr.Uid))
      else if (lit("@changeset")) Some(IntAttrExpr(IntAttr.Changeset))
      else if (lit("@ref")) Some(IntAttrExpr(IntAttr.Ref))
      else None

    def attrStr(): Option[StrAttrExpr] =
      if (lit("@user")) Some(StrAttrExpr(StrAttr.User))
      else if (lit("@key")) Some(StrAttrExpr(StrAttr.Key))
      else if (lit("@value")) Some(StrAttrExpr(StrAttr.Value))
      else if (lit("@role")) Some(StrAttrExpr(StrAttr.Role))
      else None

    /** Deliberate deviation (documented): in the reference grammar,
      * primitive-initial `@nodes[...]` is swallowed by qi::lit("@node")
      * (attr_boolean precedes binary_int_oper in `primitive`, cpp:270-279),
      * so the reference CLI REJECTS the counting syntax its own
      * doc/language.md:123,148-159 documents ("@nodes[] > 17") with a
      * trailing-garbage error. We refuse to match `@node` when the next char
      * is 's', which accepts the documented language while never differing
      * from the reference on inputs it parses successfully. */
    private def litNodeNotNodes(): Boolean = {
      val save = pos
      if (lit("@node")) {
        if (pos < len && in.charAt(pos) == 's') { pos = save; false } else true
      } else false
    }

    def attrBoolean(): Option[BoolAttrExpr] =
      if (litNodeNotNodes()) Some(BoolAttrExpr(BoolAttr.IsNode))
      else if (lit("@way")) Some(BoolAttrExpr(BoolAttr.IsWay))
      else if (lit("@relation")) Some(BoolAttrExpr(BoolAttr.IsRelation))
      else if (lit("@visible")) Some(BoolAttrExpr(BoolAttr.Visible))
      else if (lit("@closed_way")) Some(BoolAttrExpr(BoolAttr.ClosedWay))
      else if (lit("@open_way")) Some(BoolAttrExpr(BoolAttr.OpenWay))
      else None

    // --- tag checks: cpp:190-210 ---------------------------------------------
    private def tagStr(): Option[Expr] = {
      val save = pos
      val r = for {
        k  <- string()
        op <- operStr()
        v  <- string()
      } yield CheckTagStr(k, op, v)
      if (r.isEmpty) pos = save
      r
    }

    private def tagRegex(): Option[Expr] = {
      val save = pos
      val r = for {
        k  <- string()
        op <- operRegex()
        v  <- string()
      } yield {
        // optional 'i' flag: cpp:202 `-ascii::char_('i')` — pre-skips
        val ciSave = pos
        skip()
        val ci = pos < len && in.charAt(pos) == 'i'
        if (ci) pos += 1 else pos = ciSave
        CheckTagRegex(k, op, v, ci)
      }
      if (r.isEmpty) pos = save
      r
    }

    def tag(): Option[Expr] = tagStr().orElse(tagRegex())

    // --- sub-expressions: cpp:212-225 -----------------------------------------
    /** `[ expression ]` with expectations, or the implicit TRUE. In sugar
      * mode, `[17]` inside @nodes/@members desugars to `[@ref == 17]`, and
      * inside @members `[way]`/`['inner']` desugar to member-type / role
      * tests (doc/language.md:144-168). */
    def subexpression(ctx: SubCtx = TagsSub): Expr = {
      if (lit("[")) {
        val sugared: Option[Expr] =
          if (!sugar || ctx == TagsSub) None
          else {
            val save = pos
            val e: Option[Expr] = int64()
              .map(n => IntCmp(IntAttrExpr(IntAttr.Ref), IntOp.Eq, IntLit(n)))
              .orElse(if (ctx == MembersSub) memberSugar() else None)
            e.filter(_ => lit("]")).orElse { pos = save; None }
          }
        sugared.getOrElse {
          val e = expression().getOrElse(expectFail("expression"))
          if (!lit("]")) expectFail("']'")
          e
        }
      } else BoolLit(true) // static_true: cpp:165
    }

    /** `way` ⇒ member-type test; `'inner'` ⇒ member-role test. */
    private def memberSugar(): Option[Expr] = {
      val save = pos
      plainString() match {
        case Some(t @ ("node" | "way" | "relation")) =>
          Some(StrCmp(StrAttrExpr(StrAttr.MType), StrOp.Eq, StrLit(t)))
        case Some(_) => pos = save; None
        case None =>
          quoted('\'').orElse(quoted('"'))
            .map(r => StrCmp(StrAttrExpr(StrAttr.Role), StrOp.Eq, StrLit(r)))
      }
    }

    def subexprInt(): Option[Expr] = {
      if (lit("@tags")) Some(CountTags(subexpression(TagsSub)))
      else if (lit("@nodes")) Some(CountNodes(subexpression(NdsSub)))
      else if (lit("@members")) Some(CountMembers(subexpression(MembersSub)))
      else None
    }

    // --- int comparison: cpp:250-262 -------------------------------------------
    private def intOperand(): Option[Expr] =
      first[Expr](
        () => attrInt(),
        () => int64().map(IntLit),
        () => subexprInt())

    private def binaryIntOper(): Option[Expr] = {
      val save = pos
      val r = for {
        l  <- intOperand()
        op <- operInt()
        x  <- intOperand()
      } yield IntCmp(l, op, x)
      if (r.isEmpty) pos = save
      r
    }

    // --- string comparison: cpp:264-268 -----------------------------------------
    private def binaryStrOper(): Option[Expr] = {
      val save = pos
      val a = for {
        l  <- attrStr()
        op <- operStr()
        v  <- string()
      } yield StrCmp(l, op, StrLit(v))
      a match {
        case some @ Some(_) => some
        case None =>
          pos = save
          val b = for {
            l  <- attrStr()
            op <- operRegex()
            v  <- string()
          } yield StrCmp(l, op, RegexLit(v))
          if (b.isEmpty) pos = save
          b
      }
    }

    // --- id lists: cpp:227-248 ----------------------------------------------------
    private def intListValue(): Option[Vector[Long]] = {
      val save = pos
      if (!lit("(")) return None
      int64() match {
        case None => pos = save; None
        case Some(h) =>
          val b = Vector.newBuilder[Long]
          b += h
          var ok = true
          while (ok) {
            val s2 = pos
            if (lit(",")) int64() match {
              case Some(v) => b += v
              case None => pos = s2; ok = false
            } else ok = false
          }
          if (lit(")")) Some(b.result()) else { pos = save; None }
      }
    }

    private def listFromFilename(): Option[String] = {
      val save = pos
      val r = if (lit("(") && lit("<")) string() match {
        case Some(f) if lit(")") => Some(f)
        case _ => None
      } else None
      if (r.isEmpty) pos = save
      r
    }

    private def inIntList(): Option[Expr] = {
      // in_int_list_values first, then in_int_list_filename (cpp:277-278)
      val save = pos
      val values = for {
        a  <- attrInt()
        op <- operList()
        vs <- intListValue()
      } yield InIntList(a, op, vs, None)
      values match {
        case some @ Some(_) => some
        case None =>
          pos = save
          val file = for {
            a  <- attrInt()
            op <- operList()
            f  <- listFromFilename()
          } yield InIntList(a, op, Vector.empty, Some(f))
          if (file.isEmpty) pos = save
          file
      }
    }

    /** sugar: bare `node`/`way`/`relation` ⇒ entity test (README.md:80-85).
      * Tried AFTER tag() so `node == x` stays a tag check, BEFORE has-key so
      * the three entity words shadow their has-key reading. */
    private def entityWordSugar(): Option[Expr] = {
      val save = pos
      plainString() match {
        case Some("node")     => Some(BoolAttrExpr(BoolAttr.IsNode))
        case Some("way")      => Some(BoolAttrExpr(BoolAttr.IsWay))
        case Some("relation") => Some(BoolAttrExpr(BoolAttr.IsRelation))
        case _                => pos = save; None
      }
    }

    // --- primitive: cpp:270-279 (alternative order is semantic!) -----------------
    def primitive(): Option[Expr] =
      first[Expr](
        () => if (lit("true")) Some(BoolLit(true)) else None,
        () => if (lit("false")) Some(BoolLit(false)) else None,
        () => attrBoolean(),
        () => tag(),
        () => if (sugar) entityWordSugar() else None,
        () => string().map(HasKey),
        () => binaryIntOper(),
        () => binaryStrOper(),
        () => inIntList(),
        // sugar: bare counting expressions decay to bool ("@tags — has any
        // tags", "@nodes[17] and @nodes[18]", doc/language.md:123-155);
        // placed after the comparison forms so `@nodes[17] > 2` keeps its
        // binary_int_oper reading
        () => if (sugar) subexprInt() else None,
        // sugar: bare integer ⇒ `@id == N` (README.md:76); last so that
        // `123 == 4` keeps its binary_int_oper reading
        () => if (sugar)
          int64().map(n => IntCmp(IntAttrExpr(IntAttr.Id), IntOp.Eq, IntLit(n)))
        else None)

    // --- factor / term / expression: cpp:281-308 -----------------------------------
    private def parenExpression(): Option[Expr] = {
      if (lit("(")) {
        val e = expression().getOrElse(expectFail("expression"))
        if (!lit(")")) expectFail("')'")
        Some(e)
      } else None
    }

    private def notFactor(): Option[Expr] =
      if (lit("not")) Some(Not(factor().getOrElse(expectFail("factor"))))
      else None

    def factor(): Option[Expr] =
      first[Expr](() => notFactor(), () => parenExpression(), () => primitive())

    /** `a % lit(kw)` — Qi list: backtracks the separator if the following
      * element fails. Singleton lists collapse (reference hpp:199-206). */
    private def sepList(elem: () => Option[Expr], kw: String): Option[Vector[Expr]] =
      elem().map { h =>
        val b = Vector.newBuilder[Expr]
        b += h
        var ok = true
        while (ok) {
          val save = pos
          if (lit(kw)) elem() match {
            case Some(e) => b += e
            case None => pos = save; ok = false
          } else ok = false
        }
        b.result()
      }

    def term(): Option[Expr] =
      sepList(() => factor(), "and").map(v => if (v.size == 1) v.head else And(v))

    def expression(): Option[Expr] =
      sepList(() => term(), "or").map(v => if (v.size == 1) v.head else Or(v))
  }
}
