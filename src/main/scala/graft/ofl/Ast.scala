package graft.ofl

/** OFL (OSM Filter Language) abstract syntax tree.
  *
  * Node inventory mirrors the reference engine's expression algebra
  * (reference: include/object_filter.hpp:146-169 `expr_node_type`), with the
  * same value/attribute/operator vocabulary. The two dead enum entries of the
  * reference (`string_comp`, `check_has_type`, hpp:159/165) have no
  * implementing class there and no counterpart here.
  *
  * Every node carries a static result type (bool / int / string) like the
  * reference's `BoolExpression` / `IntegerExpression` / `StringExpression`
  * bases (hpp:343-427); cross-type use goes through the coercion rules
  * implemented in [[graft.compile.Compiler]] and the test oracle.
  */
sealed trait Expr extends Product with Serializable

/** Integer attributes — reference hpp:28-46. `Ref` is only legal in the
  * node-ref / member sub-expression contexts (hpp:838-846). */
sealed abstract class IntAttr(val name: String)
object IntAttr {
  case object Id        extends IntAttr("id")
  case object Version   extends IntAttr("version")
  case object Changeset extends IntAttr("changeset")
  case object Uid       extends IntAttr("uid")
  case object Ref       extends IntAttr("ref")
}

/** String attributes — reference hpp:48-64. `User` is object-context;
  * `Key`/`Value` tag-context; `Role` member-context (hpp:874-894). */
sealed abstract class StrAttr(val name: String)
object StrAttr {
  case object User  extends StrAttr("user")
  case object Key   extends StrAttr("key")
  case object Value extends StrAttr("value")
  case object Role  extends StrAttr("role")
  /** v2 extended-syntax only (`@members[way]` sugar, doc/language.md:166-168):
    * the member's element type. The reference grammar has no such attribute;
    * it never appears in default-mode parses. */
  case object MType extends StrAttr("type")
}

/** Boolean attributes — reference hpp:66-86. */
sealed abstract class BoolAttr(val name: String)
object BoolAttr {
  case object IsNode     extends BoolAttr("node")
  case object IsWay      extends BoolAttr("way")
  case object IsRelation extends BoolAttr("relation")
  case object Visible    extends BoolAttr("visible")
  case object ClosedWay  extends BoolAttr("closed_way")
  case object OpenWay    extends BoolAttr("open_way")
}

/** Integer comparison operators — reference hpp:88-108. */
sealed abstract class IntOp(val name: String)
object IntOp {
  case object Eq extends IntOp("equal")
  case object Ne extends IntOp("not_equal")
  case object Lt extends IntOp("less_than")
  case object Le extends IntOp("less_or_equal")
  case object Gt extends IntOp("greater_than")
  case object Ge extends IntOp("greater_or_equal")
}

/** String comparison operators — reference hpp:110-130. `Match`/`NotMatch`
  * are unanchored regex search (hpp:1080-1082, `std::regex_search`). */
sealed abstract class StrOp(val name: String)
object StrOp {
  case object Eq        extends StrOp("equal")
  case object Ne        extends StrOp("not_equal")
  case object PrefixEq  extends StrOp("prefix_equal")
  case object PrefixNe  extends StrOp("prefix_not_equal")
  case object Match     extends StrOp("match")
  case object NotMatch  extends StrOp("not_match")
}

/** List membership operators — reference hpp:132-144. */
sealed abstract class ListOp(val name: String)
object ListOp {
  case object In    extends ListOp("in")
  case object NotIn extends ListOp("not_in")
}

// ---------------------------------------------------------------------------
// Nodes
// ---------------------------------------------------------------------------

/** `true` / `false` literal; also the implicit `[true]` sub-expression
  * (reference hpp:429-465, default sub-expr hpp:1170-1172). */
final case class BoolLit(value: Boolean) extends Expr

/** n-ary conjunction, short-circuit (reference hpp:501-559). The parser
  * collapses 1-element vectors to the child (hpp:199-206), so `children`
  * always has >= 2 elements when built from source text. */
final case class And(children: Vector[Expr]) extends Expr

/** n-ary disjunction (reference hpp:561-619). */
final case class Or(children: Vector[Expr]) extends Expr

/** Negation; swaps the entity-bit pair (reference hpp:621-678). */
final case class Not(child: Expr) extends Expr

/** int64 literal (reference hpp:680-720). */
final case class IntLit(value: Long) extends Expr

/** String literal (reference hpp:722-762). */
final case class StrLit(value: String) extends Expr

/** Regex literal, pre-compiled in the reference with nosubs|optimize
  * (hpp:764-795, 1426-1430). Only ever the RHS of a Match/NotMatch. */
final case class RegexLit(pattern: String) extends Expr

/** `@id @version @changeset @uid` on objects; `@ref` in nested contexts
  * (reference hpp:797-848). */
final case class IntAttrExpr(attr: IntAttr) extends Expr

/** `@user` on objects; `@key`/`@value` on tags; `@role` on members
  * (reference hpp:850-896). */
final case class StrAttrExpr(attr: StrAttr) extends Expr

/** `@node @way @relation @visible @closed_way @open_way`
  * (reference hpp:898-961). */
final case class BoolAttrExpr(attr: BoolAttr) extends Expr

/** Integer comparison over two int-valued sub-expressions
  * (reference hpp:963-1058). */
final case class IntCmp(lhs: Expr, op: IntOp, rhs: Expr) extends Expr

/** String comparison (reference hpp:1060-1155). For Match/NotMatch the RHS
  * must be a [[RegexLit]] (the reference dynamic_casts, hpp:1080-1082). */
final case class StrCmp(lhs: Expr, op: StrOp, rhs: Expr) extends Expr

/** `@tags[p]` — count of tags satisfying p (reference hpp:1157-1202). */
final case class CountTags(sub: Expr) extends Expr

/** `@nodes[p]` — count of way node-refs satisfying p; 0 for non-ways
  * (reference hpp:1204-1259). */
final case class CountNodes(sub: Expr) extends Expr

/** `@members[p]` — count of relation members satisfying p; 0 for
  * non-relations (reference hpp:1261-1316). */
final case class CountMembers(sub: Expr) extends Expr

/** Bare string ⇒ "has tag key k" (reference hpp:1318-1346). */
final case class HasKey(key: String) extends Expr

/** `k == v` / `k != v` tag lookup; missing key ⇒ false for BOTH ops
  * (reference hpp:1348-1399, eval hpp:1390-1397). Op is Eq or Ne only. */
final case class CheckTagStr(key: String, op: StrOp, value: String) extends Expr

/** `k =~ re` / `k !~ re` with optional `i` flag; missing key ⇒ false for
  * both ops (reference hpp:1401-1466). Op is Match or NotMatch only. */
final case class CheckTagRegex(key: String, op: StrOp, pattern: String,
                               ignoreCase: Boolean) extends Expr

/** `ATTR in (v, …)` / `ATTR not in (v, …)` / `ATTR in (<'file')`.
  * Membership is tested on the raw 64-bit pattern — the reference casts to
  * uint64 (hpp:1522, 1533, 1564); a Scala Long carries the same 64 bits, so
  * never range-check. Inline values preserve source order for the golden
  * pretty-print (IdSetSmall appends in order). */
final case class InIntList(attr: Expr, op: ListOp, values: Vector[Long],
                           fromFile: Option[String]) extends Expr

// ---------------------------------------------------------------------------
// Errors
// ---------------------------------------------------------------------------

/** Mirrors the reference's `expression_parser_error` (hpp:1570-1597):
  * pos == -1 for a grammar failure (reference: qi::fail), pos >= 0 for
  * trailing garbage after a successful prefix parse (main path
  * object_filter.cpp:339-345). `expecting` carries the expectation-point
  * diagnostic the reference emits via qi::on_error<fail>
  * (object_filter.cpp:310-317): the expected rule/token and the position the
  * expectation failed at; the message reproduces the reference's
  * `ERROR: Expecting <what> here: "<rest-of-input>"` shape. */
final class OflParseException(val input: String, val pos: Int,
                              val expecting: Option[(String, Int)] = None)
  extends RuntimeException(
    expecting match {
      case Some((what, at)) =>
        "ERROR: Expecting " + what + " here: \"" +
          input.substring(math.min(math.max(at, 0), input.length)) + "\""
      case None =>
        if (pos >= 0) s"Expression parsing error at position $pos"
        else "Expression parsing error"
    })

/** Compile-time context/typing error. Deliberate deviation from the
  * reference, which throws at eval time (hpp:293-339); we fail earlier,
  * never differently on valid inputs (SURVEY.md §7.4 #8). */
final class OflTypeException(msg: String) extends RuntimeException(msg)
