package graft.oracle

import graft.ofl._
import graft.model.OsmElement

/** Executable transcription of the reference's eval code
  * (include/object_filter.hpp:343-1568) over driver-side fixture elements.
  * The reference C++ binary cannot be built in this sandbox (no
  * libosmium/boost), so this row-by-row interpreter IS the conformance
  * oracle: it copies the coercion layers (hpp:343-427), short-circuit
  * And/Or (hpp:504-570), missing-key-false tag checks (hpp:1390-1397,
  * 1457-1464), non-way/non-relation zero counts (hpp:1244-1246, 1301-1303),
  * and uint64 id-set membership (hpp:1561-1566) literally.
  */
object OracleEval {

  sealed trait Row
  final case class ObjRow(el: OsmElement) extends Row
  final case class TagRow(key: String, value: String) extends Row
  final case class NdRow(ref: Long) extends Row
  final case class MemberRow(mtype: String, ref: Long, role: String) extends Row

  type IdLoader = String => Set[Long]
  val noFiles: IdLoader = f => throw new OflTypeException(s"no id file: $f")

  def matches(e: Expr, el: OsmElement, ld: IdLoader = noFiles): Boolean =
    evalBool(e, ObjRow(el), ld)

  // --- coercion dispatch, mirroring the three abstract bases ------------------

  def evalBool(e: Expr, r: Row, ld: IdLoader): Boolean = e match {
    // BoolExpression natives
    case BoolLit(v) => v
    case And(cs)    => cs.forall(evalBool(_, r, ld))   // find_if first false
    case Or(cs)     => cs.exists(evalBool(_, r, ld))
    case Not(c)     => !evalBool(c, r, ld)
    case BoolAttrExpr(a) => r match {
      case ObjRow(el) => a match {
        case BoolAttr.IsNode     => el.otype == "node"
        case BoolAttr.IsWay      => el.otype == "way"
        case BoolAttr.IsRelation => el.otype == "relation"
        case BoolAttr.Visible    => el.visible
        case BoolAttr.ClosedWay  =>
          el.otype == "way" && el.nds.nonEmpty && el.nds.head == el.nds.last
        case BoolAttr.OpenWay    =>
          el.otype == "way" && !(el.nds.nonEmpty && el.nds.head == el.nds.last)
      }
      case _ => throw new OflTypeException("bool attr outside object context")
    }
    case IntCmp(l, op, rr) =>
      val (a, b) = (evalInt(l, r, ld), evalInt(rr, r, ld))
      op match {
        case IntOp.Eq => a == b; case IntOp.Ne => a != b
        case IntOp.Lt => a < b;  case IntOp.Le => a <= b
        case IntOp.Gt => a > b;  case IntOp.Ge => a >= b
      }
    case StrCmp(l, op, rr) =>
      val a = evalStr(l, r)
      op match {
        case StrOp.Eq       => a == evalStr(rr, r)
        case StrOp.Ne       => a != evalStr(rr, r)
        case StrOp.PrefixEq => a.startsWith(evalStr(rr, r))
        case StrOp.PrefixNe => !a.startsWith(evalStr(rr, r))
        case StrOp.Match    => regexSearch(patternOf(rr, ci = false), a)
        case StrOp.NotMatch => !regexSearch(patternOf(rr, ci = false), a)
      }
    case HasKey(k) => r match {
      case ObjRow(el) => el.tags.exists(_._1 == k)
      case _ => throw new OflTypeException("has-key outside object context")
    }
    case CheckTagStr(k, op, v) => r match {
      case ObjRow(el) =>
        el.tags.find(_._1 == k) match {                 // first match: hpp:1391
          case None => false                            // missing key ⇒ false
          case Some((_, tv)) =>
            val eq = tv == v
            if (op == StrOp.Eq) eq else !eq
        }
      case _ => throw new OflTypeException("tag check outside object context")
    }
    case CheckTagRegex(k, op, pat, ci) => r match {
      case ObjRow(el) =>
        el.tags.find(_._1 == k) match {
          case None => false
          case Some((_, tv)) =>
            val m = regexSearch(if (ci) "(?i)" + pat else pat, tv)
            if (op == StrOp.Match) m else !m
        }
      case _ => throw new OflTypeException("tag check outside object context")
    }
    case InIntList(attr, op, values, fromFile) =>
      r match {
        case ObjRow(_) => // eval_bool(OSMObject) only — hpp:1561
        case _ => throw new OflTypeException("in-list outside object context")
      }
      val set: Set[Long] = fromFile.map(ld).getOrElse(values.toSet)
      val v = evalInt(attr, r, ld)                       // raw 64-bit pattern
      set.contains(v) == (op == ListOp.In)
    // IntegerExpression / StringExpression decaying to bool (hpp:365-427)
    case IntLit(_) | IntAttrExpr(_) | CountTags(_) | CountNodes(_) |
         CountMembers(_) => evalInt(e, r, ld) > 0       // > 0, NOT != 0
    case StrLit(_) | StrAttrExpr(_) => evalStr(e, r).nonEmpty
    case RegexLit(_) => throw new OflTypeException("regex literal in bool context")
  }

  def evalInt(e: Expr, r: Row, ld: IdLoader): Long = e match {
    case IntLit(v) => v
    case IntAttrExpr(a) => (a, r) match {
      case (IntAttr.Id, ObjRow(el))        => el.id
      case (IntAttr.Version, ObjRow(el))   => el.version
      case (IntAttr.Changeset, ObjRow(el)) => el.changeset
      case (IntAttr.Uid, ObjRow(el))       => el.uid
      case (IntAttr.Ref, NdRow(ref))       => ref
      case (IntAttr.Ref, MemberRow(_, ref, _)) => ref
      case _ => throw new OflTypeException(s"@${a.name} invalid in this context")
    }
    case CountTags(sub) => r match {
      case ObjRow(el) =>
        el.tags.count { case (k, v) => evalBool(sub, TagRow(k, v), ld) }.toLong
      case _ => throw new OflTypeException("@tags outside object context")
    }
    case CountNodes(sub) => r match {
      case ObjRow(el) =>
        if (el.otype != "way") 0L
        else el.nds.count(ref => evalBool(sub, NdRow(ref), ld)).toLong
      case _ => throw new OflTypeException("@nodes outside object context")
    }
    case CountMembers(sub) => r match {
      case ObjRow(el) =>
        if (el.otype != "relation") 0L
        else el.members.count { case (t, ref, role) =>
          evalBool(sub, MemberRow(t, ref, role), ld)
        }.toLong
      case _ => throw new OflTypeException("@members outside object context")
    }
    case StrLit(_) | StrAttrExpr(_) => atoll(evalStr(e, r))
    case other => if (evalBool(other, r, ld)) 1L else 0L  // bool→int (hpp:343-362)
  }

  def evalStr(e: Expr, r: Row): String = e match {
    case StrLit(v) => v
    case StrAttrExpr(a) => (a, r) match {
      case (StrAttr.User, ObjRow(el))          => el.user
      case (StrAttr.Key, TagRow(k, _))         => k
      case (StrAttr.Value, TagRow(_, v))       => v
      case (StrAttr.Role, MemberRow(_, _, ro)) => ro
      case _ => throw new OflTypeException(s"@${a.name} invalid in this context")
    }
    case other => throw new OflTypeException(s"Expected a string expression: $other")
  }

  private def patternOf(e: Expr, ci: Boolean): String = e match {
    case RegexLit(p) => if (ci) "(?i)" + p else p
    case other => throw new OflTypeException(s"regex rhs expected: $other")
  }

  /** Unanchored search — std::regex_search ≈ java Matcher.find. */
  def regexSearch(pattern: String, s: String): Boolean =
    java.util.regex.Pattern.compile(pattern).matcher(s).find()

  /** C atoll: leading whitespace, optional sign, leading digits, else 0. */
  def atoll(s: String): Long = {
    var i = 0
    while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
    var neg = false
    if (i < s.length && (s.charAt(i) == '+' || s.charAt(i) == '-')) {
      neg = s.charAt(i) == '-'; i += 1
    }
    var acc = 0L
    var digits = 0
    while (i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '9' && digits < 18) {
      acc = acc * 10 + (s.charAt(i) - '0'); i += 1; digits += 1
    }
    if (digits == 0) 0L else if (neg) -acc else acc
  }
}
