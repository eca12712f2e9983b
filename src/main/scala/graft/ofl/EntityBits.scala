package graft.ofl

/** Static entity-kind analysis — the reference's centerpiece optimization
  * (`calc_entities`, reference hpp:273-276, 535-541, 595-601, 653-656,
  * 922-940, 1254-1257, 1311-1314).
  *
  * Every node yields a pair `(maskIfTrue, maskIfFalse)`: the set of element
  * kinds the object can possibly be when the node evaluates true (resp.
  * false). And intersects pairwise, Or unions, Not swaps the pair. The root's
  * `ifTrue` mask drives (a) the never-match abort (reference main.cpp:114-117)
  * and (b) I/O-level restriction — in our engine a `type IN (…)` conjunct that
  * Catalyst turns into partition pruning on the type-partitioned docs table
  * (SURVEY.md §4.1).
  *
  * Masks live in 3 bits (node=1, way=2, relation=4); complement is taken
  * within those 3 bits. (The reference complements over osmium's full
  * entity_bits domain, but its reader masks to nwr kinds anyway, so the
  * observable behavior is identical.)
  */
object EntityBits {
  val Nothing  = 0
  val NodeBit  = 1
  val WayBit   = 2
  val RelBit   = 4
  val Nwr      = 7

  private def not(m: Int): Int = ~m & Nwr

  /** (ifTrue, ifFalse) fold — transcribes calc_entities. */
  def calc(e: Expr): (Int, Int) = e match {
    // default: hpp:273-276
    case BoolLit(_) | IntLit(_) | StrLit(_) | RegexLit(_) | IntAttrExpr(_) |
         StrAttrExpr(_) | HasKey(_) | CheckTagStr(_, _, _) |
         CheckTagRegex(_, _, _, _) | InIntList(_, _, _, _) =>
      (Nwr, Nwr)
    // hpp:535-541
    case And(cs) =>
      cs.foldLeft((Nwr, Nwr)) { case ((t, f), c) =>
        val (ct, cf) = calc(c); (t & ct, f & cf)
      }
    // hpp:595-601
    case Or(cs) =>
      cs.foldLeft((Nothing, Nothing)) { case ((t, f), c) =>
        val (ct, cf) = calc(c); (t | ct, f | cf)
      }
    // hpp:653-656
    case Not(c) => val (t, f) = calc(c); (f, t)
    // hpp:922-940
    case BoolAttrExpr(a) => a match {
      case BoolAttr.IsNode     => (NodeBit, not(NodeBit))
      case BoolAttr.IsWay      => (WayBit, not(WayBit))
      case BoolAttr.IsRelation => (RelBit, not(RelBit))
      case BoolAttr.Visible    => (Nwr, Nwr)
      case BoolAttr.ClosedWay  => (WayBit, not(WayBit))
      case BoolAttr.OpenWay    => (WayBit, not(WayBit))
    }
    // hpp:1028-1032
    case IntCmp(l, _, r) =>
      val (lt, lf) = calc(l); val (rt, rf) = calc(r); (lt & rt, lf & rf)
    // hpp:1128-1132
    case StrCmp(l, _, r) =>
      val (lt, lf) = calc(l); val (rt, rf) = calc(r); (lt & rt, lf & rf)
    // CountTags has no calc_entities override (default nwr/nwr)
    case CountTags(_) => (Nwr, Nwr)
    // hpp:1254-1257
    case CountNodes(_) => (WayBit, not(WayBit))
    // hpp:1311-1314
    case CountMembers(_) => (RelBit, not(RelBit))
  }

  /** The reader-restriction mask — reference `OSMObjectFilter::entities()`
    * (hpp:1615-1617): the ifTrue component of the root pair. */
  def entities(e: Expr): Int = calc(e)._1

  /** Element-kind names for a mask, in node/way/relation order. */
  def names(mask: Int): Seq[String] = {
    val b = Seq.newBuilder[String]
    if ((mask & NodeBit) != 0) b += "node"
    if ((mask & WayBit) != 0) b += "way"
    if ((mask & RelBit) != 0) b += "relation"
    b.result()
  }
}
