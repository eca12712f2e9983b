package graft.ofl

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests over grammar-reachable ASTs (deterministic seeds):
  *  - unparse → parse is the identity (structural equality),
  *  - pretty/entity-bits are total and 3-bit bounded,
  *  - the compiled Spark predicate agrees with the reference-semantics
  *    oracle under effective (mask-conjunct) semantics on fixture elements.
  */
class PropertySpec extends AnyFunSuite {

  private val params = Gen.Parameters.default

  private val sampleScale: Int = {
    val raw = sys.env.getOrElse("GRAFT_PROP_SCALE", "1")
    val v = try raw.toInt catch {
      case _: NumberFormatException =>
        fail(s"GRAFT_PROP_SCALE must be a positive integer, got <$raw>")
    }
    require(v >= 1, s"GRAFT_PROP_SCALE must be >= 1, got $v")
    v
  }

  private def samples[T](g: Gen[T], n0: Int): Seq[T] = {
    val n = n0 * sampleScale
    (1 to n * 3).iterator.flatMap(i => g.apply(params, Seed(i.toLong)))
      .take(n).toSeq
  }

  // --- grammar-reachable AST generator ---------------------------------------

  private val word: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n,
      Gen.oneOf(('a' to 'z') ++ ('0' to '9') ++ Seq(':', '_', ' '))).map(_.mkString))

  private val keyGen: Gen[String] =
    Gen.oneOf(Gen.oneOf(graft.fixtures.DeterministicGen.keyPool), word)

  private val valueGen: Gen[String] =
    Gen.oneOf(Gen.oneOf(graft.fixtures.DeterministicGen.highwayValues ++
      graft.fixtures.DeterministicGen.genericValues), word)

  private val regexGen: Gen[String] = Gen.oneOf(
    "primary", "_link$", "^addr:", "a.", "[0-9]+", "^(water|tree)$", "main",
    "es", "^$")

  private val intOpGen = Gen.oneOf(IntOp.Eq, IntOp.Ne, IntOp.Lt, IntOp.Le, IntOp.Gt, IntOp.Ge)
  private val objIntAttr = Gen.oneOf(IntAttr.Id, IntAttr.Version, IntAttr.Changeset, IntAttr.Uid)
  private val smallInt: Gen[Long] =
    Gen.oneOf(Gen.choose(-5L, 30L), Gen.choose(-2000L, 900000L))

  private def tagSub: Gen[Expr] = {
    val leaf: Gen[Expr] = Gen.oneOf(
      Gen.const(BoolLit(true)), Gen.const(BoolLit(false)),
      valueGen.map(v => StrCmp(StrAttrExpr(StrAttr.Key), StrOp.Eq, StrLit(v))),
      valueGen.map(v => StrCmp(StrAttrExpr(StrAttr.Value), StrOp.Eq, StrLit(v))),
      regexGen.map(p => StrCmp(StrAttrExpr(StrAttr.Value), StrOp.Match, RegexLit(p))),
      valueGen.map(v => StrCmp(StrAttrExpr(StrAttr.Key), StrOp.PrefixEq, StrLit(v))))
    Gen.oneOf(leaf,
      Gen.listOfN(2, leaf).map(l => And(l.toVector)),
      Gen.listOfN(2, leaf).map(l => Or(l.toVector)),
      leaf.map(Not(_)))
  }

  private def ndSub: Gen[Expr] = Gen.oneOf(
    Gen.const(BoolLit(true)),
    Gen.zip(intOpGen, smallInt).map { case (op, v) =>
      IntCmp(IntAttrExpr(IntAttr.Ref), op, IntLit(v)) })

  private def memberSub: Gen[Expr] = Gen.oneOf(
    Gen.const(BoolLit(true)),
    Gen.oneOf("inner", "outer", "", "stop").map(r =>
      StrCmp(StrAttrExpr(StrAttr.Role), StrOp.Eq, StrLit(r))),
    Gen.zip(intOpGen, smallInt).map { case (op, v) =>
      IntCmp(IntAttrExpr(IntAttr.Ref), op, IntLit(v)) })

  private def countGen: Gen[Expr] = Gen.oneOf(
    tagSub.map(CountTags(_)), ndSub.map(CountNodes(_)), memberSub.map(CountMembers(_)))

  private def intOperandGen: Gen[Expr] = Gen.oneOf(
    objIntAttr.map(IntAttrExpr(_)), smallInt.map(IntLit(_)), countGen)

  private def primitiveGen: Gen[Expr] = Gen.oneOf(
    Gen.oneOf(true, false).map(BoolLit(_)),
    Gen.oneOf(BoolAttr.IsNode, BoolAttr.IsWay, BoolAttr.IsRelation,
      BoolAttr.Visible, BoolAttr.ClosedWay, BoolAttr.OpenWay).map(BoolAttrExpr(_)),
    keyGen.map(HasKey(_)),
    Gen.zip(keyGen, Gen.oneOf(StrOp.Eq, StrOp.Ne), valueGen)
      .map { case (k, op, v) => CheckTagStr(k, op, v) },
    Gen.zip(keyGen, Gen.oneOf(StrOp.Match, StrOp.NotMatch), regexGen,
      Gen.oneOf(true, false))
      .map { case (k, op, p, ci) => CheckTagRegex(k, op, p, ci) },
    Gen.zip(intOperandGen, intOpGen, intOperandGen)
      .map { case (l, op, r) => IntCmp(l, op, r) },
    Gen.zip(Gen.oneOf(StrOp.Eq, StrOp.Ne, StrOp.PrefixEq, StrOp.PrefixNe), valueGen)
      .map { case (op, v) => StrCmp(StrAttrExpr(StrAttr.User), op, StrLit(v)) },
    Gen.zip(Gen.oneOf(StrOp.Match, StrOp.NotMatch), regexGen)
      .map { case (op, p) => StrCmp(StrAttrExpr(StrAttr.User), op, RegexLit(p)) },
    Gen.zip(objIntAttr, Gen.oneOf(ListOp.In, ListOp.NotIn),
      Gen.nonEmptyListOf(smallInt))
      .map { case (a, op, vs) => InIntList(IntAttrExpr(a), op, vs.toVector, None) })

  private def exprGen(depth: Int): Gen[Expr] =
    if (depth <= 0) primitiveGen
    else Gen.frequency(
      4 -> primitiveGen,
      2 -> Gen.choose(2, 3).flatMap(n =>
        Gen.listOfN(n, exprGen(depth - 1)).map(l => And(l.toVector))),
      2 -> Gen.choose(2, 3).flatMap(n =>
        Gen.listOfN(n, exprGen(depth - 1)).map(l => Or(l.toVector))),
      1 -> exprGen(depth - 1).map(Not(_)))

  // --- properties ----------------------------------------------------------------

  test("unparse -> parse is the identity on grammar-reachable ASTs") {
    samples(exprGen(3), 400).foreach { e =>
      val src = Unparse(e)
      assert(Parser.parse(src) === e, s"via <$src>")
    }
  }

  test("pretty never throws and entity bits stay within nwr") {
    samples(exprGen(3), 400).foreach { e =>
      Pretty.print(e)
      val (t, f) = EntityBits.calc(e)
      assert((t & ~EntityBits.Nwr) === 0)
      assert((f & ~EntityBits.Nwr) === 0)
    }
  }

  test("compiled predicate agrees with the oracle on random expressions (effective semantics)") {
    val spark = graft.SparkTestSession.spark
    val elements = graft.fixtures.DeterministicGen.elements(0.001)
    val view = graft.model.OsmView.derive(
      graft.fixtures.DeterministicGen.docsDF(spark, 0.001)).cache()
    view.count()
    samples(exprGen(2), 30).foreach { e =>
      val mask = EntityBits.entities(e)
      if (mask != EntityBits.Nothing) {
        val allowed = EntityBits.names(mask).toSet
        val expected = elements.filter(el => allowed.contains(el.otype) &&
          graft.oracle.OracleEval.matches(e, el, graft.oracle.OracleEval.noFiles))
          .map(_.docId).toSet
        val got = view.filter(graft.compile.Compiler.compileEffective(e))
          .select("doc_id").collect().map(_.getString(0)).toSet
        assert(got === expected, s"via <${Unparse(e)}>")
      }
    }
  }
}
