package graft.compile

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions.col

/** Regex dialect pins (SURVEY.md §7.4 #3): the reference uses std::regex
  * ECMAScript with `regex_search` (unanchored); we use Java `Pattern` via
  * RLike, whose `Matcher.find` is also unanchored. This spec pins agreement
  * on the OSM-typical subset — anchors, classes, alternation, quantifiers,
  * case-insensitive flag — by asserting the Spark RLike result equals the
  * documented ECMAScript behavior for each case. Exotic divergences (\\b on
  * unicode boundaries, POSIX class names) are out of the pinned subset. */
class RegexDialectSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // (value, pattern, expected-unanchored-match in BOTH dialects)
  private val cases: Seq[(String, String, Boolean)] = Seq(
    ("primary_link", "_link$", true),
    ("primary_linked", "_link$", false),
    ("primary", "^prim", true),
    ("xprimary", "^prim", false),
    ("residential", "res|ser", true),
    ("addr:street", "^addr:", true),
    ("house12", "[0-9]+", true),
    ("house", "[0-9]+", false),
    ("motorway", "motor.ay", true),
    ("motoway", "motor?way", true),
    ("mootorway", "mo+torway", true),
    ("", "^$", true),
    ("x", "^$", false),
    ("abc", "a.c", true),
    ("a\nc", "a.c", false),          // '.' excludes newline in both dialects
    ("Primary", "(?i)primary", true), // our i-flag compilation
    ("PRIMARY_LINK", "(?i)_link$", true),
    ("water", "^(water|tree)$", true),
    ("waterfall", "^(water|tree)$", false),
    ("a{b}", "a\\{b\\}", true),
    ("route66", "\\d{2}", true),
    ("route6", "\\d{2}", false),
    ("foo bar", "\\bbar", true),     // ASCII word boundary agrees
    ("foobar", "\\bbar", false))

  test("RLike agrees with documented ECMAScript regex_search semantics on the pinned subset") {
    val df = cases.map(c => (c._1, c._2)).toDF("v", "p")
    val got = df.selectExpr("v", "p", "v rlike p as m")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(2)).toMap
    cases.foreach { case (v, p, expected) =>
      assert(got((v, p)) === expected, s"<$v> =~ <$p>")
      // and the oracle (java.util.regex .find) matches the same way, so the
      // conformance oracle and the engine can never drift on this subset
      assert(graft.oracle.OracleEval.regexSearch(p, v) === expected, s"oracle <$v> =~ <$p>")
    }
  }
}
