package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SparkTestSession

/** The 345-rule OSM amenity matcher (categories.h:691-1345): first-match
  * priority, conjunctions, the !empty() wildcard, and the none fallback. */
class CategoriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def classify(tags: Map[String, String]): (String, Int) = {
    val df = Seq((1L, tags)).toDF("id", "tags")
    val r = Categories.classify(df).collect()(0)
    (r.getAs[String]("category"), r.getAs[Int]("priority"))
  }

  test("rule table covers the reference's full category space") {
    assert(CategoryRules.rules.size == 345) // one per conditional return
    assert(CategoryRules.categories.size >= 300) // 308 enum minus shadowed dups
    assert(CategoryRules.tagKeys.contains("amenity"))
  }

  test("simple first-match: amenity=restaurant") {
    assert(classify(Map("amenity" -> "restaurant"))._1 == "restaurant_14")
    assert(classify(Map("amenity" -> "food_court"))._1 == "restaurant_14")
  }

  test("priority shadowing: memorial+plaque hits memorial_16 first " +
      "(the reference's own rule-order shadowing)") {
    assert(classify(Map("historic" -> "memorial", "memorial" -> "plaque"))._1
      == "memorial_16")
  }

  test("conjunction: castle + palace type") {
    // historic=castle alone -> castle_14 (earlier rule)
    assert(classify(Map("historic" -> "castle"))._1 == "castle_14")
    // the palace conjunction is shadowed by the bare castle rule — matches
    // the reference cascade order exactly
    val (cat, pri) = classify(Map("historic" -> "castle", "castle_type" -> "palace"))
    val castleIdx = CategoryRules.rules.indexWhere(_._1 == "castle_14")
    assert(pri == castleIdx && cat == "castle_14")
  }

  test("wildcard (*) condition requires a non-empty tag value") {
    // fortress_14: historic=castle && castle_type non-empty — find a rule
    // actually reachable with a '*' cond to prove the wildcard path: use
    // the rules table directly
    val wild = CategoryRules.rules.zipWithIndex.filter(_._1._2.exists(_._2 == "*"))
    assert(wild.nonEmpty)
    // synthesize tags for the first wildcard rule and check it classifies
    // to it or an earlier-matching rule (never none)
    val (rule, _) = wild.head
    val tags = rule._2.map { case (k, v) => k -> (if (v == "*") "anything" else v) }.toMap
    assert(classify(tags)._1 != "none")
  }

  test("no matching tags -> none / priority -1") {
    assert(classify(Map("building" -> "yes")) == ("none", -1))
    assert(classify(Map.empty[String, String]) == ("none", -1))
  }
}
