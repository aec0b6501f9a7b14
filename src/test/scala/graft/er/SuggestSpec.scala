package graft.er

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SparkTestSession

/** Goldens for the composed get_suggestions DAG, mirroring the reference's
  * end-to-end fixture expectations (/root/reference/test/cyrillic_test.cc):
  *  - guess_cyrillic_exact_match (:27-43): exact Cyrillic query is among
  *    the candidates / ranks first
  *  - addr_place_block_address (:49-71): "Славейков 26" resolves to
  *    "ж.к. П. Р. Славейков" with house number "бл. 26" via sub-phrase
  *    matching of the numeric token
  *  - extract_and_suggest_cyrillic (:73-89): village "Индже войвода"
  *    is top-1 for its own name
  */
case class AreaName(name: String, lang: String)
case class Area(names: Seq[AreaName], level: Int, pop: Long)
object Area { // single-language convenience (the pre-multilang fixture shape)
  def apply(name: String, level: Int, pop: Long): Area =
    Area(Seq(AreaName(name, "default")), level, pop)
}
case class Ent(entity_id: Long, name: String, kind: String, category: String,
    population: Long, name_lang: String, location: Long,
    areas: Seq[Area], house_numbers: Seq[String])

class SuggestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(queries: Seq[(Long, String)], ents: Seq[Ent],
      userLangs: Seq[String] = Seq("default")) =
    Suggest.suggest(
      queries.toDF("query_id", "text"), ents.toDS().toDF(),
      userLangs = userLangs)
      .orderBy($"query_id", $"rank").collect()

  test("cyrillic exact match is the top candidate (cyrillic_test.cc:27-43)") {
    val ents = Seq(
      Ent(1, "Индже войвода", "place", "village", 300, "default", 1, Nil, Nil),
      Ent(2, "София", "place", "city", 1200000, "default", 2, Nil, Nil),
      Ent(3, "Aschaffenburg", "place", "city", 70000, "default", 3, Nil, Nil))
    val rows = run(Seq((1L, "Индже войвода")), ents)
    assert(rows.nonEmpty, "no suggestions returned")
    assert(rows.head.getAs[String]("name") == "Индже войвода",
      s"top-1 was ${rows.head}")
  }

  test("block address: numeric token matches house number via sub-phrase " +
      "(cyrillic_test.cc:49-71)") {
    val ents = Seq(
      Ent(10, "ж.к. П. Р. Славейков", "street", "", 0, "default", 10, Nil,
        Seq("бл. 26", "бл. 27", "бл. 30")),
      Ent(11, "Славейно", "place", "village", 500, "default", 11, Nil, Nil),
      Ent(12, "Изгрев", "street", "", 0, "default", 12, Nil, Seq("1", "2")))
    val rows = run(Seq((1L, "Славейков 26")), ents)
    assert(rows.nonEmpty, "no suggestions returned")
    val top = rows.head
    assert(top.getAs[String]("name") == "ж.к. П. Р. Славейков", s"top-1 was $top")
    assert(top.getAs[String]("matched_hn") == "бл. 26",
      s"house number not resolved: $top")
  }

  test("end-to-end cyrillic suggest: exact village name wins " +
      "(cyrillic_test.cc:73-89)") {
    val ents = Seq(
      Ent(20, "Индже войвода", "place", "village", 300, "default", 20,
        Seq(Area("бургас", 4, 400000)), Nil),
      Ent(21, "Индже войвода", "street", "", 0, "default", 21, Nil, Seq("3")),
      Ent(22, "Война", "place", "village", 100, "default", 22, Nil, Nil))
    val rows = run(Seq((1L, "Индже войвода")), ents)
    assert(rows.nonEmpty, "no suggestions returned")
    assert(rows.head.getAs[String]("name") == "Индже войвода",
      s"top-1 was ${rows.head}")
  }

  test("synonym alternates: 'Hbf' query finds 'Hauptbahnhof' entity (G4)") {
    val ents = Seq(
      Ent(40, "Darmstadt Hauptbahnhof", "place", "none", 0, "default", 40, Nil, Nil),
      Ent(41, "Darmstadt Nordbahnhof", "place", "none", 0, "default", 41, Nil, Nil),
      Ent(42, "Frankfurt Hauptbahnhof", "place", "none", 0, "default", 42, Nil, Nil))
    val rows = run(Seq((1L, "Darmstadt Hbf")), ents)
    assert(rows.nonEmpty, "no suggestions returned")
    assert(rows.head.getAs[String]("name") == "Darmstadt Hauptbahnhof",
      s"alternate not matched: ${rows.toSeq}")
  }

  test("bilingual area: the query matches through the user's second " +
      "language and the winning lang nibble is recorded (get_suggestions" +
      ".cc:88-104, guess_context.h:43-46)") {
    // entity 50's area is named "пловдивско" in the default language but
    // exactly "пловдив" in German; entity 51's area is "софия" in both.
    // A query mentioning "пловдив" must (a) match 50's area THROUGH the
    // de name (cross-language min) → lang nibble 2, and (b) rank 50 above
    // the identically-named street with the wrong area.
    val ents = Seq(
      Ent(50, "Лилава улица", "street", "", 0, "default", 50,
        Seq(Area(Seq(AreaName("пловдивско", "default"),
          AreaName("пловдив", "de")), 4, 300000)), Nil),
      Ent(51, "Лилава улица", "street", "", 0, "default", 51,
        Seq(Area(Seq(AreaName("софия", "default"),
          AreaName("софия", "de")), 4, 1200000)), Nil))
    val rows = run(Seq((1L, "Лилава улица пловдив")), ents,
      userLangs = Seq("default", "de"))
    assert(rows.nonEmpty, "no suggestions returned")
    val top = rows.head
    assert(top.getAs[Long]("entity_id") == 50L,
      s"cross-language area evidence ignored: ${rows.toSeq}")
    assert(top.getAs[Long]("area_langs") == 2L,
      s"winning language nibble must be 2 (de): $top")
  }

  test("bilingual area tie: equal scores across languages pick the FIRST " +
      "user language (activate_areas' strict `<` update)") {
    val ents = Seq(
      Ent(60, "Лилава улица", "street", "", 0, "default", 60,
        Seq(Area(Seq(AreaName("бургас", "default"),
          AreaName("бургас", "de")), 4, 400000)), Nil))
    val rows = run(Seq((1L, "Лилава улица бургас")), ents,
      userLangs = Seq("default", "de"))
    assert(rows.nonEmpty, "no suggestions returned")
    assert(rows.head.getAs[Long]("area_langs") == 1L,
      s"tie must resolve to the first user language: ${rows.head}")
  }

  test("greedy area evidence lowers the score of the contextual entity") {
    // two identically-named streets; only one lies in "бургас" — the query
    // mentioning the area must rank that one first (A6 evidence)
    val ents = Seq(
      Ent(30, "Лилава улица", "street", "", 0, "default", 30,
        Seq(Area("бургас", 4, 400000)), Nil),
      Ent(31, "Лилава улица", "street", "", 0, "default", 31,
        Seq(Area("софия", 4, 1200000)), Nil))
    val rows = run(Seq((1L, "Лилава улица бургас")), ents)
    assert(rows.nonEmpty, "no suggestions returned")
    assert(rows.head.getAs[Long]("entity_id") == 30L,
      s"area evidence ignored: ${rows.toSeq}")
  }
}
