package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SparkTestSession

/** Accuracy gate for the char-trigram language classifier (q28) on a
  * deterministic multilingual sample set — one natural-prose snippet per
  * profile language plus a no-signal control. */
class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val samples = Seq(
    ("en", "the quick brown fox jumps over the lazy dog and all the " +
      "children were having such a wonderful time that they could not " +
      "stop laughing with delight at everything they saw"),
    ("en", "this is not what you thought it was because the weather " +
      "report said that there would have been rain all over the coast"),
    ("de", "der schnelle braune fuchs springt über den faulen hund und " +
      "die kinder lachten auf dem weg zur schule über die geschichte"),
    ("de", "das ist eine wunderbare gelegenheit für alle die mit der " +
      "bahn zur arbeit fahren und dabei die zeitung lesen"),
    ("fr", "les enfants jouaient dans le jardin avec une balle rouge " +
      "pendant que les parents préparaient le repas du soir avec des légumes"),
    ("fr", "il est difficile de comprendre pourquoi les gens qui " +
      "habitent dans cette ville ne prennent pas le train tous les jours"),
    ("es", "los niños jugaban en el parque con una pelota roja mientras " +
      "los padres preparaban la comida para toda la familia en la casa"),
    ("es", "es importante comprender como las personas de esta ciudad " +
      "trabajan juntas para mejorar el transporte y las escuelas del barrio"),
    ("bg", "децата играеха в парка с червена топка докато родителите " +
      "приготвяха храната за цялото семейство в къщата като се радваха"),
    ("bg", "познанието за историята на страната е важно за всички които " +
      "искат да разбират какво става в обществото и да преценяват нещата"),
    ("xx", "zzz qqq 123 456"))

  test("trigram-profile langid classifies 5 languages + control correctly") {
    val df = samples.zipWithIndex
      .map { case ((lang, text), i) => (i.toLong, lang, text) }
      .toDF("doc_id", "expected", "text")
    val pred = TextOps.langIdOn(df.select($"doc_id", $"text"))
      .join(df.select($"doc_id", $"expected"), Seq("doc_id"))
      .select($"doc_id", $"expected", $"lang_pred")
      .collect()
    val wrong = pred.filter(r => r.getString(1) != r.getString(2))
    assert(wrong.isEmpty,
      s"misclassified: ${wrong.map(r => s"${r.getLong(0)}:${r.getString(1)}->${r.getString(2)}").mkString(", ")}")
  }
}
