package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** SparkSessionExtensions entry point: registers every graft kernel as a
  * SQL function at session build time, so a cluster deploy needs only
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * and `SELECT jaro_winkler(a, b) ...` works from plain SQL / thrift /
  * notebooks with no library calls. The same registrations are available
  * imperatively via graft.functions.registerAll(spark).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String) =
    new ExpressionInfo("graft", name)

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "normalize_text" -> (es => NormalizeText(es.head)),
    "normalize_raw" -> (es => NormalizeRaw(es.head)),
    "trigram_keys" -> (es => TrigramKeys(es.head)),
    "trigram_strings" -> (es => TrigramStrings(es.head)),
    "bigram_keys" -> (es => BigramKeys(es.head)),
    "sift4" -> (es => Sift4Dist(es(0), es(1))),
    "bounded_levenshtein" -> (es => BoundedLevenshtein(es(0), es(1))),
    "jaro_winkler" -> (es => JaroWinkler(es(0), es(1))),
    "ref_match_score" -> (es => RefMatchScore(es(0), es(1))),
    "double_metaphone" -> (es => DoubleMetaphoneKey(es.head)),
    "match_key" -> (es => MatchKey(es.head)),
    "cosine_sim" -> (es => CosineSim(es(0), es(1))),
    "point_in_ring" -> (es => PointInRing(es(0), es(1), es(2))),
    "format_address" -> (es => FormatAddress(es))
  )

  override def apply(ext: SparkSessionExtensions): Unit = {
    fns.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name), builder))
    }
    // lev(a,b) <= k → banded 3-arg form (O(n·k) + early exit)
    ext.injectOptimizerRule(_ => graft.plans.BoundedLevenshteinRewrite)
  }
}
