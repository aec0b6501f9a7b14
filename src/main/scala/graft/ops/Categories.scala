package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's 308-category OSM amenity matcher, Spark-first
  * (/root/reference/include/adr/categories.h:691-1345 — the generated
  * first-match rule cascade; rule table extracted to data by
  * tools/gen_categories.py → CategoryRules).
  *
  * Shape: entities carry a `tags: map<string,string>` column; the rule
  * table (345 rows) is BROADCAST; candidate (entity, rule) pairs come from
  * an equi-join on the rule's FIRST tag key — an entity only meets the
  * rules whose anchor key it carries (≤ a handful of its ≤39 relevant
  * tags), never all 345 — then the remaining conjunction conditions check
  * against the map and the winner is min(priority), exactly the
  * reference's first-match semantics. Scale: one broadcast, one shuffle on
  * entity_id for the argmin; no rule-count blowup per row.
  */
object Categories {
  import Tables.load

  /** Max conditions per rule in the reference table (tower rules). */
  private val MaxConds = CategoryRules.rules.map(_._2.size).max // = 3

  /** Rule table as a DataFrame: (priority, category, k1, v1, ..., k3, v3);
    * absent conditions are empty strings. Value "*" = any non-empty. */
  def rulesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    CategoryRules.rules.zipWithIndex.map { case ((cat, conds), i) =>
      val c = conds.padTo(MaxConds, ("", ""))
      (i, cat, c(0)._1, c(0)._2, c(1)._1, c(1)._2, c(2)._1, c(2)._2)
    }.toDF("priority", "category", "k1", "v1", "k2", "v2", "k3", "v3")
  }

  /** One condition against the tags map ('' key = no condition = true).
    * try_element_at: ANSI element_at throws on a missing map key. */
  private def condOk(tags: Column, k: Column, v: Column): Column =
    k === "" || (v === "*" && coalesce(try_element_at(tags, k), lit("")) =!= "") ||
      try_element_at(tags, k) <=> v

  /** df(id, tags: map<string,string>) → (id, category, priority): the
    * first matching rule per entity, 'none' when nothing matches. */
  def classify(df: DataFrame, idCol: String = "id"): DataFrame = {
    val spark = df.sparkSession
    val rules = rulesDf(spark)
    // anchor join: explode each entity's tags once, meet only the rules
    // anchored on a key the entity actually carries
    val anchored = df.select(col(idCol), col("tags"),
        explode(map_keys(col("tags"))).as("k1"))
      .join(broadcast(rules), Seq("k1"))
      .filter(condOk(col("tags"), col("k1"), col("v1")) &&
        condOk(col("tags"), col("k2"), col("v2")) &&
        condOk(col("tags"), col("k3"), col("v3")))
      .groupBy(col(idCol))
      .agg(min(struct(col("priority"), col("category"))).as("m"))
    df.select(col(idCol))
      .join(anchored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("m")("category"), lit("none")).as("category"),
        coalesce(col("m")("priority"), lit(-1)).as("priority"))
  }

  /** X8 prior over the matched category (q18-style): zoom-suffixed
    * categories are map-prominent POIs — _14 (city-zoom icons) over _16
    * (street-zoom) over unsuffixed, none = 0. */
  private def prior(category: Column): Column =
    when(category === "none", 0.0)
      .when(category.endsWith("_14"), 3.0)
      .when(category.endsWith("_16"), 2.0)
      .otherwise(1.0)

  /** Driver query: parts become tagged entities — part i carries exactly
    * the tag conditions of rule (i mod |rules|) (with "*" realized as
    * "x"), so every rule is exercised ~6× at sf0.01 — classified by the
    * full 345-rule cascade. Entities whose tag set ALSO satisfies an
    * earlier rule resolve to that earlier rule (first-match semantics,
    * e.g. {historic: memorial, memorial: plaque} → memorial_16, the
    * reference's own shadowing). */
  def q41CategoryMatch(spark: SparkSession, dir: String): DataFrame = {
    val rules = rulesDf(spark)
    val n = CategoryRules.rules.size
    val ents = load(spark, dir, "part")
      .select(col("p_partkey").as("id"), (col("p_partkey") % n).as("rid"))
      .join(broadcast(rules.withColumnRenamed("priority", "rid")
        .select(col("rid"), col("k1").as("tk1"), col("v1").as("tv1"),
          col("k2").as("tk2"), col("v2").as("tv2"),
          col("k3").as("tk3"), col("v3").as("tv3"))), Seq("rid"))
      // key dedup: two reference rules require the SAME single-valued tag
      // twice (highway turning_circle+track, shop seafood+fishmonger) —
      // dead rules there (a tag has one value), duplicate map keys here;
      // keep the first slot, exactly like a real tag list would
      .withColumn("dk2", when(col("tk2") === col("tk1"), "").otherwise(col("tk2")))
      .withColumn("dk3", when(col("tk3") === col("tk1") || col("tk3") === col("tk2"), "")
        .otherwise(col("tk3")))
      // filter BEFORE map construction: the padded/dedup'd '' slots would
      // otherwise collide as duplicate map keys (mapKeyDedupPolicy throws)
      .select(col("id"), map_from_entries(filter(array(
        struct(col("tk1").as("k"), col("tv1").as("v")),
        struct(col("dk2").as("k"), col("tv2").as("v")),
        struct(col("dk3").as("k"), col("tv3").as("v"))),
        e => e("k") =!= ""))
        .as("tags0"))
      .select(col("id"), transform_values(col("tags0"),
        (_, v) => when(v === "*", "x").otherwise(v)).as("tags"))
    classify(ents)
      .withColumn("prior_score", prior(col("category")))
  }

  /** DuckDB mirror: the same rule table inlined as VALUES, the same
    * anchor/condition/min-priority logic in SQL. */
  def oracleSql: String = {
    val n = CategoryRules.rules.size
    val values = CategoryRules.rules.zipWithIndex.map { case ((cat, conds), i) =>
      val c = conds.padTo(3, ("", ""))
      s"($i, '$cat', '${c(0)._1}', '${c(0)._2}', '${c(1)._1}', '${c(1)._2}', '${c(2)._1}', '${c(2)._2}')"
    }.mkString(",\n    ")
    // entity tags = its assigned rule's conditions ('*' -> 'x');
    // cond(k,v) satisfied iff some entity tag slot j has tkj = k and
    // (v = tvj or v='*' and tvj non-empty); absent cond (k='') is true
    def sat(k: String, v: String) =
      s"""($k = '' OR (($k = e.tk1 AND ($v = e.tv1 OR ($v = '*' AND e.tv1 <> '')))
         |      OR ($k = e.tk2 AND ($v = e.tv2 OR ($v = '*' AND e.tv2 <> '')))
         |      OR ($k = e.tk3 AND ($v = e.tv3 OR ($v = '*' AND e.tv3 <> '')))))""".stripMargin
    s"""WITH rules(pri, cat, k1, v1, k2, v2, k3, v3) AS (VALUES
       |    $values),
       |ent AS (
       |  SELECT p_partkey AS id, p_partkey % $n AS rid FROM part),
       |e AS (
       |  SELECT ent.id,
       |    r.k1 AS tk1, CASE WHEN r.v1 = '*' THEN 'x' ELSE r.v1 END AS tv1,
       |    CASE WHEN r.k2 = r.k1 THEN '' ELSE r.k2 END AS tk2,
       |    CASE WHEN r.v2 = '*' THEN 'x' ELSE r.v2 END AS tv2,
       |    CASE WHEN r.k3 = r.k1 OR r.k3 = r.k2 THEN '' ELSE r.k3 END AS tk3,
       |    CASE WHEN r.v3 = '*' THEN 'x' ELSE r.v3 END AS tv3
       |  FROM ent JOIN rules r ON r.pri = ent.rid),
       |m AS (
       |  SELECT e.id, r.pri, r.cat FROM e JOIN rules r ON
       |    ${sat("r.k1", "r.v1")}
       |    AND ${sat("r.k2", "r.v2")}
       |    AND ${sat("r.k3", "r.v3")}),
       |best AS (
       |  SELECT id, min(pri) AS pri FROM m GROUP BY 1)
       |SELECT e.id, coalesce(r.cat, 'none') AS category,
       |  CAST(coalesce(r.pri, -1) AS INT) AS priority,
       |  CAST(CASE WHEN r.cat IS NULL THEN 0.0
       |       WHEN r.cat LIKE '%\\_14' ESCAPE '\\' THEN 3.0
       |       WHEN r.cat LIKE '%\\_16' ESCAPE '\\' THEN 2.0
       |       ELSE 1.0 END AS DOUBLE) AS prior_score
       |FROM e LEFT JOIN best ON best.id = e.id
       |LEFT JOIN rules r ON r.pri = best.pri""".stripMargin
  }

  val oracles: Map[String, String] = Map("q41_category_match" -> oracleSql)
}
