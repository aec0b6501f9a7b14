package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A8 city pick + J8 duplicate disambiguation
  * (/root/reference/src/guess_context.cc:105-133,
  * /root/reference/src/get_suggestions.cc:745-763):
  *
  *  - city area index: the FIRST argmin over the area chain of the
  *    admin-level closeness weight (x > 8 ? 10 : 1) · |x − 8| — levels
  *    just below city (8) are mildly penalized, levels above are 10×
  *    (guess_context.cc:121-127; kCloseTo = 8). This seeds
  *    unique_area_idx.
  *  - disambiguation: for two suggestions at the SAME location, both
  *    unique_area_idx values advance in lockstep while the two chains
  *    carry the SAME area name at the current indices (and both remain in
  *    bounds) — the first differing area is what distinguishes the pair
  *    in display. An index that runs off the chain yields no
  *    distinguishing area (NULL).
  */
object AreaPick {
  import Tables.load

  /** First argmin of the admin-level weight over `areas`
    * (array<struct<name,level,...>>), 1-based; NULL for empty chains.
    * Strict `<` in the fold = first minimum wins, exactly
    * std::min_element. */
  def cityAreaIdx(areas: Column): Column = {
    val folded = aggregate(
      sequence(lit(1), size(areas)),
      struct(lit(Int.MaxValue).as("w"), lit(-1).as("idx")),
      (acc, i) => {
        val lv = element_at(areas, i)("level")
        val w = when(lv > 8, 10).otherwise(1) * abs(lv - 8)
        when(w < acc("w"),
          struct(w.cast("int").as("w"), i.cast("int").as("idx")))
          .otherwise(acc)
      })
    when(size(areas) === 0, lit(null).cast("int")).otherwise(folded("idx"))
  }

  /** Driver query: suppliers in same-location pairs (even/odd key), each
    * with a 3-level area chain whose first element is shared by the pair,
    * second shared only in every 5th location group, third always shared —
    * so the advance stops at depth 0, 1, or runs off the chain. */
  def q43AreaDisambig(spark: SparkSession, dir: String): DataFrame = {
    val s = load(spark, dir, "supplier")
    val loc = (col("s_suppkey") - col("s_suppkey") % 2).cast("long")
    val e = s.select(
      col("s_suppkey").cast("long").as("entity_id"),
      loc.as("location"),
      array(
        struct(concat(lit("m"), loc).as("name"),
          (lit(8) + col("s_suppkey") % 3).cast("int").as("level")),
        struct(when(loc % 5 === 0, concat(lit("d"), loc))
          .otherwise(concat(lit("d"), col("s_suppkey"))).as("name"),
          lit(6).as("level")),
        struct(concat(lit("c"), loc).as("name"),
          lit(2).as("level"))).as("areas"))
      .withColumn("city_idx", cityAreaIdx(col("areas")))

    // same-location pairs (groups here have ≤ 2 members by construction)
    val pairs = e.as("a").join(e.as("b"),
      col("a.location") === col("b.location") &&
        col("a.entity_id") < col("b.entity_id"))

    def nameAt(side: String, idx: Column): Column =
      element_at(col(s"$side.areas"), idx)("name")
    val n = 3 // chain length
    // unrolled lockstep advance (≤ n steps: each pushes both indices +1)
    def advance(ia: Column, ib: Column): (Column, Column, Column) = {
      val inBounds = ia <= n && ib <= n
      val eq = when(inBounds, nameAt("a", ia) === nameAt("b", ib))
        .otherwise(lit(false))
      (when(eq, ia + 1).otherwise(ia), when(eq, ib + 1).otherwise(ib), eq)
    }
    val (ia1, ib1, _) = advance(col("a.city_idx"), col("b.city_idx"))
    val (ia2, ib2, _) = advance(ia1, ib1)
    val (ia3, ib3, _) = advance(ia2, ib2)

    val resolvedPairs = pairs.select(
      col("a.entity_id").as("ea"), col("b.entity_id").as("eb"),
      col("a.location").as("location"),
      col("a.city_idx").as("ca"), col("b.city_idx").as("cb"),
      ia3.cast("int").as("ua"), ib3.cast("int").as("ub"),
      when(ia3 <= n, nameAt("a", ia3)).as("da"),
      when(ib3 <= n, nameAt("b", ib3)).as("db"))
    val aSide = resolvedPairs.select(col("ea").as("entity_id"), col("location"),
      col("ca").as("city_idx"), col("ua").as("unique_idx"), col("da").as("disamb_area"))
    val bSide = resolvedPairs.select(col("eb").as("entity_id"), col("location"),
      col("cb").as("city_idx"), col("ub").as("unique_idx"), col("db").as("disamb_area"))
    // singletons (no same-location partner): index stays at the city pick
    val paired = aSide.unionByName(bSide)
    val singles = e.join(paired.select(col("entity_id")), Seq("entity_id"), "left_anti")
      .select(col("entity_id"), col("location"),
        col("city_idx"), col("city_idx").as("unique_idx"),
        element_at(col("areas"), col("city_idx"))("name").as("disamb_area"))
    paired.unionByName(singles)
  }

  val oracles: Map[String, String] = Map(
    "q43_area_disambig" ->
      """WITH e AS (
        |  SELECT CAST(s_suppkey AS BIGINT) AS entity_id,
        |    CAST(s_suppkey - s_suppkey % 2 AS BIGINT) AS location,
        |    'm' || (s_suppkey - s_suppkey % 2) AS n1,
        |    CASE WHEN (s_suppkey - s_suppkey % 2) % 5 = 0
        |      THEN 'd' || (s_suppkey - s_suppkey % 2)
        |      ELSE 'd' || s_suppkey END AS n2,
        |    'c' || (s_suppkey - s_suppkey % 2) AS n3,
        |    8 + s_suppkey % 3 AS l1, 6 AS l2, 2 AS l3
        |  FROM supplier),
        |c AS (
        |  SELECT *,
        |    -- first argmin of (x>8?10:1)*abs(x-8) over [l1,l2,l3]
        |    CASE
        |      WHEN (CASE WHEN l1 > 8 THEN 10 ELSE 1 END) * abs(l1 - 8)
        |        <= least((CASE WHEN l2 > 8 THEN 10 ELSE 1 END) * abs(l2 - 8),
        |                 (CASE WHEN l3 > 8 THEN 10 ELSE 1 END) * abs(l3 - 8)) THEN 1
        |      WHEN (CASE WHEN l2 > 8 THEN 10 ELSE 1 END) * abs(l2 - 8)
        |        <= (CASE WHEN l3 > 8 THEN 10 ELSE 1 END) * abs(l3 - 8) THEN 2
        |      ELSE 3 END AS city_idx
        |  FROM e),
        |p AS (
        |  SELECT a.entity_id AS ea, b.entity_id AS eb, a.location,
        |    a.city_idx AS ca, b.city_idx AS cb,
        |    a.n1 AS an1, a.n2 AS an2, a.n3 AS an3,
        |    b.n1 AS bn1, b.n2 AS bn2, b.n3 AS bn3
        |  FROM c a JOIN c b ON a.location = b.location
        |    AND a.entity_id < b.entity_id),
        |s0 AS (
        |  SELECT *, (ca <= 3 AND cb <= 3 AND
        |    (CASE ca WHEN 1 THEN an1 WHEN 2 THEN an2 ELSE an3 END)
        |      = (CASE cb WHEN 1 THEN bn1 WHEN 2 THEN bn2 ELSE bn3 END)) AS eq0
        |  FROM p),
        |s1 AS (
        |  SELECT *, ca + CASE WHEN eq0 THEN 1 ELSE 0 END AS ia1,
        |    cb + CASE WHEN eq0 THEN 1 ELSE 0 END AS ib1 FROM s0),
        |s1e AS (
        |  SELECT *, (ia1 <= 3 AND ib1 <= 3 AND
        |    (CASE ia1 WHEN 1 THEN an1 WHEN 2 THEN an2 ELSE an3 END)
        |      = (CASE ib1 WHEN 1 THEN bn1 WHEN 2 THEN bn2 ELSE bn3 END)) AS eq1
        |  FROM s1),
        |s2 AS (
        |  SELECT *, ia1 + CASE WHEN eq1 THEN 1 ELSE 0 END AS ia2,
        |    ib1 + CASE WHEN eq1 THEN 1 ELSE 0 END AS ib2 FROM s1e),
        |s2e AS (
        |  SELECT *, (ia2 <= 3 AND ib2 <= 3 AND
        |    (CASE ia2 WHEN 1 THEN an1 WHEN 2 THEN an2 ELSE an3 END)
        |      = (CASE ib2 WHEN 1 THEN bn1 WHEN 2 THEN bn2 ELSE bn3 END)) AS eq2
        |  FROM s2),
        |s3 AS (
        |  SELECT *, ia2 + CASE WHEN eq2 THEN 1 ELSE 0 END AS ia3,
        |    ib2 + CASE WHEN eq2 THEN 1 ELSE 0 END AS ib3 FROM s2e),
        |pairs AS (
        |  SELECT ea AS entity_id, location, ca AS city_idx,
        |    CAST(ia3 AS INT) AS unique_idx,
        |    CASE WHEN ia3 <= 3 THEN
        |      CASE ia3 WHEN 1 THEN an1 WHEN 2 THEN an2 ELSE an3 END END AS disamb_area
        |  FROM s3
        |  UNION ALL
        |  SELECT eb, location, cb,
        |    CAST(ib3 AS INT),
        |    CASE WHEN ib3 <= 3 THEN
        |      CASE ib3 WHEN 1 THEN bn1 WHEN 2 THEN bn2 ELSE bn3 END END
        |  FROM s3),
        |singles AS (
        |  SELECT c.entity_id, c.location, c.city_idx,
        |    CAST(c.city_idx AS INT) AS unique_idx,
        |    CASE c.city_idx WHEN 1 THEN n1 WHEN 2 THEN n2 ELSE n3 END AS disamb_area
        |  FROM c LEFT JOIN pairs ON pairs.entity_id = c.entity_id
        |  WHERE pairs.entity_id IS NULL)
        |SELECT entity_id, location, CAST(city_idx AS INT) AS city_idx,
        |  unique_idx, disamb_area
        |FROM (SELECT * FROM pairs UNION ALL SELECT * FROM singles)""".stripMargin
  )
}
