package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph-authority scoring for corpus curation — the signal web-scale
  * pipelines use to weight or filter sources before training (link
  * authority à la PageRank, Page et al. 1999; seeded trust propagation
  * à la TrustRank, Gyöngyi et al., VLDB '04). The reference's surface
  * has no graph operator at all (`/root/reference/R/DataFrameOperationR.R`
  * delegates everything to per-row scripts); these extend the engine the
  * same way the dedup/ANN family does — as first-class, oracle-checked
  * queries.
  *
  * The graph is the bipartite interaction graph from `events`: a user
  * node per `user_id`, an item node per `props.k`, an undirected edge
  * per distinct (user, item) click pair (items live at `nid =
  * 1000000 + k` so one BIGINT id space holds both sides). Rank updates
  * run in pure BIGINT arithmetic — per-edge contribution is `qr div
  * degree`, the damped update is `base + (85 * Σcontrib) div 100` with
  * `base = floor(0.15·2²⁰)` — so every iteration is an
  * order-independent integer sum, bit-reproducible engine-to-engine
  * (the same determinism contract as [[Similarity.s02IvfTopK]]'s
  * quantized centroids; floor losses only bleed mass, never reorder
  * ranks nondeterministically).
  *
  * 100 TB posture: each iteration is exactly one shuffle (join
  * contributions to edges on `src`, partial-aggregated groupBy on
  * `dst`) — the Pregel message-passing shape with NO driver-side
  * state, so rank state lives in executors and scales with the
  * cluster. Edges and degrees are computed once and
  * `localCheckpoint`ed: iterations reuse the materialized graph
  * instead of re-deriving the distinct-pairs shuffle per round (on a
  * real cluster the same role is played by a reliable checkpoint,
  * which also truncates the O(iters) lineage). Every node with an
  * edge has degree ≥ 1 in both directions — the undirected bipartite
  * walk has no dangling-mass case to special-handle.
  */
object Authority {

  private val ItemBase = 1000000L

  /** Distinct (user, item) click edges, both directions, materialized
    * once for the iterations. */
  private def graph(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val clicks = Tables(spark, dir, "events")
      .filter(col("event_type") === "click")
      .select(col("user_id").as("u"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      // explicit contract for events with no props.k: dropped, on BOTH
      // engines (the oracle mirrors this with a regexp_matches guard).
      // Without the guard the engines fail differently — Spark would
      // group a null item node, DuckDB errors casting '' to BIGINT.
      .filter(col("k").isNotNull)
      .distinct()
    val edges = clicks.select(col("u").as("src"), (col("k") + ItemBase).as("dst"))
      .unionAll(clicks.select((col("k") + ItemBase).as("src"), col("u").as("dst")))
      .localCheckpoint()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .localCheckpoint()
    (edges, deg)
  }

  /** `iters` damped-update rounds. `init` is the per-node starting
    * mass (over `deg`'s `src`), `base` the per-node teleport term
    * (over the aggregate's `dst`) — uniform for PageRank, seed-only
    * for TrustRank. */
  private[graft] def propagate(edges: DataFrame, deg: DataFrame,
      init: Column, base: Column, iters: Int): DataFrame = {
    var ranks = deg.select(col("src").as("nid"), init.as("qr"))
    for (_ <- 1 to iters) {
      val contrib = ranks.join(deg, col("nid") === col("src"))
        .select(col("nid"), expr("qr div d").as("c"))
      ranks = edges.join(contrib, edges("src") === contrib("nid"))
        .groupBy(col("dst"))
        .agg((base + expr("(85 * sum(c)) div 100")).as("qr"))
        .select(col("dst").as("nid"), col("qr"))
    }
    ranks
  }

  private def present(ranks: DataFrame): DataFrame =
    ranks.select(
      when(col("nid") >= ItemBase, lit("item")).otherwise(lit("user"))
        .as("node_type"),
      when(col("nid") >= ItemBase, col("nid") - ItemBase).otherwise(col("nid"))
        .as("node_id"),
      col("qr").as("qrank"))
      .orderBy(col("qrank").desc, col("node_type").asc, col("node_id").asc)

  /** g01: 3-round damped PageRank over the click graph — every node
    * starts at 2²⁰, uniform teleport. */
  def g01PageRank(spark: SparkSession, dir: String): DataFrame = {
    val (edges, deg) = graph(spark, dir)
    present(propagate(edges, deg, lit(1048576L), lit(157286L), iters = 3))
  }

  /** g02: TrustRank — mass starts on (and teleports only to) the ten
    * vetted item nodes `k < 10`; three propagation rounds spread trust
    * over the interaction neighborhood. Sources far from any seed end
    * near zero — the corpus-curation read is "down-weight documents
    * whose interaction neighborhood no trusted seed can reach". */
  def g02TrustRank(spark: SparkSession, dir: String): DataFrame = {
    val (edges, deg) = graph(spark, dir)
    val seedLo = ItemBase
    val seedHi = ItemBase + 9L
    val init = when(col("src").between(seedLo, seedHi), lit(1048576L))
      .otherwise(lit(0L))
    val base = when(col("dst").between(seedLo, seedHi), lit(157286L))
      .otherwise(lit(0L))
    present(propagate(edges, deg, init, base, iters = 3))
  }

  /** g03: HITS hubs/authorities (Kleinberg, JACM '99) over the DIRECTED
    * user→item half of the click graph — the complement to g01/g02's
    * random-walk ranks: a user is a good hub if they click
    * high-authority items, an item a good authority if good hubs click
    * it. Two full mutual-reinforcement rounds; after every half-step
    * scores renormalize to `s·10⁶ DIV max(s)` (max-normalization — the
    * integer stand-in for HITS' L2 step: scale-free ranking is
    * preserved exactly, and the rescale product runs in DECIMAL/HUGEINT
    * so `raw_sum·10⁶` cannot overflow a Long at any degree).
    *
    * 100 TB posture: each half-step is one broadcast-free join+agg
    * shuffle (the Pregel shape, like [[propagate]]) plus a 1-row max
    * frame broadcast; the click list is localCheckpoint'ed once. */
  def g03Hits(spark: SparkSession, dir: String): DataFrame = {
    val clicks = Tables(spark, dir, "events")
      .filter(col("event_type") === "click")
      .select(col("user_id").as("u"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k").isNotNull) // same no-props.k contract as [[graph]]
      .distinct()
      .localCheckpoint()
    def renorm(raw: DataFrame, key: String, out: String): DataFrame = {
      val mx = raw.agg(max(col("s")).as("mx"))
      raw.crossJoin(broadcast(mx)).select(col(key),
        expr("cast(cast(s as decimal(20,0)) * 1000000 div mx as bigint)")
          .as(out))
    }
    var hubs = clicks.select(col("u")).distinct()
      .withColumn("h", lit(1000000L))
    var auths: DataFrame = null
    for (_ <- 1 to 2) {
      auths = renorm(clicks.join(hubs, "u")
        .groupBy(col("k")).agg(sum(col("h")).as("s")), "k", "a")
      hubs = renorm(clicks.join(auths, "k")
        .groupBy(col("u")).agg(sum(col("a")).as("s")), "u", "h")
    }
    hubs.select(lit("user").as("node_type"), col("u").as("node_id"),
        col("h").as("score"))
      .unionAll(auths.select(lit("item").as("node_type"),
        col("k").as("node_id"), col("a").as("score")))
      .orderBy(col("score").desc, col("node_type").asc, col("node_id").asc)
  }

  /** Shared oracle scaffolding: the click graph and degree CTEs. The
    * `k` extraction is the q28 regexp form (engine-identical on this
    * JSON shape); `//` is DuckDB's integer division, matching Spark's
    * `div` on these all-positive values. */
  private def graphCte: String =
    """WITH c0 AS (
      |  SELECT DISTINCT user_id AS u,
      |    CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
      |  FROM events WHERE event_type = 'click'
      |    AND regexp_matches(props, '"k": [0-9]+')
      |), edges AS (
      |  SELECT u AS src, 1000000 + k AS dst FROM c0
      |  UNION ALL
      |  SELECT 1000000 + k AS src, u AS dst FROM c0
      |), deg AS (
      |  SELECT src, COUNT(*) AS d FROM edges GROUP BY src
      |)""".stripMargin

  /** One unrolled damped round: `rPrev` → a new rank CTE body. */
  private def roundSql(prev: String, baseSql: String): String =
    s"""  SELECT e.dst AS nid,
       |    CAST($baseSql + (85 * SUM(r.qr // d.d)) // 100 AS BIGINT) AS qr
       |  FROM edges e JOIN $prev r ON e.src = r.nid
       |  JOIN deg d ON e.src = d.src
       |  GROUP BY e.dst""".stripMargin

  private val presentSql =
    """SELECT
      |  CASE WHEN nid >= 1000000 THEN 'item' ELSE 'user' END AS node_type,
      |  CAST(CASE WHEN nid >= 1000000 THEN nid - 1000000 ELSE nid END
      |    AS BIGINT) AS node_id,
      |  qr AS qrank
      |FROM r3 ORDER BY qrank DESC, node_type, node_id""".stripMargin

  private def rankSql(initSql: String, baseSql: String): String =
    graphCte +
      s""", r0 AS (
         |  SELECT src AS nid, CAST($initSql AS BIGINT) AS qr FROM deg
         |), r1 AS (
         |${roundSql("r0", baseSql)}
         |), r2 AS (
         |${roundSql("r1", baseSql)}
         |), r3 AS (
         |${roundSql("r2", baseSql)}
         |)
         |$presentSql""".stripMargin

  val g01Sql: String = rankSql("1048576", "157286")

  val g02Sql: String = rankSql(
    "CASE WHEN src BETWEEN 1000000 AND 1000009 THEN 1048576 ELSE 0 END",
    "CASE WHEN e.dst BETWEEN 1000000 AND 1000009 THEN 157286 ELSE 0 END")

  /** g03 oracle: the same two unrolled mutual-reinforcement rounds;
    * raw sums cast to BIGINT (mirroring Spark's Long sums), the rescale
    * product in HUGEINT (mirroring the DECIMAL(20,0) product). */
  val g03Sql: String =
    """WITH c0 AS (
      |  SELECT DISTINCT user_id AS u,
      |    CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
      |  FROM events WHERE event_type = 'click'
      |    AND regexp_matches(props, '"k": [0-9]+')
      |), h0 AS (
      |  SELECT DISTINCT u, CAST(1000000 AS BIGINT) AS h FROM c0
      |), a1r AS (
      |  SELECT k, CAST(SUM(h) AS BIGINT) AS s FROM c0 JOIN h0 USING (u) GROUP BY k
      |), a1 AS (
      |  SELECT k, CAST(CAST(s AS HUGEINT) * 1000000
      |    // (SELECT MAX(s) FROM a1r) AS BIGINT) AS a FROM a1r
      |), h1r AS (
      |  SELECT u, CAST(SUM(a) AS BIGINT) AS s FROM c0 JOIN a1 USING (k) GROUP BY u
      |), h1 AS (
      |  SELECT u, CAST(CAST(s AS HUGEINT) * 1000000
      |    // (SELECT MAX(s) FROM h1r) AS BIGINT) AS h FROM h1r
      |), a2r AS (
      |  SELECT k, CAST(SUM(h) AS BIGINT) AS s FROM c0 JOIN h1 USING (u) GROUP BY k
      |), a2 AS (
      |  SELECT k, CAST(CAST(s AS HUGEINT) * 1000000
      |    // (SELECT MAX(s) FROM a2r) AS BIGINT) AS a FROM a2r
      |), h2r AS (
      |  SELECT u, CAST(SUM(a) AS BIGINT) AS s FROM c0 JOIN a2 USING (k) GROUP BY u
      |), h2 AS (
      |  SELECT u, CAST(CAST(s AS HUGEINT) * 1000000
      |    // (SELECT MAX(s) FROM h2r) AS BIGINT) AS h FROM h2r
      |)
      |SELECT node_type, node_id, score FROM (
      |  SELECT 'user' AS node_type, u AS node_id, h AS score FROM h2
      |  UNION ALL
      |  SELECT 'item' AS node_type, k AS node_id, a AS score FROM a2
      |) ORDER BY score DESC, node_type, node_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g01_pagerank" -> (g01PageRank _),
    "g02_trustrank" -> (g02TrustRank _),
    "g03_hits" -> (g03Hits _))

  val oracle: Map[String, String] = Map(
    "g01_pagerank" -> g01Sql,
    "g02_trustrank" -> g02Sql,
    "g03_hits" -> g03Sql)
}
