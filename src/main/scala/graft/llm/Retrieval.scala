package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Lexical retrieval over the `documents` fixture — the sparse
  * counterpart to [[Similarity]]'s dense s-series (a training-data
  * pipeline retrieves both ways: embedding ANN for semantic near-dup /
  * mining, BM25 for keyword search, decontamination audits and hybrid
  * reranking; the reference delegates all scoring to opaque user
  * scripts, cf. `/root/reference/R/DataFrameOperationR.R:452-520`).
  *
  * Scoring is Okapi BM25 (Robertson et al., TREC-3) with k1=1.2,
  * b=0.75, re-expressed in EXACT integer arithmetic so the DuckDB
  * oracle replays it bit-for-bit (same convention as t05's rational
  * idf and t09's integer surprisal — no `ln`, no cross-engine libm
  * drift, and BIGINT sums are order-free where double sums are not):
  *
  *  - `idf_e4  = (2N − 2df + 1)·10⁴ DIV (2df + 1)` — BM25's
  *    `ln((N − df + ½)/(df + ½))` argument as a rational in 1e-4 units
  *    (monotone in the real idf; strictly positive for df ≤ N).
  *  - `tfn_e6  = 22·T·tf·10⁶ DIV (10·T·tf + 3·T + 9·dl·N)` — the tf
  *    saturation `tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))` with
  *    avgdl = T/N multiplied through: numerator and denominator scaled
  *    by 10T so every operand is a BIGINT.
  *  - per-(query, doc) `score = Σ_t idf_e4·tfn_e6` — a BIGINT sum
  *    (bounded: idf_e4 ≤ 2N·10⁴, tfn_e6 < 2.2·10⁶, so even a 10⁹-doc
  *    corpus with 100-term queries stays far below 2⁶³).
  *
  * Query workload: every document with `doc_id % 100 == 7` queries the
  * corpus with its distinct terms (query tf ignored — the standard
  * short-query convention), self-match excluded, top-5 by score desc /
  * doc_id asc.
  *
  * Plan at 100 TB: a textbook inverted-index retrieval —
  *  - ONE corpus-wide (doc,term) aggregate builds the postings (tf);
  *    df folds out of it with a second term-keyed aggregate, both with
  *    map-side partial aggregation;
  *  - the query term list is broadcast, so candidate generation is a
  *    broadcast-hash semi-filter of the postings (no term-keyed
  *    shuffle of the corpus against the queries);
  *  - df for the query vocabulary is itself broadcast (vocab-of-query
  *    sized), corpus totals ride a 1-row broadcast frame;
  *  - the only remaining exchange is the candidate-sized
  *    (query_id, doc_id) sum + the per-query window — both scale with
  *    matches, not with the corpus.
  */
object Retrieval {

  /** Query selector: documents with `doc_id % QueryMod == QueryRem`. */
  val QueryMod = 100L
  val QueryRem = 7L

  /** Results per query. */
  val TopK = 5

  def s10Bm25TopK(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
      .withColumn("ws", split(col("text"), " "))
    // dl rides the groupBy key: doc_id determines it, so the wider key
    // costs nothing and saves a postings⋈lengths join
    val tf = d.select(col("doc_id"), size(col("ws")).cast(LongType).as("dl"),
        explode(col("ws")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // tf is already distinct per (doc, term) — df is a fold over it
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // corpus totals as a 1-row broadcast frame (no eager driver count)
    val totals = d.agg(count(lit(1)).as("n_docs"),
      sum(size(col("ws")).cast(LongType)).as("t_tokens"))
    val qterms = d.filter(pmod(col("doc_id"), lit(QueryMod)) === QueryRem)
      .select(col("doc_id").as("query_id"),
        explode(array_distinct(col("ws"))).as("term"))
    // query vocabulary df — query-sized, broadcast back into candidates
    val qdf = dfreq.join(broadcast(qterms.select(col("term")).distinct()),
      "term")
    val scored = tf
      .join(broadcast(qterms), "term")
      .filter(col("doc_id") =!= col("query_id"))
      .join(broadcast(qdf), "term")
      .crossJoin(broadcast(totals))
      .withColumn("idf_e4",
        expr("(2*n_docs - 2*df + 1) * 10000L DIV (2*df + 1)"))
      .withColumn("tfn_e6",
        expr("(22 * t_tokens * tf * 1000000L) DIV " +
          "(10*t_tokens*tf + 3*t_tokens + 9*dl*n_docs)"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(expr("idf_e4 * tfn_e6")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= TopK)
      .select(col("query_id"), col("rn"), col("doc_id"), col("score"))
      .orderBy(col("query_id"), col("rn"))
  }

  /** Oracle: the same postings/df/totals derivation and the same
    * integer BM25 arithmetic (`//` ≡ Spark's `DIV` on non-negative
    * operands); SUM cast back to BIGINT (DuckDB widens to HUGEINT). */
  val s10Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
       |    unnest(string_split(text, ' ')) AS term
       |  FROM documents
       |), tf AS (
       |  SELECT doc_id, dl, term, COUNT(*) AS tf FROM t GROUP BY 1, 2, 3
       |), dfreq AS (
       |  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
       |), tot AS (
       |  SELECT COUNT(*) AS n_docs,
       |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS t_tokens
       |  FROM documents
       |), q AS (
       |  SELECT doc_id AS query_id,
       |    unnest(list_distinct(string_split(text, ' '))) AS term
       |  FROM documents WHERE doc_id % $QueryMod = $QueryRem
       |), scored AS (
       |  SELECT q.query_id, f.doc_id,
       |    CAST(SUM(
       |      ((2*n_docs - 2*df + 1) * 10000 // (2*df + 1))
       |      * ((22 * t_tokens * tf * 1000000)
       |         // (10*t_tokens*tf + 3*t_tokens + 9*dl*n_docs))
       |    ) AS BIGINT) AS score
       |  FROM q JOIN tf f USING (term) JOIN dfreq USING (term)
       |  CROSS JOIN tot
       |  WHERE f.doc_id <> q.query_id
       |  GROUP BY 1, 2
       |), ranked AS (
       |  SELECT query_id, doc_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id) AS rn
       |  FROM scored
       |)
       |SELECT query_id, CAST(rn AS INT) AS rn, doc_id, score
       |FROM ranked WHERE rn <= $TopK
       |ORDER BY query_id, rn""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s10_bm25_topk" -> (s10Bm25TopK _),
  )

  val oracle: Map[String, String] = Map(
    "s10_bm25_topk" -> s10Sql,
  )
}
