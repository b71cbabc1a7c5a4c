package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The end-to-end training-data cleaning pipeline as ONE lazy dataflow —
  * what a user of this library actually runs over a raw corpus:
  *
  *  1. quality gate (Gopher/C4-style cheap filters, [[TextStats.qualityScored]]),
  *  2. exact dedup (one hash shuffle on the content digest, keep the
  *     smallest doc_id per identical text),
  *  3. near-dup removal (MinHash LSH pairs → connected-component labels
  *     → drop every non-representative member).
  *
  * Each stage consumes the previous stage's *frame*, so the whole thing
  * is shuffle-shaped end to end: no driver materialization, no
  * collect(), and every stage is the frame-parameterized core of an
  * operator that is also tested standalone (t02/d01/d03/d07/d09). At
  * 100 TB the stages are: one scan + filter, one digest shuffle, the
  * LSH band shuffles over survivors only, and two label-propagation
  * joins per CC round over the (tiny) near-dup subgraph.
  */
object Pipeline {

  val QualityThreshold = 0.3

  /** Frame-parameterized pipeline core. */
  def cleanCorpus(docs: DataFrame): DataFrame = {
    // 1. quality gate
    val quality = TextStats.qualityScored(docs)
      .filter(col("quality") >= QualityThreshold)
      .select(col("doc_id"), col("text"), col("n_chars"))
    // 2. exact dedup: keep the smallest doc_id per identical text
    val keep = quality
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val exact = quality.join(keep, Seq("doc_id"), "left_semi")
      .localCheckpoint() // feeds the LSH band join twice + the anti join
    // 3. near-dup removal among the survivors (shared stage with d09)
    DupClusters.dropNonRepresentatives(exact,
      Dedup.minHashPairs(exact, threshold = 0.8))
  }

  def p01DedupPipeline(spark: SparkSession, dir: String): DataFrame =
    cleanCorpus(Tables(spark, dir, "documents"))

  /** Oracle: the same three stages as CTEs — quality gate with the
    * shared [[TextStats.qualitySqlExpr]], exact dedup via min-per-digest,
    * then the shared recursive-reachability block over the survivor
    * relation and the final anti join. */
  val p01Sql: String = {
    val stages =
      s"""WITH RECURSIVE qual AS (
         |  SELECT doc_id, text, n_chars FROM documents
         |  WHERE ${TextStats.qualitySqlExpr} >= ${Pipeline.QualityThreshold}
         |), keep AS (
         |  SELECT MIN(doc_id) AS doc_id FROM qual GROUP BY MD5(text)
         |), exact AS (
         |  SELECT q.* FROM qual q JOIN keep k ON q.doc_id = k.doc_id
         |)""".stripMargin
    val reach = Dedup.shingleCteOver("exact")
      .replaceFirst("^WITH ", ", ") + // splice into the existing WITH chain
      DupClusters.reachCteTail // one shared CC-oracle definition
    stages + reach +
      """
        |SELECT doc_id, n_chars, MD5(text) AS content_md5 FROM exact
        |WHERE doc_id NOT IN (
        |  SELECT doc_id FROM labels WHERE doc_id <> cluster)
        |ORDER BY doc_id""".stripMargin
  }

  /** p02: reproducible content-hash sharding + per-shard corpus stats —
    * the step after cleaning: assign every document to one of N output
    * shards by a hash of its CONTENT (the [[TextStats.t04Fingerprint]]
    * rolling fingerprint), so the shard layout is a pure function of
    * the corpus — independent of input ordering, partitioning, or
    * cluster size — and any re-run (or a different engine) reproduces
    * it exactly. The stats frame is what a pipeline operator watches
    * for shard skew before the write fans out. At 100 TB: one narrow
    * groupBy on N keys with map-side combine; the eventual
    * `write.partitionBy(shard)` inherits whatever parallelism the
    * corpus frame has. */
  def p02ShardStats(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    import org.apache.spark.sql.types.LongType
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        expr("rolling_min_hash(text)").as("fingerprint"),
        col("n_chars"),
        size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
      .withColumn("shard", pmod(col("fingerprint"), lit(8L)))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast(LongType).as("total_tokens"),
        sum(col("n_chars")).cast(LongType).as("total_chars"))
      .orderBy(col("shard"))
  }

  /** Oracle: the shared fingerprint CTE ([[TextStats.fpWithCte]]), the
    * same non-negative modulus (`pmod` ≡ ((x % 8) + 8) % 8), the same
    * per-shard aggregates. */
  val p02Sql: String = TextStats.fpWithCte +
    """,
      |tok AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
      |  FROM documents
      |)
      |SELECT ((fingerprint % 8) + 8) % 8 AS shard,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM fp JOIN tok USING (doc_id)
      |GROUP BY 1 ORDER BY shard""".stripMargin

  /** Per-shard token budget for [[p03TokenBudget]] — binding at
    * sf0.01/sf0.1 (selects a strict subset), trivially-all at
    * sf0.001 (a 50-doc corpus fits any budget; still hash-exact). */
  val ShardTokenBudget = 2000L

  /** p03: token-budget corpus selection — the final step of a
    * training-data pipeline: given a cleaned corpus and a token budget,
    * keep the highest-quality documents whose cumulative token count
    * fits the budget.
    *
    * The selection is PER SHARD (the p02 content-hash shards), not
    * global: each shard sorts only its own documents (quality desc,
    * doc_id as the total-order tiebreak) and takes a prefix by running
    * token sum — so there is no global sort anywhere, the one
    * operation that cannot scale to 100 TB. Shard count is the
    * parallelism knob (8 for the fixture; thousands at scale), and a
    * global budget B just becomes B/N per shard — the same way every
    * large corpus-selection run actually splits its budget. One narrow
    * shuffle on the shard key, in-partition sort bounded by shard
    * size, running sum in the same pass. */
  def p03TokenBudget(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.LongType
    graft.functions.VectorExpressions.register(spark)
    val base = TextStats.qualityScored(Tables(spark, dir, "documents"))
      .withColumn("shard",
        pmod(expr("rolling_min_hash(text)"), lit(8L)))
      .withColumn("n_tokens", size(col("ws")).cast(LongType))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("cum_tokens",
        sum(col("n_tokens")).over(w).cast(LongType))
      .filter(col("cum_tokens") <= ShardTokenBudget)
      .select(col("shard"), col("doc_id"), col("quality"),
        col("n_tokens"), col("cum_tokens"))
      .orderBy(col("shard"), col("doc_id"))
  }

  /** Oracle: the shared fingerprint CTE + the shared quality
    * expression, the same per-shard window prefix sum. The order key
    * (quality DESC, doc_id) is total — doc_id is unique — so the
    * running sums are deterministic in both engines. */
  val p03Sql: String = TextStats.fpWithCte +
    s""",
       |qual AS (
       |  SELECT doc_id, ${TextStats.qualitySqlExpr} AS quality,
       |    len(string_split(text, ' ')) AS n_tokens
       |  FROM documents
       |),
       |sel AS (
       |  SELECT ((f.fingerprint % 8) + 8) % 8 AS shard, q.doc_id,
       |    q.quality, q.n_tokens,
       |    CAST(SUM(q.n_tokens) OVER (
       |      PARTITION BY ((f.fingerprint % 8) + 8) % 8
       |      ORDER BY q.quality DESC, q.doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS cum_tokens
       |  FROM fp f JOIN qual q USING (doc_id)
       |)
       |SELECT shard, doc_id, quality, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  cum_tokens
       |FROM sel WHERE cum_tokens <= ${ShardTokenBudget}
       |ORDER BY shard, doc_id""".stripMargin

  /** Per-language keep rates in per-mille for [[p04StratifiedSample]] —
    * the fixture corpus is ~44% English, so English is down-sampled
    * hardest (the standard rebalancing move in corpus construction). */
  val SampleRatesPerMille: Seq[(String, Long)] =
    Seq("en" -> 400L, "es" -> 800L, "de" -> 800L, "fr" -> 1000L,
      "zh" -> 600L)

  /** p04: deterministic stratified down-sampling — keep a per-language
    * fraction of the corpus, selected by CONTENT-hash bucket rather
    * than a PRNG. `rand(seed)`-based sampling is partition-order
    * dependent (a repartition or a different cluster silently changes
    * the sample); hashing the text into one of 1000 buckets and keeping
    * `bucket < rate‰` makes membership a pure function of the document
    * — reproducible across runs, engines and cluster sizes, identical
    * for byte-identical duplicates, and exactly mirrorable in oracle
    * SQL. Plan-wise this is a narrow map + filter: zero shuffles, no
    * state — at 100 TB it is scan-bound by construction. */
  /** The selection core: a narrow map + filter with ZERO exchanges
    * (asserted in ScaleDesignSpec) — the final presentation `orderBy`
    * lives only in [[p04StratifiedSample]]. */
  def stratifiedSampleCore(docs: DataFrame): DataFrame = {
    graft.functions.VectorExpressions.register(docs.sparkSession)
    val keepBelow = SampleRatesPerMille.tail.foldLeft(
      when(col("lang") === SampleRatesPerMille.head._1,
        lit(SampleRatesPerMille.head._2))) {
      case (acc, (lang, rate)) => acc.when(col("lang") === lang, lit(rate))
    }.otherwise(lit(0L))
    docs
      .withColumn("bucket",
        pmod(expr("rolling_min_hash(text)"), lit(1000L)))
      .filter(col("bucket") < keepBelow)
      .select(col("doc_id"), col("lang"), col("bucket"))
  }

  def p04StratifiedSample(spark: SparkSession, dir: String): DataFrame =
    stratifiedSampleCore(Tables(spark, dir, "documents"))
      .orderBy(col("doc_id"))

  /** Oracle: the shared fingerprint CTE, the same non-negative modulus
    * and the same per-language thresholds as a CASE. */
  val p04Sql: String = {
    val cases = SampleRatesPerMille
      .map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ")
    TextStats.fpWithCte +
      s"""
         |SELECT d.doc_id, d.lang,
         |  ((f.fingerprint % 1000) + 1000) % 1000 AS bucket
         |FROM documents d JOIN fp f ON d.doc_id = f.doc_id
         |WHERE ((f.fingerprint % 1000) + 1000) % 1000
         |  < CASE d.lang $cases ELSE 0 END
         |ORDER BY d.doc_id""".stripMargin
  }

  /** p05: uniform-mixture rebalancing — down-sample every language to
    * the SMALLEST language's size, the standard move when one stratum
    * dominates a corpus mix (the fixture is ~44% English). Unlike p04
    * (fixed per-language rates), the keep rates here are DERIVED FROM
    * THE DATA: per-language counts → per-mille rate `⌊1000·n_min/n_l⌋`
    * — so the operator is self-tuning as the corpus drifts. Membership
    * is the same content-hash bucket rule as p04 (pure function of the
    * document; reproducible across runs, engines and partitionings —
    * `rand()` sampling is none of those).
    *
    * Plan shape at 100 TB: one per-language count (K rows, map-side
    * combine), a 1-row global min, the K-row rates frame broadcast back
    * onto the corpus — the corpus itself is never shuffled; the filter
    * is scan-adjacent and narrow. All arithmetic is integer, so the
    * oracle replays membership exactly. */
  def p05MixtureRebalance(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    val docs = Tables(spark, dir, "documents")
    val counts = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_lang"))
    val minCount = counts.agg(min(col("n_lang")).as("n_min"))
    val rates = counts.crossJoin(broadcast(minCount))
      .select(col("lang"),
        expr("1000 * n_min DIV n_lang").as("keep_per_mille"))
    docs
      .withColumn("bucket",
        pmod(expr("rolling_min_hash(text)"), lit(1000L)))
      .join(broadcast(rates), "lang")
      .filter(col("bucket") < col("keep_per_mille"))
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: the shared fingerprint CTE, the same integer rate
    * derivation (`//` ≡ Spark's `DIV` on non-negative counts), the same
    * non-negative modulus. */
  val p05Sql: String = TextStats.fpWithCte +
    """,
      |counts AS (
      |  SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY lang
      |),
      |rates AS (
      |  SELECT lang, 1000 * (SELECT MIN(n_lang) FROM counts) // n_lang
      |    AS keep_per_mille
      |  FROM counts
      |)
      |SELECT d.doc_id, d.lang,
      |  ((f.fingerprint % 1000) + 1000) % 1000 AS bucket
      |FROM documents d
      |JOIN fp f ON d.doc_id = f.doc_id
      |JOIN rates r ON d.lang = r.lang
      |WHERE ((f.fingerprint % 1000) + 1000) % 1000 < r.keep_per_mille
      |ORDER BY d.doc_id""".stripMargin

  /** p06: leakage-safe train/validation split — the assignment step a
    * training-data pipeline runs LAST, with the property that matters:
    * near-duplicate documents can never straddle the split (a val doc
    * whose near-twin sits in train silently inflates eval). Membership
    * is decided per DUPLICATE CLUSTER, not per document: near-dup
    * components (the shared MinHash-LSH + label-propagation stages of
    * d03/d07) elect their min-id representative, every member inherits
    * the representative's content-hash bucket, and bucket < 9 ⇒ train
    * (a 90/10 split). Singletons are their own representative, so the
    * whole assignment stays a pure function of corpus content —
    * reproducible across runs, engines, partitionings.
    *
    * Plan shape at 100 TB: the LSH/CC stages are d03/d07's (banded,
    * capped, O(diameter) rounds over the near-dup subgraph only); the
    * rest is one left join of labels onto the corpus and one equi-join
    * to fetch the representative's fingerprint bucket — all
    * shuffle-shaped, nothing driver-side. */
  def p06LeakageSafeSplit(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    val docs = Tables(spark, dir, "documents")
    val labels = DupClusters.connectedComponents(
      Dedup.minHashPairs(docs, threshold = 0.8))
    val rep = docs.join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("doc_id")).as("rep"))
    val buckets = docs.select(col("doc_id").as("fp_id"),
      pmod(expr("rolling_min_hash(text)"), lit(10L)).as("bucket"))
    rep.join(buckets, col("rep") === col("fp_id"))
      .withColumn("split",
        when(col("bucket") < 9, lit("train")).otherwise(lit("val")))
      .select(col("doc_id"), col("rep"), col("bucket"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: the shared exact-Jaccard reachability labels + the shared
    * fingerprint CTE, representative bucket via the same COALESCE. */
  val p06Sql: String = {
    val reach = Dedup.shingleOracleCte
      .replaceFirst("^WITH ", "WITH RECURSIVE ") + DupClusters.reachCteTail
    reach + TextStats.fpWithCte.replaceFirst("^WITH ", ", ") +
      """
        |SELECT d.doc_id,
        |  COALESCE(l.cluster, d.doc_id) AS rep,
        |  ((f.fingerprint % 10) + 10) % 10 AS bucket,
        |  CASE WHEN ((f.fingerprint % 10) + 10) % 10 < 9
        |    THEN 'train' ELSE 'val' END AS split
        |FROM documents d
        |LEFT JOIN labels l ON d.doc_id = l.doc_id
        |JOIN fp f ON f.doc_id = COALESCE(l.cluster, d.doc_id)
        |ORDER BY d.doc_id""".stripMargin
  }

  /** p07: the complete corpus-preparation run — "prepare a training
    * corpus" end to end, as ONE lazy dataflow:
    *
    *  1. benchmark decontamination (t08's n-gram-overlap core): drop
    *     the benchmark slice itself (source = src0) and every training
    *     doc sharing ≥ [[TextStats.ContaminationRatio]] of its 3-gram
    *     shingles with it,
    *  2. quality gate → 3. exact dedup → 4. near-dup removal: the
    *     [[cleanCorpus]] stages, reused unchanged.
    *
    * Docs too short to shingle have no measurable overlap and pass the
    * decontamination gate (they are absent from the contaminated set).
    * Scale shape: the benchmark shingle set is tiny next to a 100 TB
    * corpus and broadcasts; the corpus is never self-joined outside the
    * LSH band buckets inside cleanCorpus; decontamination itself is one
    * posting join + per-doc aggregate. The contaminated set carries
    * n_shingles through the groupBy instead of joining sizes back —
    * docs with zero shared shingles can never reach the 0.5 ratio, so
    * their absence from the aggregate is exactly the semantics. */
  def p07CorpusPrep(spark: SparkSession, dir: String): DataFrame =
    prepareCorpus(Tables(spark, dir, "documents"))

  /** Frame-parameterized core of p07 over any (doc_id, text, lang,
    * source, n_chars) relation — unit-tested with planted benchmark
    * copies and near-dup pairs in LlmOpsSpec. */
  private[graft] def prepareCorpus(docs: DataFrame): DataFrame = {
    // decontamination = t08's shared core ([[TextStats
    // .contaminationScores]]) filtered at the same threshold; docs too
    // short to shingle are absent from the scores and survive the anti
    // join. (The shingled frame inside the core feeds two plan
    // branches; recomputing the codegen'd shingle pass per branch
    // measured FASTER than localCheckpoint'ing it once — 5.1 vs 5.7 s
    // median at sf0.1: wide shingle arrays cost more to materialize
    // than to recompute.)
    val contaminated = TextStats.contaminationScores(docs)
      .filter(col("ratio") >= TextStats.ContaminationRatio)
      .select(col("doc_id"))
    val decon = docs.filter(col("source") =!= "src0")
      .join(contaminated, Seq("doc_id"), "left_anti")
    cleanCorpus(decon)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        col("content_md5"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: the full-corpus shingle chain (suffix 0) feeds the
    * contamination gate; the survivor chain (default names) feeds the
    * shared reachability block — two spliced [[Dedup.shingleCteOver]]
    * instances plus [[DupClusters.reachCteTail]], then p01's final
    * anti-join shape with lang joined back. */
  val p07Sql: String = {
    val full = Dedup.shingleCteOver("documents", "0", pairs = false)
      .replaceFirst("^WITH ", "WITH RECURSIVE ")
    val clean =
      s""", bsh AS (
         |  SELECT DISTINCT e.sg FROM ex0 e
         |  JOIN documents d ON e.doc_id = d.doc_id WHERE d.source = 'src0'
         |), contam AS (
         |  SELECT e.doc_id FROM ex0 e
         |  JOIN bsh USING (sg)
         |  JOIN documents d ON e.doc_id = d.doc_id
         |  JOIN sz0 z ON e.doc_id = z.doc_id
         |  WHERE d.source <> 'src0'
         |  GROUP BY e.doc_id, z.n
         |  HAVING CAST(COUNT(*) AS DOUBLE) / z.n
         |    >= ${TextStats.ContaminationRatio}
         |), decon AS (
         |  SELECT d.* FROM documents d WHERE d.source <> 'src0'
         |    AND d.doc_id NOT IN (SELECT doc_id FROM contam)
         |), qual AS (
         |  SELECT doc_id, text, n_chars FROM decon
         |  WHERE ${TextStats.qualitySqlExpr} >= ${Pipeline.QualityThreshold}
         |), keep AS (
         |  SELECT MIN(doc_id) AS doc_id FROM qual GROUP BY MD5(text)
         |), exact AS (
         |  SELECT q.* FROM qual q JOIN keep k ON q.doc_id = k.doc_id
         |)""".stripMargin
    val reach = Dedup.shingleCteOver("exact").replaceFirst("^WITH ", ", ") +
      DupClusters.reachCteTail
    full + clean + reach +
      """
        |SELECT e.doc_id, d.lang, e.n_chars, MD5(e.text) AS content_md5
        |FROM exact e JOIN documents d ON e.doc_id = d.doc_id
        |WHERE e.doc_id NOT IN (
        |  SELECT doc_id FROM labels WHERE doc_id <> cluster)
        |ORDER BY e.doc_id""".stripMargin
  }

  /** p08: per-language quality calibration — raw quality scores are not
    * comparable across languages (heuristics like stopword ratio are
    * language-biased: the stopword list here is English), so a global
    * quality gate silently skews the mix. The standard fix: replace the
    * raw score with its WITHIN-LANGUAGE percentile (percent_rank over a
    * total order), then gate on the calibrated score — "keep the top
    * half of every language" instead of "keep whatever clears an
    * English-tuned constant".
    *
    * The order key (quality, doc_id) is total (doc_id unique), so every
    * rank — and the rational (rank−1)/(N−1) percentile — is
    * deterministic and engine-exact (quality itself is rational
    * arithmetic, NOTES.md). Plan shape at any scale: one shuffle on
    * lang, in-partition sort; per-language skew is the one watch item
    * (a 90%-English corpus sorts 90% of rows in one partition — shard
    * the window key the way p03 shards its budget if that bites). */
  def p08QualityCalibration(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("quality"), col("doc_id"))
    TextStats.qualityScored(Tables(spark, dir, "documents"))
      .select(col("doc_id"), col("lang"), col("quality"))
      .withColumn("q_cal", percent_rank().over(w))
      .withColumn("keep", col("q_cal") >= 0.5)
      .orderBy(col("doc_id"))
  }

  /** Oracle: the shared quality expression + the same window. */
  val p08Sql: String =
    s"""WITH qual AS (
       |  SELECT doc_id, lang, ${TextStats.qualitySqlExpr} AS quality
       |  FROM documents
       |)
       |SELECT doc_id, lang, quality,
       |  percent_rank() OVER (PARTITION BY lang
       |    ORDER BY quality, doc_id) AS q_cal,
       |  percent_rank() OVER (PARTITION BY lang
       |    ORDER BY quality, doc_id) >= 0.5 AS keep
       |FROM qual ORDER BY doc_id""".stripMargin

  /** Epoch cap for [[p09EpochMixing]]: no language repeats more than
    * this many times however rare it is (the standard guard against
    * over-repeating a tiny stratum until the model memorizes it). */
  val MaxEpochsPerMille = 4000L

  /** p09: epoch-weighted corpus materialization — the OVERSAMPLING
    * counterpart of p05: instead of cutting every language down to the
    * smallest stratum, repeat rare languages for fractional epochs so
    * the training mix approaches uniform without discarding majority
    * data. Per-language repeat rate (per-mille) is data-derived:
    * `min(cap, 1000·n_max DIV n_l)` — the largest language runs exactly
    * 1 epoch, rarer ones proportionally more, capped at
    * [[MaxEpochsPerMille]]. Whole epochs copy every document; the
    * fractional remainder is decided per document by the same
    * content-hash bucket rule as p04/p05 (a pure function of the text —
    * reproducible across runs, engines, partitionings; `rand()` is
    * none of those). Output is one row per (doc, epoch).
    *
    * Plan shape at 100 TB: K-row rates frame (two tiny aggregates)
    * broadcast onto the corpus, then a narrow explode — the corpus is
    * never shuffled and the blow-up is bounded by the epoch cap. All
    * arithmetic is integer, so the oracle replays membership exactly. */
  def p09EpochMixing(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    graft.functions.VectorExpressions.register(spark)
    val docs = Tables(spark, dir, "documents")
    val counts = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_lang"))
    val maxCount = counts.agg(max(col("n_lang")).as("n_max"))
    val rates = counts.crossJoin(broadcast(maxCount))
      .select(col("lang"),
        least(lit(MaxEpochsPerMille), expr("1000 * n_max DIV n_lang"))
          .as("rate_pm"))
    docs
      .withColumn("bucket",
        pmod(expr("rolling_min_hash(text)"), lit(1000L)))
      .join(broadcast(rates), "lang")
      // whole epochs + one more iff the doc's bucket clears the
      // fractional remainder; rate_pm >= 1000 so n_copies >= 1 always
      .withColumn("n_copies",
        (expr("rate_pm DIV 1000") +
          when(col("bucket") < col("rate_pm") % 1000, lit(1L))
            .otherwise(lit(0L))).cast(LongType))
      .select(col("doc_id"), col("lang"),
        explode(expr("sequence(0L, n_copies - 1)")).as("epoch"))
      .orderBy(col("doc_id"), col("epoch"))
  }

  /** Oracle: same integer rate derivation, same bucket rule, copies via
    * an uncorrelated range + filter (DuckDB 1.0 has no LATERAL range —
    * the m03 technique). The range bound is the epoch cap. */
  val p09Sql: String = TextStats.fpWithCte +
    s""",
       |counts AS (
       |  SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY lang
       |),
       |rates AS (
       |  SELECT lang,
       |    least($MaxEpochsPerMille,
       |      1000 * (SELECT MAX(n_lang) FROM counts) // n_lang) AS rate_pm
       |  FROM counts
       |),
       |base AS (
       |  SELECT d.doc_id, d.lang,
       |    r.rate_pm // 1000 +
       |      CASE WHEN ((f.fingerprint % 1000) + 1000) % 1000
       |        < r.rate_pm % 1000 THEN 1 ELSE 0 END AS n_copies
       |  FROM documents d
       |  JOIN fp f ON d.doc_id = f.doc_id
       |  JOIN rates r ON d.lang = r.lang
       |)
       |SELECT b.doc_id, b.lang, CAST(t.i AS BIGINT) AS epoch
       |FROM base b JOIN range(0, ${MaxEpochsPerMille / 1000 + 1}) t(i)
       |  ON t.i < b.n_copies
       |ORDER BY b.doc_id, epoch""".stripMargin

  /** p10: curriculum ordering — the LAST decision a training-data
    * pipeline makes: in what order the corpus is fed. Docs are binned
    * into 4 quality bands by their within-language percentile (p08's
    * calibration, so bands are language-fair), and within each band the
    * feed order is assigned PER content-hash shard (p02's sharding):
    * `ord` is a row_number over (band, shard) keyed by the rolling
    * fingerprint — a pure function of corpus content, so the curriculum
    * is reproducible across runs/engines/partitionings, and no global
    * sort exists anywhere (the consumer interleaves shards round-robin
    * within a band). floor(percentile·4) is computed on bit-identical
    * doubles in both engines, so band edges cannot disagree. One
    * lang-window shuffle + one (band, shard)-window shuffle. */
  def p10Curriculum(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.LongType
    graft.functions.VectorExpressions.register(spark)
    val wLang = Window.partitionBy(col("lang"))
      .orderBy(col("quality"), col("doc_id"))
    val scored = TextStats.qualityScored(Tables(spark, dir, "documents"))
      .withColumn("fp", expr("rolling_min_hash(text)"))
      .select(col("doc_id"), col("lang"), col("quality"), col("fp"))
      .withColumn("band",
        least(lit(3L), floor(percent_rank().over(wLang) * 4)))
    scored
      .withColumn("shard", pmod(col("fp"), lit(8L)))
      .withColumn("ord", row_number().over(
        Window.partitionBy(col("band"), col("shard"))
          .orderBy(col("fp"), col("doc_id"))).cast(LongType))
      .select(col("doc_id"), col("band"), col("shard"), col("ord"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: the shared quality expression + fingerprint CTE, the same
    * percentile banding and per-(band, shard) row_number. */
  val p10Sql: String = TextStats.fpWithCte +
    s""",
       |qual AS (
       |  SELECT doc_id, lang, ${TextStats.qualitySqlExpr} AS quality
       |  FROM documents
       |),
       |banded AS (
       |  SELECT q.doc_id,
       |    least(3, CAST(floor(percent_rank() OVER (PARTITION BY q.lang
       |      ORDER BY q.quality, q.doc_id) * 4) AS BIGINT)) AS band,
       |    ((f.fingerprint % 8) + 8) % 8 AS shard, f.fingerprint AS fp
       |  FROM qual q JOIN fp f ON q.doc_id = f.doc_id
       |)
       |SELECT doc_id, band, shard,
       |  CAST(row_number() OVER (PARTITION BY band, shard
       |    ORDER BY fp, doc_id) AS BIGINT) AS ord
       |FROM banded ORDER BY doc_id""".stripMargin

  /** Tokens per training pack for [[p12ShardPacking]] — small so the
    * fixture yields many packs per shard; real pipelines use
    * sequence-length × batch-size. */
  val PackTokens = 512L

  /** p12: training-shard packing — the sequence-packing step between
    * corpus selection and training: stream each shard's documents (in
    * the reproducible content-hash order, as p10) into consecutive
    * ~[[PackTokens]]-token packs. A document's pack is where its FIRST
    * token lands (streaming fill — packs absorb boundary overflow
    * rather than splitting documents), so pack assignment is one
    * prefix sum + one integer division: no iteration, no driver state.
    *
    * Scale: identical shape to p03 — one shuffle on the shard key,
    * per-shard in-partition sort, running sum and the pack agg in the
    * same partitioning. Pack sizes concentrate around PackTokens
    * (boundary docs overflow by at most one doc's tokens). */
  def p12ShardPacking(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    graft.functions.VectorExpressions.register(spark)
    packByTokens(Tables(spark, dir, "documents")
      .select(col("doc_id"),
        expr("rolling_min_hash(text)").as("fingerprint"),
        size(split(col("text"), " ")).cast(LongType).as("n_tokens")))
  }

  /** THE packing algebra, shared by p12 (whitespace-estimate tokens)
    * and p22 (exact BPE tokens): content-hash shard, deterministic
    * (fingerprint, doc_id) fill order, fill-start integer division
    * into packs, pack-grain aggregate. One definition — the packing
    * contract (budget semantics, tie-break, boundary math) cannot
    * drift between the estimate and exact variants. Input:
    * `(doc_id, fingerprint, n_tokens)`. */
  private def packByTokens(base0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.LongType
    val base = base0.withColumn("shard", pmod(col("fingerprint"), lit(8L)))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("fingerprint"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w).cast(LongType))
      .withColumn("pack_id",
        expr(s"(cum_tokens - n_tokens) DIV $PackTokens"))
      .groupBy(col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast(LongType).as("pack_tokens"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("shard"), col("pack_id"))
  }

  /** Oracle: the shared fingerprint CTE, same content-hash order
    * (fingerprint, doc_id — total, doc_id unique), same fill-start
    * integer division (both floor on non-negative operands). */
  val p12Sql: String = TextStats.fpWithCte +
    s""",
       |tok AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
       |  FROM documents
       |),
       |sh AS (
       |  SELECT f.doc_id, f.fingerprint,
       |    ((f.fingerprint % 8) + 8) % 8 AS shard, t.n_tokens,
       |    SUM(t.n_tokens) OVER (
       |      PARTITION BY ((f.fingerprint % 8) + 8) % 8
       |      ORDER BY f.fingerprint, f.doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS cum_tokens
       |  FROM fp f JOIN tok t USING (doc_id)
       |)
       |SELECT shard, CAST((cum_tokens - n_tokens) // $PackTokens AS BIGINT)
       |    AS pack_id,
       |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
       |  MIN(doc_id) AS first_doc
       |FROM sh GROUP BY 1, 2 ORDER BY shard, pack_id""".stripMargin

  /** p22: shard packing by EXACT tokenizer counts — p12's
    * content-hash packing with the fill measured in the learned BPE
    * vocabulary's tokens ([[Tokenizer.perDocBpeTokens]]) instead of
    * whitespace words. This closes the loop t20's scaladoc promises:
    * the token number every shard-packing / token-budget decision
    * actually wants is the TOKENIZER's, and estimates misplace pack
    * boundaries (a doc whose BPE fertility is 1.4 spills its pack ~40%
    * early) — the spec pins that the boundaries really move vs p12.
    * Plan shape: the vocabulary chain reduces to a broadcast map, the
    * corpus pays one explode + one doc_id aggregate for the counts,
    * then ONE doc_id-keyed join onto the fingerprint frame and p12's
    * shard-window prefix sum — no new corpus-scale shuffle class. */
  def p22BpePacking(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    val enc = Tokenizer.perDocBpeTokens(spark, dir)
      .select(col("doc_id"), col("n_bpe").as("n_tokens"))
    packByTokens(Tables(spark, dir, "documents")
      .select(col("doc_id"),
        expr("rolling_min_hash(text)").as("fingerprint"))
      .join(enc, "doc_id"))
  }

  /** p22 oracle: the tokenizer chain's per-doc counts
    * ([[Tokenizer.bpeDocTokenCtes]]) spliced with the fingerprint CTE
    * and p12's packing algebra — three already-certified CTE texts
    * composed into one statement, so none of the arithmetic can
    * drift. */
  val p22Sql: String =
    Tokenizer.bpeDocTokenCtes + ",\n" +
      TextStats.fpWithCte.stripPrefix("WITH ") +
      s""",
         |psh AS (
         |  SELECT f.doc_id, f.fingerprint,
         |    ((f.fingerprint % 8) + 8) % 8 AS shard, d.n_bpe AS n_tokens,
         |    SUM(d.n_bpe) OVER (
         |      PARTITION BY ((f.fingerprint % 8) + 8) % 8
         |      ORDER BY f.fingerprint, f.doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS cum_tokens
         |  FROM fp f JOIN doc_bpe d USING (doc_id)
         |)
         |SELECT shard,
         |  CAST((cum_tokens - n_tokens) // $PackTokens AS BIGINT) AS pack_id,
         |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
         |  MIN(doc_id) AS first_doc
         |FROM psh GROUP BY 1, 2 ORDER BY shard, pack_id""".stripMargin

  /** p11: corpus snapshot diff — the dataset-versioning audit run
    * between two crawls/releases: which documents were added, removed,
    * or changed. Comparison is by content digest (like d02's hash
    * dedup), so the join ships 16-byte md5s, never the text; the join
    * keys on doc_id, which both snapshots would be bucketed by in a
    * real store — co-located merge join, no extra exchange.
    *
    * Snapshot B is simulated in-query (the fixture has only one
    * snapshot): every doc_id % 10 == 0 removed, every surviving
    * doc_id % 7 == 0 revised, and a doc_id % 13 == 0 slice re-ingested
    * under new ids. Production points the same diff at two real
    * snapshot tables. */
  def p11SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val a = docs.select(col("doc_id"), md5(col("text")).as("md5_a"))
    val bKept = docs.filter(col("doc_id") % 10 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")))
      .select(col("doc_id"), col("text"))
    val bNew = docs.filter(col("doc_id") % 13 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(lit("fresh "), col("text")).as("text"))
    val b = bKept.union(bNew)
      .select(col("doc_id"), md5(col("text")).as("md5_b"))
    a.join(b, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("md5_a").isNull, "added")
          .when(col("md5_b").isNull, "removed")
          .when(col("md5_a") =!= col("md5_b"), "changed")
          .otherwise("unchanged"))
      .filter(col("status") =!= "unchanged")
      .select(col("doc_id"), col("status"))
      .orderBy(col("doc_id"))
  }

  val p11Sql: String =
    """WITH a AS (
      |  SELECT doc_id, md5(text) AS md5_a FROM documents
      |), b AS (
      |  SELECT doc_id,
      |    md5(CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END)
      |      AS md5_b
      |  FROM documents WHERE doc_id % 10 <> 0
      |  UNION ALL
      |  SELECT doc_id + 10000000 AS doc_id, md5('fresh ' || text) AS md5_b
      |  FROM documents WHERE doc_id % 13 = 0
      |), j AS (
      |  SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
      |    CASE WHEN a.md5_a IS NULL THEN 'added'
      |         WHEN b.md5_b IS NULL THEN 'removed'
      |         WHEN a.md5_a <> b.md5_b THEN 'changed'
      |         ELSE 'unchanged' END AS status
      |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
      |)
      |SELECT doc_id, status FROM j WHERE status <> 'unchanged'
      |ORDER BY doc_id""".stripMargin

  /** p13: incremental corpus update — the daily production loop: a new
    * crawl batch (doc_id % 3 = 0, d10's split) arrives against the
    * standing corpus (the rest, treated as already cleaned — a real
    * increment never re-cleans its index), and every new doc gets ONE
    * attributable disposition, first matching rule wins:
    *
    *   1. `rejected_quality` — fails the [[QualityThreshold]] gate;
    *   2. `dup_exact_index`  — byte-identical to a standing doc;
    *   3. `dup_exact_batch`  — byte-identical to a smaller-id batch doc;
    *   4. `dup_near_index`   — near-dup (Jaccard ≥ 0.8) of a standing doc;
    *   5. `dup_near_batch`   — near-dup of a smaller-id quality-passing
    *      batch doc (greedy first-seen-wins; if the smaller doc itself
    *      gets dropped the bigger one is a transitive dup — same rule
    *      in the oracle, so the semantics cannot drift);
    *   6. `accepted`.
    *
    * Scale posture is d10's: the standing side ships digests and band
    * buckets only (never text), LSH buckets with no new-batch member
    * produce no candidates, so per-increment cost scales with the
    * batch, not the corpus. The disposition column is what corpus
    * cards and ingestion dashboards consume (q69's `action` pattern,
    * applied to documents). */
  def p13IncrementalUpdate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val newDocs = docs.filter(col("doc_id") % 3 === 0)
    val oldDocs = docs.filter(col("doc_id") % 3 =!= 0)
    val pass = TextStats.qualityScored(newDocs)
      .filter(col("quality") >= QualityThreshold)
      .select(col("doc_id"), col("text"))
    val oldDig = oldDocs.select(md5(col("text")).as("h")).distinct()
    val exactIndex = pass.withColumn("h", md5(col("text")))
      .join(oldDig, Seq("h"), "left_semi").select(col("doc_id"))
    val keepers = pass.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keeper"))
    val exactBatch = pass.withColumn("h", md5(col("text")))
      .join(keepers, "h").filter(col("doc_id") > col("keeper"))
      .select(col("doc_id"))
    // near-dup pairs over standing corpus + quality-passing batch only
    // (a quality-rejected doc must not shadow a batch near-dup)
    val pairs = Dedup.minHashPairs(
      oldDocs.select(col("doc_id"), col("text")).union(pass),
      threshold = 0.8)
    val nearIndex = pairs
      .filter((col("doc_a") % 3 === 0) =!= (col("doc_b") % 3 === 0))
      .select(when(col("doc_a") % 3 === 0, col("doc_a"))
        .otherwise(col("doc_b")).as("doc_id"))
      .distinct()
    val nearBatch = pairs
      .filter((col("doc_a") % 3 === 0) && (col("doc_b") % 3 === 0))
      .select(greatest(col("doc_a"), col("doc_b")).as("doc_id"))
      .distinct()
    newDocs.select(col("doc_id"), col("n_chars"))
      .join(pass.select(col("doc_id")).withColumn("q", lit(1)),
        Seq("doc_id"), "left")
      .join(exactIndex.withColumn("ei", lit(1)), Seq("doc_id"), "left")
      .join(exactBatch.withColumn("eb", lit(1)), Seq("doc_id"), "left")
      .join(nearIndex.withColumn("ni", lit(1)), Seq("doc_id"), "left")
      .join(nearBatch.withColumn("nb", lit(1)), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        when(col("q").isNull, "rejected_quality")
          .when(col("ei") === 1, "dup_exact_index")
          .when(col("eb") === 1, "dup_exact_batch")
          .when(col("ni") === 1, "dup_near_index")
          .when(col("nb") === 1, "dup_near_batch")
          .otherwise("accepted").as("status"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: identical rules — the shared quality expression, digest
    * joins, and the exact-Jaccard pair relation (= LSH+verify at
    * t = 0.8, the d03/d10 equivalence) over standing ∪ passing docs. */
  val p13Sql: String = {
    val head =
      s"""WITH qual AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE doc_id % 3 = 0
         |    AND ${TextStats.qualitySqlExpr} >= $QualityThreshold
         |), univ AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0
         |  UNION ALL SELECT doc_id, text FROM qual
         |)""".stripMargin
    head + Dedup.shingleCteOver("univ").replaceFirst("^WITH ", ", ") +
      """,
        |jp AS (
        |  SELECT doc_a, doc_b FROM pr
        |  JOIN sz x ON x.doc_id = doc_a JOIN sz y ON y.doc_id = doc_b
        |  WHERE CAST(inter AS DOUBLE) / (x.n + y.n - inter) >= 0.8
        |), ei AS (
        |  SELECT DISTINCT q.doc_id FROM qual q JOIN documents o
        |    ON MD5(q.text) = MD5(o.text) AND o.doc_id % 3 <> 0
        |), eb AS (
        |  SELECT q.doc_id FROM qual q
        |  JOIN (SELECT MD5(text) AS h, MIN(doc_id) AS keeper
        |        FROM qual GROUP BY 1) k
        |    ON MD5(q.text) = k.h AND q.doc_id > k.keeper
        |), ni AS (
        |  SELECT DISTINCT CASE WHEN doc_a % 3 = 0 THEN doc_a ELSE doc_b END
        |    AS doc_id
        |  FROM jp WHERE (doc_a % 3 = 0) <> (doc_b % 3 = 0)
        |), nb AS (
        |  SELECT DISTINCT GREATEST(doc_a, doc_b) AS doc_id FROM jp
        |  WHERE doc_a % 3 = 0 AND doc_b % 3 = 0
        |)
        |SELECT d.doc_id, d.n_chars,
        |  CASE WHEN q.doc_id IS NULL THEN 'rejected_quality'
        |       WHEN ei.doc_id IS NOT NULL THEN 'dup_exact_index'
        |       WHEN eb.doc_id IS NOT NULL THEN 'dup_exact_batch'
        |       WHEN ni.doc_id IS NOT NULL THEN 'dup_near_index'
        |       WHEN nb.doc_id IS NOT NULL THEN 'dup_near_batch'
        |       ELSE 'accepted' END AS status
        |FROM documents d
        |LEFT JOIN qual q ON q.doc_id = d.doc_id
        |LEFT JOIN ei ON ei.doc_id = d.doc_id
        |LEFT JOIN eb ON eb.doc_id = d.doc_id
        |LEFT JOIN ni ON ni.doc_id = d.doc_id
        |LEFT JOIN nb ON nb.doc_id = d.doc_id
        |WHERE d.doc_id % 3 = 0
        |ORDER BY d.doc_id""".stripMargin
  }

  /** p14: per-source corpus card — the dataset-documentation frame every
    * corpus release ships (datasheet/data-card row per source): doc and
    * char volume, language spread (distinct langs + modal lang with a
    * deterministic lexicographic tie-break), the quality pass-rate
    * (shared [[TextStats.qualityScored]] expression, so card and gate
    * cannot drift), and a head-fingerprint duplicate count (docs whose
    * first-64-char digest repeats within the source — the cheap
    * boilerplate/mirror proxy; exact and near dedup have their own
    * operators d01/d03, this column is the card-level smell test).
    *
    * Scale shape: the card aggregate is ONE pass over the corpus — the
    * two distinct aggregates (langs, head digests) plan as Catalyst's
    * Expand(×3) with map-side partial collapse, so the shuffle carries
    * per-(source, gid, value) partials, never documents; the modal-lang
    * frame is a (source, lang) aggregate (tiny — sources × langs rows)
    * window-ranked and joined back, AQE-broadcastable. The only wide
    * payload anywhere is a 16-byte digest. quality_rate is one double
    * division of two exact longs, identical operands in the oracle. */
  def p14CorpusCard(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir, "documents")
    val scored = TextStats.qualityScored(docs)
      .select(col("source"), col("lang"), col("n_chars"), col("quality"),
        md5(substring(col("text"), 1, 64)).as("head_h"))
    val cards = scored.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_chars")).as("total_chars"),
      countDistinct(col("lang")).as("n_langs"),
      sum(when(col("quality") >= QualityThreshold, 1L).otherwise(0L))
        .as("n_quality"),
      (count(lit(1)) - countDistinct(col("head_h"))).as("n_head_dups"))
    val topLang = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("n").desc, col("lang"))))
      .filter(col("rk") === 1)
      .select(col("source"), col("lang").as("top_lang"))
    cards.join(topLang, "source")
      .select(col("source"), col("n_docs"), col("total_chars"),
        col("n_langs"),
        (col("n_quality").cast("double") / col("n_docs").cast("double"))
          .as("quality_rate"),
        col("n_head_dups"), col("top_lang"))
      .orderBy(col("source"))
  }

  val p14Sql: String =
    s"""WITH scored AS (
       |  SELECT source, lang, n_chars, md5(substr(text, 1, 64)) AS head_h,
       |    ${TextStats.qualitySqlExpr} AS quality
       |  FROM documents
       |), cards AS (
       |  SELECT source, COUNT(*) AS n_docs,
       |    CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       |    COUNT(DISTINCT lang) AS n_langs,
       |    CAST(SUM(CASE WHEN quality >= $QualityThreshold THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_quality,
       |    COUNT(*) - COUNT(DISTINCT head_h) AS n_head_dups
       |  FROM scored GROUP BY source
       |), top AS (
       |  SELECT source, lang AS top_lang FROM (
       |    SELECT source, lang, ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY COUNT(*) DESC, lang) AS rk
       |    FROM documents GROUP BY source, lang)
       |  WHERE rk = 1
       |)
       |SELECT c.source, n_docs, total_chars, n_langs,
       |  CAST(n_quality AS DOUBLE) / CAST(n_docs AS DOUBLE) AS quality_rate,
       |  n_head_dups, top_lang
       |FROM cards c JOIN top USING (source) ORDER BY source""".stripMargin

  /** Release gate for [[p15KAnonRelease]]: a cell is publishable only
    * when at least this many documents back it. */
  val KAnonThreshold = 10L

  /** p15: k-anonymity release gate over corpus statistics — the
    * disclosure-control step before publishing per-(lang, source)
    * datasheet numbers (p14's corpus card, externalized): a cell backed
    * by fewer than [[KAnonThreshold]] documents is never released on
    * its own, because small cells re-identify contributors. Suppressed
    * cells roll up into a per-language `<other>` bucket; a rollup that
    * STILL clears the threshold is released, one that doesn't is
    * suppressed outright (absolute suppression — on these fixtures
    * every language rollup clears 10, so the branch is dead at test
    * SFs but load-bearing for the semantics). Two partial-aggregate
    * shuffles of card-sized frames — the corpus is scanned once; at
    * 100 TB the gate costs what p14 costs, nothing more. */
  def p15KAnonRelease(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables(spark, dir, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
    val big = cells.filter(col("n_docs") >= KAnonThreshold)
    val roll = cells.filter(col("n_docs") < KAnonThreshold)
      .groupBy(col("lang"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("total_chars")).as("total_chars"))
      .filter(col("n_docs") >= KAnonThreshold)
      .select(col("lang"), lit("<other>").as("source"),
        col("n_docs"), col("total_chars"))
    big.select(col("lang"), col("source"), col("n_docs"), col("total_chars"))
      .unionByName(roll)
      .orderBy(col("lang"), col("source"))
  }

  val p15Sql: String =
    """WITH cells AS (
      |  SELECT lang, source, COUNT(*) AS n_docs,
      |    CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |  FROM documents GROUP BY lang, source
      |), big AS (
      |  SELECT lang, source, n_docs, total_chars FROM cells WHERE n_docs >= 10
      |), roll AS (
      |  SELECT lang, '<other>' AS source, CAST(SUM(n_docs) AS BIGINT) AS n_docs,
      |    CAST(SUM(total_chars) AS BIGINT) AS total_chars
      |  FROM cells WHERE n_docs < 10 GROUP BY lang
      |  HAVING SUM(n_docs) >= 10
      |)
      |SELECT * FROM big UNION ALL SELECT * FROM roll
      |ORDER BY lang, source""".stripMargin

  /** Per-mille inclusion cap for [[p16PpsSample]] — no document's
    * inclusion probability exceeds 50%, the standard guard that keeps
    * Horvitz–Thompson weights bounded. */
  val PpsCapPerMille = 500L

  /** The p16 selection core: narrow map + filter, ZERO exchanges
    * (asserted in ScaleDesignSpec) — presentation `orderBy` lives only
    * in [[p16PpsSample]]. */
  def ppsSampleCore(docs: DataFrame): DataFrame = {
    graft.functions.VectorExpressions.register(docs.sparkSession)
    docs
      .withColumn("bucket",
        pmod(expr("rolling_min_hash(text)"), lit(1000L)))
      .withColumn("keep_per_mille",
        least(lit(PpsCapPerMille), col("n_chars")))
      .filter(col("bucket") < col("keep_per_mille"))
      .select(col("doc_id"), col("lang"), col("n_chars"), col("bucket"),
        col("keep_per_mille"),
        expr("1000000000L DIV keep_per_mille").as("ht_weight_ppm"))
  }

  /** p16: probability-proportional-to-size (PPS) Poisson sampling —
    * the token-budget sampler: each document enters the sample with
    * probability ∝ its size (`min(cap, n_chars)`‰), so a fixed char
    * budget is spent preferentially on substantial documents instead
    * of uniformly (p04 is the per-stratum flavor; this is the
    * per-document-weight flavor, and the two compose). Membership is
    * the same content-hash bucket rule as p04/p05 — a pure function of
    * the document, reproducible across runs/engines/partitionings,
    * where `rand()` is none of those. `ht_weight_ppm` is the exact
    * integer Horvitz–Thompson expansion weight (1/p in parts-per-
    * million): `Σ_sample n_chars·w/1e6` estimates the corpus total —
    * the spec checks the estimator lands near the true total.
    *
    * Plan at 100 TB: scan-bound narrow map + filter, zero exchanges,
    * no state — identical posture to p04. All arithmetic is integer,
    * so the oracle replays membership and weights exactly. */
  def p16PpsSample(spark: SparkSession, dir: String): DataFrame =
    ppsSampleCore(Tables(spark, dir, "documents"))
      .orderBy(col("doc_id"))

  /** Oracle: the shared fingerprint CTE + the same integer cap /
    * bucket / weight arithmetic. */
  val p16Sql: String =
    TextStats.fpWithCte +
      s"""
         |SELECT d.doc_id, d.lang, d.n_chars,
         |  ((f.fingerprint % 1000) + 1000) % 1000 AS bucket,
         |  least($PpsCapPerMille, d.n_chars) AS keep_per_mille,
         |  1000000000 // least($PpsCapPerMille, d.n_chars) AS ht_weight_ppm
         |FROM documents d JOIN fp f ON d.doc_id = f.doc_id
         |WHERE ((f.fingerprint % 1000) + 1000) % 1000
         |  < least($PpsCapPerMille, d.n_chars)
         |ORDER BY d.doc_id""".stripMargin

  /** p17: dedup-adjusted EFFECTIVE corpus size per source — the number
    * corpus cards should report instead of raw bytes: per source, total
    * chars, the chars covered by cross-doc verbatim spans
    * ([[Dedup.d15DupSpans]] — per doc the spans are disjoint maximal
    * islands, so their lengths sum without double counting), and the
    * effective remainder a training run actually learns from. A source
    * with dup_ppm near 10⁶ is re-crawled boilerplate masquerading as
    * volume; mixture weights computed on raw sizes (p05/p09) overweight
    * it, which is exactly why this audit exists.
    *
    * Plan: d15's span frame (one shingle exchange + doc-keyed windows)
    * → per-doc span sums → ONE broadcast-sized left join back to the
    * doc table → a SOURCES-sized aggregate. Nothing new shuffles at
    * corpus scale beyond what d15 already pays. */
  def p17EffectiveCorpus(spark: SparkSession, dir: String): DataFrame = {
    val dupPerDoc = Dedup.d15DupSpans(spark, dir)
      .groupBy(col("doc_id"))
      .agg(sum(col("span_len")).as("dup_chars"))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .join(dupPerDoc, Seq("doc_id"), "left")
      .withColumn("dup_chars", coalesce(col("dup_chars"), lit(0L)))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("dup_chars")).as("dup_chars"))
      .withColumn("effective_chars", col("total_chars") - col("dup_chars"))
      .withColumn("dup_ppm", expr("(1000000L * dup_chars) DIV total_chars"))
      .orderBy(col("source"))
  }

  /** Oracle: d15's shared span CTE, per-doc sums, the same join-back
    * and integer ppm. */
  val p17Sql: String = Dedup.dupSpanCte +
    """, spans AS (
      |  SELECT doc_id, max(pos) + 24 - min(pos) AS span_len
      |  FROM isl GROUP BY doc_id, island
      |), per_doc AS (
      |  SELECT doc_id, CAST(SUM(span_len) AS BIGINT) AS dup_chars
      |  FROM spans GROUP BY doc_id
      |)
      |SELECT d.source, COUNT(*) AS n_docs,
      |  CAST(SUM(d.n_chars) AS BIGINT) AS total_chars,
      |  CAST(SUM(coalesce(p.dup_chars, 0)) AS BIGINT) AS dup_chars,
      |  CAST(SUM(d.n_chars) - SUM(coalesce(p.dup_chars, 0)) AS BIGINT)
      |    AS effective_chars,
      |  (1000000 * CAST(SUM(coalesce(p.dup_chars, 0)) AS BIGINT))
      |    // CAST(SUM(d.n_chars) AS BIGINT) AS dup_ppm
      |FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
      |GROUP BY d.source ORDER BY d.source""".stripMargin

  /** How many non-target docs p18 selects. */
  val DsirSelectCount = 150

  private val DsirTargetSources = Seq("src0", "src1", "src2", "src3")

  /** p18: importance resampling toward a target distribution — the
    * DSIR move (Xie et al. 2023, "Data Selection for Language Models
    * via Importance Resampling"): score every raw document by how much
    * its hashed-n-gram profile looks like a curated target slice, then
    * keep the top-scoring raw docs. Here the features are distinct
    * word bigrams (the [[graft.functions.WordShingles]] kernel — DSIR's
    * hashed n-grams without the hash, which the small fixture
    * vocabulary doesn't need; at 100 TB the `feat` aggregate keys on
    * `xxhash64(f) % 2^20` instead and nothing else changes), each
    * feature's weight is its target-occurrence rate in 1e-6 units
    * (the integer form of DSIR's log-ratio ranking: one Bernoulli
    * factor per feature), and a doc's importance is its feature-mean
    * weight — all integer DIV arithmetic, bit-exact across engines.
    * Selection is top-[[DsirSelectCount]] by (importance DESC, doc_id):
    * computed NOT with a global single-partition rank window but by
    * materializing the k-th (importance, doc_id) pair via two tiny
    * TakeOrdered passes and broadcasting it back as a 1-row frame
    * (p08's threshold pattern) — every doc then decides `selected`
    * locally by lexicographic comparison. The oracle ranks with
    * ROW_NUMBER and checks `rk <= K`: an engine-native cross-check
    * that the threshold form IS top-k. */
  def p18DsirResample(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    val d = Tables(spark, dir, "documents")
      .filter(size(split(col("text"), " ")) >= 2)
    val tok = d.select(col("doc_id"),
      col("source").isin(DsirTargetSources: _*).as("tgt"),
      explode(expr("word_shingles2(text)")).as("f"))
    val feat = tok.groupBy(col("f"))
      .agg(expr("(1000000 * count(CASE WHEN tgt THEN 1 END)) DIV count(1)")
        .as("w_e6"))
    // feat scales with vocab², not corpus size — a shuffle join here,
    // AQE turns it into a broadcast when it fits (it does at every SF)
    val scores = tok.join(feat, "f")
      .groupBy(col("doc_id"))
      .agg(expr("sum(w_e6) DIV count(1)").as("avg_e6"),
        count(lit(1)).as("n_feat"))
    val cand = scores
      .join(d.select(col("doc_id"), col("source")), "doc_id")
      .filter(!col("source").isin(DsirTargetSources: _*))
    val kth = cand.select(col("avg_e6"), col("doc_id"))
      .orderBy(col("avg_e6").desc, col("doc_id"))
      .limit(DsirSelectCount)
      .orderBy(col("avg_e6").asc, col("doc_id").desc)
      .limit(1)
      .select(col("avg_e6").as("kth_avg"), col("doc_id").as("kth_id"))
    cand.crossJoin(broadcast(kth))
      .select(col("doc_id"), col("avg_e6"), col("n_feat"),
        (col("avg_e6") > col("kth_avg") ||
          (col("avg_e6") === col("kth_avg") &&
            col("doc_id") <= col("kth_id"))).as("selected"))
      .orderBy(col("doc_id"))
  }

  val p18Sql: String = {
    val list = DsirTargetSources.map(s => s"'$s'").mkString(", ")
    s"""WITH tok AS (
       |  SELECT doc_id, source,
       |    unnest(list_distinct(list_transform(
       |      range(1, len(string_split(text, ' '))),
       |      i -> string_split(text, ' ')[i] || '_'
       |        || string_split(text, ' ')[i + 1]))) AS f
       |  FROM documents
       |  WHERE len(string_split(text, ' ')) >= 2
       |), feat AS (
       |  SELECT f,
       |    (1000000 * COUNT(CASE WHEN source IN ($list) THEN 1 END))
       |      // COUNT(*) AS w_e6
       |  FROM tok GROUP BY f
       |), scores AS (
       |  SELECT t.doc_id,
       |    CAST(SUM(ft.w_e6) AS BIGINT) // COUNT(*) AS avg_e6,
       |    COUNT(*) AS n_feat
       |  FROM tok t JOIN feat ft ON ft.f = t.f
       |  GROUP BY t.doc_id
       |), ranked AS (
       |  SELECT s.doc_id, s.avg_e6, s.n_feat,
       |    ROW_NUMBER() OVER (ORDER BY s.avg_e6 DESC, s.doc_id) AS rk
       |  FROM scores s JOIN documents d ON d.doc_id = s.doc_id
       |  WHERE d.source NOT IN ($list)
       |)
       |SELECT doc_id, avg_e6, n_feat, rk <= $DsirSelectCount AS selected
       |FROM ranked ORDER BY doc_id""".stripMargin
  }

  /** p19: domain-mixture reweighting by multiplicative weights — the
    * DoReMi shape (Xie et al. 2023, "DoReMi: Optimizing Data Mixtures
    * Speeds Up Language Model Pretraining"): start from uniform domain
    * weights and iteratively upweight domains with EXCESS loss relative
    * to the current weighted mean, renormalizing each round. The
    * per-domain loss here is the mean unigram surprisal proxy (t09's
    * integer rarity kernel, aggregated per source — in DoReMi proper
    * it is the proxy-vs-reference loss gap; the optimizer structure is
    * identical and the corpus-side work is the same one token-grain
    * aggregate). Three fixed multiplicative-weights rounds, everything
    * in integer 1e-6 units:
    *
    *   avg_t      = Σ w_t·loss DIV Σ w_t
    *   rel        = (1e6·loss) DIV avg_t                (ppm of the mean)
    *   factor     = (rel + 1e6) DIV 2                   (η = ½ toward rel)
    *   w_raw      = w_t · factor DIV 1e6
    *   w_{t+1}    = (1e6·w_raw) DIV Σ w_raw             (ppm shares)
    *
    * `factor` halves the RELATIVE loss plus one — algebraically
    * 1e6 + (rel − 1e6)/2, i.e. half the excess — but spelled so every
    * DIV operand is NONNEGATIVE: Spark's `div` truncates toward zero
    * while DuckDB's `//` floors, so a negative excess divided directly
    * would silently diverge between the engines by 1 ulp. Factors are
    * provably ≥ 5·10⁵, every product stays under ~10¹⁵, and both
    * engines compute the identical DIV chain — bit-exact. Plan shape: ONE corpus-scale
    * aggregate (token explode → per-source rarity sums), then the MW
    * rounds run on K-row frames (K = #domains) with 1-row broadcast
    * avg/normalizer frames — the optimizer costs nothing at any corpus
    * size, which is exactly DoReMi's selling point vs grid search. */
  def p19DoremiWeights(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    val toks = d.select(col("source"), explode(split(col("text"), " "))
      .as("token"))
    val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("c_t"))
    val total = vocab.agg(sum(col("c_t")).as("n_total"))
    val dom = toks.join(vocab, "token")
      .crossJoin(broadcast(total))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("t_s"),
        sum(expr("n_total DIV c_t")).as("r_s"))
    // the K-row loss table is referenced ~3× per MW round (join, avg,
    // final) — materialize it ONCE or every reference re-runs the
    // corpus-scale token aggregate behind it (first cut: 8.2 s in the
    // sf0.1 bench; checkpointed: the one aggregate). Harness releases
    // the blocks post-query (lazy-return op, Bench.releaseStorage).
    val loss = dom.select(col("source"),
      expr("(1000000 * r_s) DIV t_s").as("loss_e6"))
      .localCheckpoint()
    // MW rounds on K-row frames; each returns normalized ppm shares
    def round(w: DataFrame): DataFrame = {
      val joined = w.join(loss, "source")
      val avg = joined.agg(
        expr("sum(w * loss_e6) DIV sum(w)").as("avg_e6"))
      val raw = joined.crossJoin(broadcast(avg))
        .select(col("source"),
          expr("(w * (((1000000 * loss_e6) DIV avg_e6 + 1000000)" +
            " DIV 2)) DIV 1000000").as("w_raw"))
      val norm = raw.agg(sum(col("w_raw")).as("z"))
      raw.crossJoin(broadcast(norm))
        .select(col("source"), expr("(1000000 * w_raw) DIV z").as("w"))
    }
    val w0 = loss.select(col("source"), lit(1000000L).as("w"))
    val w1 = round(w0)
    val w2 = round(w1)
    val w3 = round(w2)
    loss
      .join(w1.withColumnRenamed("w", "w1_e6"), "source")
      .join(w2.withColumnRenamed("w", "w2_e6"), "source")
      .join(w3.withColumnRenamed("w", "w3_e6"), "source")
      .orderBy(col("source"))
  }

  val p19Sql: String = {
    // one MW round as SQL text: reads w<i-1>(source, w), yields w<i>
    def roundSql(i: Int): String = {
      val prev = s"w${i - 1}"
      s"""a$i AS (
         |  SELECT CAST(SUM(w * loss_e6) AS BIGINT)
         |    // CAST(SUM(w) AS BIGINT) AS avg_e6
         |  FROM $prev JOIN loss USING (source)
         |), u$i AS (
         |  SELECT source,
         |    (w * (((1000000 * loss_e6) // avg_e6 + 1000000)
         |      // 2)) // 1000000 AS w_raw
         |  FROM $prev JOIN loss USING (source) CROSS JOIN a$i
         |), z$i AS (SELECT CAST(SUM(w_raw) AS BIGINT) AS z FROM u$i),
         |w$i AS (
         |  SELECT source, (1000000 * w_raw) // z AS w
         |  FROM u$i CROSS JOIN z$i
         |)""".stripMargin
    }
    s"""WITH toks AS (
       |  SELECT source, unnest(string_split(text, ' ')) AS token
       |  FROM documents
       |), vocab AS (
       |  SELECT token, COUNT(*) AS c_t FROM toks GROUP BY token
       |), tot AS (SELECT CAST(SUM(c_t) AS BIGINT) AS n_total FROM vocab),
       |dom AS (
       |  SELECT source, COUNT(*) AS t_s,
       |    CAST(SUM(n_total // c_t) AS BIGINT) AS r_s
       |  FROM toks JOIN vocab USING (token) CROSS JOIN tot
       |  GROUP BY source
       |), loss AS (
       |  SELECT source, (1000000 * r_s) // t_s AS loss_e6 FROM dom
       |), w0 AS (SELECT source, CAST(1000000 AS BIGINT) AS w FROM loss),
       |${roundSql(1)},
       |${roundSql(2)},
       |${roundSql(3)}
       |SELECT l.source, l.loss_e6, w1.w AS w1_e6, w2.w AS w2_e6,
       |  w3.w AS w3_e6
       |FROM loss l
       |JOIN w1 ON w1.source = l.source
       |JOIN w2 ON w2.source = l.source
       |JOIN w3 ON w3.source = l.source
       |ORDER BY l.source""".stripMargin
  }

  /** p20: sharded JSONL export + verified round-trip — JSON Lines is
    * the lingua-franca interchange format for training corpora (every
    * tokenizer/trainer ingests it), so the engine must prove its own
    * write→read cycle is lossless. The query serializes each document
    * to one JSON line (`to_json` over the full struct), writes a
    * shard-partitioned TEXT sink (shard = content fingerprint mod 8,
    * p03's sharding — partition directories are how a 100 TB corpus
    * ships: each shard is an independently consumable file set), then
    * re-reads the directory (partition discovery recovers the shard
    * column) and parses each line back with `from_json` under the
    * explicit document schema. The per-shard stats are computed FROM
    * THE RE-READ ROWS, while the oracle computes them from the original
    * table — the hash match therefore proves the full round trip:
    * JSON string escaping, schema re-application, partition encoding,
    * and that no line was lost or duplicated. Writer side uses one
    * file per (task, shard); at scale the shard count and
    * `maxRecordsPerFile` bound file sizes the same way p12's packing
    * does. */
  /** Scratch dir for a write-then-lazily-read-back query: FIXED per
    * (query, corpus) — not a fresh temp dir per invocation — so repeat
    * suite runs (bench = warm-up + 3 timed) overwrite one bounded
    * footprint; keyed by corpus dir so a concurrent run over a
    * different SF dir can't clobber output this run still re-reads,
    * and rooted in the user-scoped artifact root so a shared /tmp on a
    * multi-user box neither collides nor serves another user's
    * writable files. */
  private def scratchDir(tag: String, dir: String): String = {
    // backend-aware join: a scheme-qualified artifact root must not go
    // through Paths.get (it would mangle to a relative local dir)
    val (fs, root) = graft.io.ArtifactStore.backend(
      graft.io.ArtifactStore.artifactRoot())
    fs.join(fs.join(fs.join(root, "scratch"), tag),
      dir.replaceAll("[^A-Za-z0-9._-]", "_"))
  }

  def p20JsonlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    graft.functions.VectorExpressions.register(spark)
    val d = Tables(spark, dir, "documents")
    // the read-back is lazy so delete-after-use can't be sequenced
    // here; see scratchDir for the path policy
    val out = scratchDir("p20-jsonl", dir)
    d.withColumn("shard", pmod(expr("rolling_min_hash(text)"), lit(8L)))
      .select(col("shard"),
        to_json(struct(col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars"))).as("value"))
      .write.partitionBy("shard").mode("overwrite").text(out)
    val docSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("source",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_chars",
        org.apache.spark.sql.types.LongType)))
    val raw = spark.read.text(out)
    // an empty corpus writes no shard=N directories, so partition
    // discovery yields no shard column — surface it as an empty LONG
    // rather than failing analysis (EmptyInputSpec contract)
    val rawSharded =
      if (raw.columns.contains("shard")) raw
      else raw.withColumn("shard", lit(null).cast(LongType))
    rawSharded
      .select(col("shard").cast(LongType).as("shard"),
        from_json(col("value"), docSchema).as("r"))
      .select(col("shard"), col("r.*"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("doc_id")).as("sum_doc_id"),
        count_distinct(col("lang")).as("n_langs"),
        // the parsed text must still be the text: re-derive n_chars
        // from it and any JSON-escaping loss breaks the sum
        sum(length(col("text")).cast(LongType)).as("parsed_chars"))
      .orderBy(col("shard"))
  }

  val p20Sql: String = TextStats.fpWithCte +
    """
      |SELECT ((f.fingerprint % 8) + 8) % 8 AS shard,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(d.n_chars) AS BIGINT) AS total_chars,
      |  CAST(SUM(d.doc_id) AS BIGINT) AS sum_doc_id,
      |  CAST(COUNT(DISTINCT d.lang) AS BIGINT) AS n_langs,
      |  CAST(SUM(length(d.text)) AS BIGINT) AS parsed_chars
      |FROM fp f JOIN documents d USING (doc_id)
      |GROUP BY 1 ORDER BY shard""".stripMargin

  /** p21: schema-evolution-tolerant corpus read — a corpus accumulated
    * over months is never schema-homogeneous: early shards predate
    * columns later crawls added. The query materializes exactly that
    * (an epoch-1 shard WITHOUT `source`/`n_chars`, an epoch-2 shard
    * with them, under one partitioned directory), then reads the whole
    * directory back with `mergeSchema`: Spark unions the parquet
    * footers' schemas, absent columns surface as NULL, and the
    * pipeline backfills (`coalesce(n_chars, length(text))`) instead of
    * failing or silently dropping shards. Per-epoch accounting —
    * including the null count that PROVES the missing column came back
    * as nulls rather than vanishing rows — is computed from the
    * re-read frame; the oracle recomputes it from the original table,
    * so the hash match pins the whole evolution contract. At 100 TB
    * this is the default read posture for any multi-epoch corpus
    * (schema merging costs one footer pass; the alternative — a
    * migration rewrite of every old shard — costs a full corpus
    * write). */
  def p21SchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val d = Tables(spark, dir, "documents")
    // fixed path + overwrite, same bounded-footprint policy as p20
    val out = scratchDir("p21-evo", dir)
    d.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("text"), col("lang"))
      .write.mode("overwrite").parquet(s"$out/batch=e1")
    d.filter(col("doc_id") % 2 =!= 0)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))
      .write.mode("overwrite").parquet(s"$out/batch=e2")
    spark.read.option("mergeSchema", "true").parquet(out)
      .groupBy(col("batch").cast("string").as("batch"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("source").isNull, 1L).otherwise(0L))
          .as("null_source"),
        sum(coalesce(col("n_chars"), length(col("text")).cast(LongType)))
          .as("chars_filled"),
        count_distinct(col("lang")).as("n_langs"))
      .orderBy(col("batch"))
  }

  val p21Sql: String =
    """SELECT CASE WHEN doc_id % 2 = 0 THEN 'e1' ELSE 'e2' END AS batch,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS null_source,
      |  CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN length(text)
      |    ELSE n_chars END) AS BIGINT) AS chars_filled,
      |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
      |FROM documents GROUP BY 1 ORDER BY batch""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p21_schema_evolution" -> (p21SchemaEvolution _),
    "p20_jsonl_roundtrip" -> (p20JsonlRoundtrip _),
    "p19_doremi_weights" -> (p19DoremiWeights _),
    "p18_dsir_resample" -> (p18DsirResample _),
    "p17_effective_corpus" -> (p17EffectiveCorpus _),
    "p16_pps_sample" -> (p16PpsSample _),
    "p15_kanon_release" -> (p15KAnonRelease _),
    "p14_corpus_card" -> (p14CorpusCard _),
    "p13_incremental_update" -> (p13IncrementalUpdate _),
    "p12_shard_packing" -> (p12ShardPacking _),
    "p22_bpe_packing" -> (p22BpePacking _),
    "p11_snapshot_diff" -> (p11SnapshotDiff _),
    "p01_dedup_pipeline" -> (p01DedupPipeline _),
    "p07_corpus_prep" -> (p07CorpusPrep _),
    "p08_quality_calibration" -> (p08QualityCalibration _),
    "p09_epoch_mixing" -> (p09EpochMixing _),
    "p10_curriculum" -> (p10Curriculum _),
    "p02_shard_stats" -> (p02ShardStats _),
    "p03_token_budget" -> (p03TokenBudget _),
    "p04_stratified_sample" -> (p04StratifiedSample _),
    "p05_mixture_rebalance" -> (p05MixtureRebalance _),
    "p06_leakage_safe_split" -> (p06LeakageSafeSplit _),
  )
  val oracle: Map[String, String] = Map(
    "p21_schema_evolution" -> p21Sql,
    "p20_jsonl_roundtrip" -> p20Sql,
    "p19_doremi_weights" -> p19Sql,
    "p18_dsir_resample" -> p18Sql,
    "p17_effective_corpus" -> p17Sql,
    "p16_pps_sample" -> p16Sql,
    "p15_kanon_release" -> p15Sql,
    "p14_corpus_card" -> p14Sql,
    "p13_incremental_update" -> p13Sql,
    "p12_shard_packing" -> p12Sql,
    "p22_bpe_packing" -> p22Sql,
    "p11_snapshot_diff" -> p11Sql,
    "p01_dedup_pipeline" -> p01Sql,
    "p07_corpus_prep" -> p07Sql,
    "p08_quality_calibration" -> p08Sql,
    "p09_epoch_mixing" -> p09Sql,
    "p10_curriculum" -> p10Sql,
    "p02_shard_stats" -> p02Sql,
    "p03_token_budget" -> p03Sql,
    "p04_stratified_sample" -> p04Sql,
    "p05_mixture_rebalance" -> p05Sql,
    "p06_leakage_safe_split" -> p06Sql,
  )
}
