package graft

import org.scalatest.funsuite.AnyFunSuite

/** Robustness: the artifact-backed operator families against SMALL BUT
  * NON-EMPTY degenerate corpora. EmptyInputSpec covers zero rows; the
  * dangerous class (NOTES pitfalls, VERDICT r11 #7) is the corpus
  * that EXISTS but breaks a training assumption: fewer vectors than
  * centroids/codewords, identical vectors (single-cell IVF, all ties),
  * zero-padded dimensions (duplicate codeword seeds — the class that
  * used to crash the whole ADC family with INVALID_ARRAY_INDEX).
  * Every query must complete; where an answer exists it must be sane,
  * but the assertion here is deliberately "no crash, valid rows" —
  * correctness-by-oracle belongs to the fixtures. */
class TinyCorpusSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** The artifact-backed surface (VERDICT r11 #7's list). */
  private val artifactQueries = Seq(
    "s02_ivf_topk", "s10_bm25_topk",
    "s14_hard_negatives", "s15_index_probe", "s16_incremental_index",
    "s17_incremental_bm25", "s18_point_lookup", "s19_pq_rerank",
    "s20_ivfpq_search", "s21_pq_index_search", "s22_incremental_pq",
    "s23_recall_audit", "s24_recall_retrain", "s25_nprobe_sweep",
    "s26_filtered_ivfpq", "s27_label_partitioned", "s28_residual_pq",
    "s29_sq8_search", "s30_bq_search", "s31_range_search",
    "s32_tombstone_search", "s33_bm25_delete",
    "d11_semdedup", "d18_persisted_dedup_index",
    "d19_incremental_index_append", "d20_index_takedown",
    "g04_warm_pagerank", "g05_rolling_pagerank")

  /** Stage a corpus dir with all four tables: the given embeddings,
    * plus small-but-normal documents and click events (the degenerate
    * axis under test is the vector corpus; docs/events just need to
    * exist and parse). */
  private def stage(name: String,
      embeddings: Seq[(Long, Seq[Float], Int)]): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_tiny_$name")
      .toString
    embeddings.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    (0L until 6L).map { i =>
      val text = (0 to 8).map(j => words((i.toInt + j) % words.length))
        .mkString(" ")
      (i, text, "en", s"src${i % 2}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    (0L until 24L).map { i =>
      (i, java.sql.Timestamp.valueOf(s"2024-01-01 0${i % 10}:00:00"),
        i % 4, if (i % 2 == 0) "click" else "purchase", 1.0,
        s"""{"k": ${i % 5}}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // region/nation/etc. are not read by this surface; absent is fine
    dir
  }

  private def sweep(dir: String, corpus: String): Unit = {
    val failures = artifactQueries.flatMap { name =>
      try {
        SparkEntry.queries(name)(spark, dir).collect()
        None
      } catch {
        case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName} " +
            String.valueOf(e.getMessage).linesIterator
              .take(1).mkString.take(160))
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries crash on the $corpus corpus:\n" +
        failures.mkString("\n"))
  }

  test("tiny corpus: 5 vectors < 16 centroids/codewords") {
    val rnd = new scala.util.Random(21)
    val vecs = (0L until 5L).map(i =>
      (i, Seq.fill(64)(rnd.nextFloat() - 0.5f), (i % 3).toInt))
    sweep(stage("tiny", vecs), "5-vector")
  }

  test("identical-vector corpus: single IVF cell, all ties") {
    val one = Seq.tabulate(64)(j => if (j % 2 == 0) 0.5f else -0.25f)
    val vecs = (0L until 20L).map(i => (i, one, (i % 4).toInt))
    sweep(stage("identical", vecs), "identical-vector")
  }

  test("zero-padded corpus: duplicate codeword seeds per subspace") {
    val rnd = new scala.util.Random(22)
    val vecs = (0L until 20L).map(i =>
      (i, Seq.fill(56)(rnd.nextFloat() - 0.5f) ++ Seq.fill(8)(0.0f),
        (i % 4).toInt))
    sweep(stage("padded", vecs), "zero-padded")
  }
}
