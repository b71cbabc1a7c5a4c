package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming corpus ingestion — the continuous form of the batch
  * incremental update (p13, `llm.Pipeline.p13IncrementalUpdate`)'s
  * quality + exact-dup arms: documents ARRIVE instead of sitting in a
  * batch, and each arrival is dispositioned the moment it lands. The
  * near-dup arm stays with [[StreamDedup]] (LSH candidate state), whose
  * output a consumer joins downstream exactly as p13 composes
  * `Dedup.minHashPairs`; this operator owns the cheap gates that should
  * run FIRST so near-dup state is never fed rejected or exact-dup text.
  *
  * Stage order (p13's, preserved):
  *  1. quality gate — stateless codegen'd expressions, no state;
  *  2. exact-dup vs the STANDING corpus — a stream-static broadcast
  *     join against the standing digest index (16-byte digests, never
  *     text; the d10/d14 posture);
  *  3. exact-dup WITHIN the stream — per-digest state: the first
  *     quality-passing, non-index arrival takes the digest
  *     ("accepted"), every later arrival is "dup_exact_batch". One
  *     Boolean per seen digest, forever — a dedup index remembers by
  *     definition (same NoTimeout rationale as [[StreamDedup]]).
  *
  * Cross-batch contract: the digest state survives micro-batches, so a
  * replayed or re-crawled document arriving hours later still drops.
  * Arrival-order caveat (shared with every append-mode twin): the batch
  * operator keeps min(doc_id) per digest, the stream keeps the FIRST
  * ARRIVAL (ties within a micro-batch resolve by doc_id) — identical on
  * an in-order source, which StreamingSpec asserts along with the
  * cross-batch drop. */
object Ingest {

  /** One disposition per arriving document. */
  case class IngestOut(docId: Long, disposition: String)

  private implicit val outEnc: org.apache.spark.sql.Encoder[IngestOut] =
    Encoders.product[IngestOut]
  private implicit val rowEnc
      : org.apache.spark.sql.Encoder[(Long, String, Double, Int)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.STRING,
      Encoders.scalaDouble, Encoders.scalaInt)
  private implicit val keyEnc: org.apache.spark.sql.Encoder[String] =
    Encoders.STRING
  private implicit val stateEnc: org.apache.spark.sql.Encoder[Boolean] =
    Encoders.scalaBoolean

  /** @param newDocs streaming frame with (doc_id, text, n_chars)
    * @param standingDigests static frame with column `h` — the standing
    *        corpus's md5 text digests (broadcast; at real scale a
    *        Bloom/bucket prefilter narrows it first, d14's posture)
    * @return one [[IngestOut]] per arrival, append mode */
  def streamingIngest(newDocs: DataFrame, standingDigests: DataFrame,
      qualityThreshold: Double = graft.llm.Pipeline.QualityThreshold)
      : Dataset[IngestOut] = {
    val gated = graft.llm.TextStats.qualityScored(newDocs)
      .withColumn("h", md5(col("text")))
      .join(broadcast(standingDigests.select(col("h"))
        .withColumn("ix", lit(1))), Seq("h"), "left")
      .select(col("doc_id"), col("h"), col("quality"),
        coalesce(col("ix"), lit(0)).as("ix"))
      .as[(Long, String, Double, Int)]
    gated.groupByKey(_._2)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[(Long, String, Double, Int)],
            state: GroupState[Boolean]) =>
          var taken = state.getOption.getOrElse(false)
          val out = rows.toSeq.sortBy(_._1).map { case (id, _, q, ix) =>
            val disp =
              if (q < qualityThreshold) "rejected_quality"
              else if (ix == 1) "dup_exact_index"
              else if (taken) "dup_exact_batch"
              else { taken = true; "accepted" }
            IngestOut(id, disp)
          }
          state.update(taken)
          out.iterator
      }
  }
}
