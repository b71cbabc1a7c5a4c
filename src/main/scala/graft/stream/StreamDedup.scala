package graft.stream

import org.apache.spark.sql.{Dataset, Encoders, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate candidate detection — the streaming sibling
  * of the batch MinHash-LSH dedup (d03): the SAME shingle kernel,
  * 64-hash signature and 16×4 banding (shared via
  * [[graft.llm.Dedup.bandedDocs]]), but with per-(band, bucket)
  * streaming state instead of a self-join. Each arriving document emits
  * one candidate pair per member already in its bucket — the
  * incremental form of the batch clique join — so over any prefix of
  * the stream the emitted pair set equals the batch operator's
  * candidates on the same documents (for buckets within the cap; see
  * below). Exact-Jaccard verification and cross-band distinct stay
  * downstream, exactly as they do for the batch [[graft.llm.Dedup
  * .lshCandidates]] — candidates are the stateful part; verification is
  * a stateless join any consumer can add.
  *
  * Hot buckets (boilerplate mega-clusters, the normal case in web-scale
  * streams): once a bucket holds `hotBucketCap` members it stops
  * storing arrivals and pairs each one with the bucket representative
  * (min doc_id among the STORED members) — O(cap) state per bucket
  * FOREVER, O(1) work per arrival. Contract differences vs the batch
  * operator, both only past the cap: (a) the emitted edges are the
  * first cap members' clique plus a star around the stored-min
  * representative, where batch emits a star around the bucket's GLOBAL
  * min — the same candidate-graph connectivity (every member reaches
  * the representative), but not the same pair enumeration, and, as
  * with the batch star itself, downstream CC clusters coincide only
  * when hot-bucket members are genuine near-dups of the representative
  * (exact verification can drop different star edges on the two
  * sides); (b) arrivals past the cap are not remembered, so a REPLAYED
  * past-cap document re-emits its star pair — consumers must treat
  * candidates as at-least-once and dedup pairs (the batch operator's
  * `.distinct()` step), which every verify-then-CC consumer here
  * already does. (An incremental operator cannot retract emitted
  * clique pairs when a bucket later crosses the cap.)
  *
  * Scale posture: state is partitioned by (band, bucket) across
  * executors like any keyed state; with the RocksDB provider it spills
  * off-heap and snapshots incrementally. NoTimeout is deliberate — a
  * dedup index must remember forever by definition; bound the window
  * with a TTL/timeout variant if the product semantics allow forgetting.
  */
object StreamDedup {

  private implicit val keyEnc: org.apache.spark.sql.Encoder[(Int, Long)] =
    Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)
  private implicit val rowEnc
      : org.apache.spark.sql.Encoder[(Long, Int, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt, Encoders.scalaLong)
  private implicit val pairEnc: org.apache.spark.sql.Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)

  /** Per-bucket state: the members stored so far (≤ hotBucketCap). */
  case class Bucket(members: Seq[Long])
  private implicit val stateEnc: org.apache.spark.sql.Encoder[Bucket] =
    Encoders.product[Bucket]

  /** Candidate near-dup pairs (doc_a < doc_b, undistincted across
    * bands) from a stream of (doc_id, band, bucket) rows grouped by
    * (band, bucket) — build the input with [[graft.llm.Dedup
    * .bandedDocs]] + `groupByKey(r => (band, bucket))`. */
  def lshCandidatePairs(
      grouped: KeyValueGroupedDataset[(Int, Long), (Long, Int, Long)],
      hotBucketCap: Int = 64): Dataset[(Long, Long)] =
    grouped.flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (_: (Int, Long), rows: Iterator[(Long, Int, Long)],
          state: GroupState[Bucket]) =>
        var members = state.getOption.fold(Seq.empty[Long])(_.members)
        val out = Seq.newBuilder[(Long, Long)]
        rows.foreach { case (doc, _, _) =>
          // replays are no-ops only while the doc is stored; past-cap
          // docs are not remembered (bounded state), so their replays
          // re-emit — downstream pair-dedup absorbs it (scaladoc (b))
          if (!members.contains(doc)) {
            if (members.size >= hotBucketCap) {
              val rep = members.min
              out += ((math.min(rep, doc), math.max(rep, doc)))
            } else {
              members.foreach(m =>
                out += ((math.min(m, doc), math.max(m, doc))))
              members = members :+ doc
            }
          }
        }
        state.update(Bucket(members))
        out.result().iterator
    }
}
