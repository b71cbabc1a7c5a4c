package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.io.ArtifactStore
import graft.llm.{Dedup, Retrieval, Similarity}

/** Streaming maintenance of a persisted IVF index: the
  * `readStream → foreachBatch` twin of the nightly append
  * ([[graft.llm.Similarity.s16IncrementalIndexUpdate]]). A vector feed
  * (a crawler's embedding stage, a CDC tail of the embeddings table)
  * drives [[ivfAppendSink]], which folds each micro-batch into the
  * artifact by assignment to the STORED centroids — no Lloyd round
  * ever runs on the stream, the base corpus is never re-read, and the
  * artifact stays continuously probe-able (marker-validated readers
  * either see the pre-batch or the post-batch index, never a partial
  * append — [[graft.io.ArtifactStore.mutate]]'s contract).
  *
  * Exactly-once across micro-batch REPLAYS (a restarted streaming
  * query re-delivers its last uncommitted batch): the artifact itself
  * carries a batch-id high-water mark (`stream_state`, covered by the
  * manifest), written inside the same `mutate` that appends the rows —
  * a replayed batch id ≤ the mark is skipped wholesale, so a crash
  * between the append and the sink's checkpoint commit cannot
  * double-ingest. The fingerprint chains by xor-composition
  * (`fp ∘ batch = (n + nb, x ^ xb)` — [[graft.llm.Similarity
  * .frameFingerprintParts]]), so validation stays content-derived at
  * every step without rescanning what's already indexed.
  *
  * Caller contract: batches carry NEW vec_ids (the d10/d14-style
  * incremental dedup gate runs upstream of the embedding stage;
  * re-ingesting an id would store both copies, exactly as Faiss `add`
  * would). Concurrent mutation by another writer surfaces as a thrown
  * error → the streaming query fails and replays the batch, which is
  * the safe outcome.
  */
object IndexIngest {

  private def withNorm(df: DataFrame): DataFrame = {
    graft.functions.VectorExpressions.register(df.sparkSession)
    df.withColumn("norm", sqrt(expr("vec_dot(embedding, embedding)")))
      .filter(col("norm") > 0)
  }

  private def fpStr(n: Long, x: Long): String =
    ArtifactStore.fingerprint(n, x)

  /** Every touch of artifact-internal files (replay marks, generation
    * pointers, fragmentation probes) goes through the store's backend
    * dispatch: it decodes `file:` URIs the way the store itself does
    * (a base probed with raw `Paths.get(base, "stream_state")` mangled
    * into a relative local dir — review-caught) and follows registered
    * Hadoop schemes onto the right filesystem, so the whole streaming
    * lifecycle deploys wherever the store does. */
  private def fsb(base: String): (graft.io.ArtifactFs, String) =
    ArtifactStore.backend(base)

  /** Atomic replace for the replay mark: a truncate-then-write crash
    * leaves a torn/empty file whose parse then poisons every sink
    * batch and gate cycle (and the self-heals would copy the torn file
    * forward) — the backend's replace-swap (write-temp + atomic
    * rename; FileContext OVERWRITE on HDFS), the marker's own
    * pattern. */
  private def writeStateAtomic(base: String,
      state: Map[String, Long]): Unit = {
    val (fs, b) = fsb(base)
    val body = state.toSeq.sorted
      .map { case (app, id) => s"$app\t$id" }.mkString("\n")
    fs.writeAtomicReplace(fs.join(b, "stream_state"), body)
  }

  /** What a bootstrap call actually did — bootstraps INITIALIZE only
    * (any valid artifact is kept: re-running bootstrap after streamed
    * appends previously triggered ensure's full rebuild, which SWEPT
    * the appended rows and the replay mark, review-caught), so the
    * skip path needs to be OBSERVABLE: a no-op against an index grown
    * by appends and a no-op against a CHANGED corpus (operator error —
    * the offered vectors are not what the artifact indexes) look
    * identical otherwise (ADVICE r11). Replacing a living index is an
    * explicit delete + bootstrap. */
  sealed trait BootstrapStatus
  object BootstrapStatus {
    /** No valid artifact existed; built from the offered corpus. */
    case object Built extends BootstrapStatus
    /** Valid artifact already carries exactly the offered corpus'
      * fingerprint — the repeat-run no-op. */
    case object Current extends BootstrapStatus
    /** Valid artifact KEPT although its fingerprint differs from the
      * offered corpus (streamed appends — or a changed corpus).
      * Logged to stderr at the call. */
    case object KeptDivergent extends BootstrapStatus

    /** Severity join for multi-artifact bootstraps
      * ([[IndexIngest.bootstrapPair]]): KeptDivergent dominates — an
      * operator must see a changed-corpus divergence no matter WHICH
      * member artifact carries it (a pair crash-recovered mid-
      * lifecycle can legally hold one Current and one divergent
      * member) — then Built, then Current. */
    def worst(a: BootstrapStatus, b: BootstrapStatus): BootstrapStatus = {
      def sev(s: BootstrapStatus): Int = s match {
        case KeptDivergent => 2
        case Built => 1
        case Current => 0
      }
      if (sev(a) >= sev(b)) a else b
    }
  }

  /** The initialize-only state machine every bootstrap shares.
    * `parts` fingerprints the OFFERED corpus (evaluated on both
    * branches: the build needs it to mark, the skip needs it to tell
    * Current from KeptDivergent — one cheap aggregate scan, and
    * bootstraps run once per deployment, not per batch). */
  private def bootstrapOnce(base: String, parts: => (Long, Long))(
      build: String => Unit): BootstrapStatus = {
    // a marker-less base may be a crashed PUBLISH (compaction,
    // retrain) of a LIVING index whose appended rows exist nowhere
    // else: roll it back to the valid old generation FIRST — marker
    // included, so the initialize-only check below sees it. Blindly
    // falling through to ensure would reap the aside copy as a
    // staging orphan and silently rebuild from the initial corpus,
    // losing every streamed append and the replay marks
    // (review-caught r12).
    if (ArtifactStore.currentFingerprint(base).isEmpty)
      ArtifactStore.restoreAside(base)
    val (n, x) = parts
    val offered = fpStr(n, x)
    ArtifactStore.currentFingerprint(base) match {
      case None =>
        ArtifactStore.ensure(base, offered)(build)
        BootstrapStatus.Built
      case Some(cur) if cur == offered => BootstrapStatus.Current
      case Some(cur) =>
        System.err.println(s"[graft] bootstrap kept the existing index " +
          s"at $base: its fingerprint $cur differs from the offered " +
          s"corpus' $offered (streamed appends — or a changed corpus). " +
          s"Replacing a living index is an explicit delete + bootstrap.")
        BootstrapStatus.KeptDivergent
    }
  }

  /** One-time index bootstrap over the initial corpus (train + write
    * through the atomic-publish path); a no-op when a valid artifact
    * exists — see [[BootstrapStatus]] for the skip taxonomy. */
  def bootstrap(base: String, vectors: DataFrame): BootstrapStatus = {
    val v = withNorm(vectors)
    bootstrapOnce(base, Similarity.frameFingerprintParts(v))(
      Similarity.ivfBuildFrom(v, _))
  }

  /** Compact the inverted lists after a run of appends: every cell's
    * accumulation of small per-batch files is rewritten into one
    * sorted file per cell partition, under the same publish lock and
    * with the SAME fingerprint — the maintenance job a streaming-
    * maintained index schedules periodically, exactly as Lucene merges
    * segments. Compaction is also where DELETES become physical
    * (Lucene's merge dropping deleted docs): tombstoned rows
    * ([[ivfDeleteSink]]) are omitted from the rewritten lists and the
    * tombstone set is reset to empty. The fingerprint is still REUSED —
    * the LOGICAL membership already moved at delete time (the sink
    * xor-composed the removals out), so "stored rows minus tombstones"
    * is what the current fingerprint has covered all along. Readers
    * either see the pre- or post-compaction file set (marker-swap),
    * and the probe plans are unchanged: cell-major, partition-
    * prunable. Returns false when there is no valid artifact to
    * compact. */
  def compactIvf(spark: org.apache.spark.sql.SparkSession,
      base: String): Boolean =
    ArtifactStore.rewrite(base) { (live, staging) =>
      val lists = graft.llm.IndexDelete.liveListsAt(spark, live)
      graft.io.Store.writePartitionedParquet(
        lists.select(col("vec_id"), col("embedding"), col("norm"),
          col("cell")),
        s"$staging/assignments", Seq("cell"), Seq("vec_id"))
      clearTombstonesInto(live, staging)
    }

  /** Stage an EMPTY tombstone set over a live one — the compaction/
    * retrain epilogue once tombstoned rows have been physically
    * dropped from the rewritten table (the publish swaps only staged
    * children, so an un-staged tombstone dir would survive with stale
    * ids — harmless against rows that no longer exist, but it would
    * break the "a compaction clears the tombstones" re-append
    * contract). No-op when the live artifact has no tombstones. */
  private def clearTombstonesInto(live: String, staging: String): Unit = {
    val (fs, b) = fsb(live)
    if (fs.isDir(fs.join(b, "tombstones")))
      fs.mkdirs(fs.join(staging, "tombstones"))
  }

  /** THE exactly-once commit core every streaming sink (append AND
    * delete) rides: skip a batch id at or below this lineage's
    * high-water mark, chain the batch's SIGNED fingerprint parts onto
    * the current fingerprint by xor-composition (appends pass +count,
    * removals −count — xor is its own inverse), and run `body` + the
    * mark write inside ONE [[graft.io.ArtifactStore.mutate]] so a
    * crash between them can never leave a marked-but-double-
    * ingestable state. `parts` is BY-NAME and evaluated only after
    * the expected fingerprint is captured: a removal plan reads
    * artifact state, and the reversed order would let a racing
    * writer's plan validate against the post-race fingerprint
    * (the applyRemoval race class). One body holds the exactly-once
    * reasoning for all ten sinks (review-caught duplication). */
  private def commitOnce(base: String, batchId: Long, markKey: String,
      parts: => (Long, Long))(body: String => Unit): Unit = {
    if (batchId <= readState(base).getOrElse(markKey, -1L))
      return // replay of a committed batch OF THIS LINEAGE
    val cur = ArtifactStore.currentFingerprint(base).getOrElse(
      throw new IllegalStateException(
        s"no valid index artifact at $base — bootstrap first"))
    val (pn, px) = parts
    val Array(cn, cx) = cur.split("_")
    val next = fpStr(cn.toLong + pn,
      java.lang.Long.parseUnsignedLong(cx) ^ px)
    val ok = ArtifactStore.mutate(base, cur, next) { live =>
      body(live)
      writeStateAtomic(base, readState(base) + (markKey -> batchId))
    }
    if (!ok) throw new IllegalStateException(
      s"index at $base changed under batch $batchId — replay")
  }

  private def requireAppId(appId: String): Unit =
    require(!appId.exists(c => c == '\t' || c == '\n' || c == '\r'),
      s"appId must not contain tab/newline: '$appId'")

  /** [[commitOnce]] keyed by the plain append lineage. */
  private def appendOnce(base: String, batchId: Long,
      parts: (Long, Long), appId: String = DefaultApp)(
      append: String => Unit): Unit = {
    requireAppId(appId)
    commitOnce(base, batchId, appId, parts)(append)
  }

  /** The lineage a sink belongs to when the caller does not name one.
    * Multiple streaming queries feeding ONE artifact must pass
    * distinct `appId`s (the stable id the caller owns — Delta's
    * `txnAppId` convention), or their independent batch numbering
    * aliases: query B's batch 0 would read as a replay of query A's
    * committed batch 0 and be silently dropped (VERDICT r11 #4). */
  val DefaultApp = "default"

  /** The artifact's replay marks: one high-water batch id PER QUERY
    * LINEAGE (`appId → batchId` — the Delta idempotent-sink key). A
    * recreated query with a FRESH checkpoint restarts batch numbering
    * at 0 and its new batches would read as replays of its OWN
    * committed ids — recovery from a lost checkpoint therefore pairs
    * the new query with a new appId (or an explicit mark reset).
    * File format: `<appId>\t<batchId>` lines; a bare legacy
    * single-number file reads as the default lineage's mark. */
  private def readState(base: String): Map[String, Long] = {
    val (fs, b) = fsb(base)
    val f = fs.join(b, "stream_state")
    if (!fs.isFile(f)) Map.empty
    else {
      val txt = fs.read(f).trim
      if (txt.isEmpty) Map.empty
      else txt.split("\n").toSeq.map { line =>
        val i = line.indexOf('\t')
        if (i < 0) DefaultApp -> line.trim.toLong
        else line.substring(0, i) -> line.substring(i + 1).trim.toLong
      }.toMap
    }
  }

  private def readMark(base: String, appId: String = DefaultApp): Long =
    readState(base).getOrElse(appId, -1L)

  /** The `foreachBatch` sink: fold one micro-batch of
    * `(vec_id, embedding)` into the index at `base`. Use as
    * `stream.writeStream.foreachBatch(IndexIngest.ivfAppendSink(base) _)`. */
  def ivfAppendSink(base: String, appId: String = DefaultApp)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val v = withNorm(batch)
    appendOnce(base, batchId,
        Similarity.frameFingerprintParts(v), appId) { live =>
      val centroids = spark.read.parquet(s"$live/centroids")
      Similarity.assignToCentroids(v, centroids)
        .repartition(col("cell"))
        .sortWithinPartitions(col("cell"), col("vec_id"))
        .write.mode("append").partitionBy("cell")
        .parquet(s"$live/assignments")
    }
  }

  /** The EIGHTH exactly-once sink — streaming DELETES: fold one
    * micro-batch of `(vec_id)` removal requests into the index at
    * `base` as a tombstone append ([[graft.llm.IndexDelete]] — the
    * Lucene deleted-docs / Delta deletion-vector posture: O(batch)
    * work, no data file touched; [[compactIvf]] makes the removals
    * physical later). Rides the same [[appendOnce]] machinery as every
    * other sink — per-lineage replay marks, fingerprint-checked mutate
    * — with the batch's fingerprint parts NEGATED: xor is its own
    * inverse, so the artifact's content fingerprint moves to the
    * post-delete membership exactly as appends move it forward, and a
    * gate retrain or self-heal recomputing the fingerprint from the
    * live rows reproduces it. Requests for absent or already-
    * tombstoned ids are ignored (Faiss `remove_ids` semantics); the
    * mark still advances, so the batch never replays. */
  def ivfDeleteSink(base: String, appId: String = DefaultApp)(
      batch: DataFrame, batchId: Long): Unit =
    removeOnce(base, batchId, appId)(
      graft.llm.IndexDelete.removalPlan(batch.sparkSession, base, batch))

  /** Delete lineages mark under a NAMESPACED key (`del:<appId>`), so
    * the recall gates' append-skew comparisons can see exactly the
    * marks that have code-table counterparts: a delete batch never
    * reaches the PQ/SQ/BQ sinks, so its mark existing only on the IVF
    * base is the steady state, not skew — comparing full maps would
    * leave the retrain deferred FOREVER after the first streamed
    * delete (review-caught). Marks written by the one pre-namespace
    * dev revision (plain appId key) would read as append skew; no
    * shipped artifact carries one, so there is no migration path —
    * a hand-built artifact in that state needs a one-time key strip
    * in its stream_state. */
  private[graft] val DeleteMarkPrefix = "del:"

  /** The append-lineage marks of `base` — the delete lineages
    * stripped; what cross-artifact skew checks compare. */
  private def appendMarks(base: String): Map[String, Long] =
    readState(base).filterNot(_._1.startsWith(DeleteMarkPrefix))

  private def appendMarksOf(state: Map[String, Long]): Map[String, Long] =
    state.filterNot(_._1.startsWith(DeleteMarkPrefix))

  /** [[commitOnce]] keyed by the delete-namespaced lineage, parts
    * negated, tombstones written when anything was actually removed.
    * The removal plan evaluates inside commitOnce's by-name `parts`
    * (after the expected fingerprint is captured); the ids it yields
    * ride to the body through the local stash. */
  private def removeOnce(base: String, batchId: Long, appId: String)(
      plan: => (DataFrame, (Long, Long))): Unit = {
    requireAppId(appId)
    var removed: Option[(DataFrame, Long)] = None
    commitOnce(base, batchId, DeleteMarkPrefix + appId, {
      val (ids, (dn, dx)) = plan
      removed = Some((ids, dn))
      (-dn, dx)
    }) { live =>
      removed.foreach { case (ids, dn) =>
        if (dn > 0) graft.llm.IndexDelete.writeTombstones(live, ids)
      }
    }
  }

  /** One-time BM25 bootstrap: the initial corpus becomes the index's
    * `base` segment (postings with segment-local df, term-hash
    * bucketed, + its 1-row totals), plus the per-doc `dochash`
    * identity sidecar the delete verb resolves through
    * ([[bm25DeleteSink]] — a delete request carries only a doc_id;
    * the stored hash moves the fingerprint, the stored dl rebuilds
    * the totals at merge time). */
  def bm25Bootstrap(base: String, docs: DataFrame): BootstrapStatus =
    bootstrapOnce(base, Retrieval.frameDocsFingerprintParts(docs)) {
      staging =>
        val (p, t) = Retrieval.segmentPostingsFrame(docs, "base")
        graft.io.Store.writePartitionedParquet(
          p, s"$staging/postings", Seq("tbucket"), Seq("term", "doc_id"))
        t.coalesce(1).write.mode("overwrite").parquet(s"$staging/totals")
        Retrieval.docHashFrame(docs)
          .coalesce(1).sortWithinPartitions(col("doc_id"))
          .write.mode("overwrite").parquet(s"$staging/dochash")
    }

  /** Merge the BM25 index's accumulated segments into one — the real
    * Lucene merge, run WITHOUT re-reading any document text: postings
    * rows `(doc_id, dl, term, tf)` are segment-independent facts, so
    * the merged segment is their union with document frequency
    * RECOUNTED over the index's own rows (one term-keyed pass over the
    * index — index-sized, never corpus-sized) and the totals rows
    * summed. The fingerprint survives: it identifies the INDEXED
    * CORPUS (the doc-content chain the appends composed), which a
    * segment merge does not change; the manifest re-covers the new
    * file set. Streamed appends continue afterwards from the same
    * high-water mark. */
  def compactBm25(spark: org.apache.spark.sql.SparkSession,
      base: String): Boolean =
    ArtifactStore.rewrite(base) { (live, staging) =>
      // the merge is also where lexical DELETES become physical
      // (exactly Lucene: a merge drops deleted docs and the merged
      // segment's stats no longer count them): tombstoned docs are
      // omitted, df recounted over the surviving rows, totals rebuilt
      // from the live dochash sidecar (postings cannot rebuild totals
      // — a doc whose text has no terms has no posting row), and the
      // tombstone set resets. The fingerprint is REUSED: the delete
      // sink already moved the logical membership when it tombstoned.
      val hasDochash = {
        val (fs, b) = fsb(live)
        fs.isDir(fs.join(b, "dochash"))
      }
      val p = graft.llm.IndexDelete.liveById(spark, live,
        spark.read.schema(Retrieval.segPostingsSchema)
          .parquet(s"$live/postings"), "doc_id")
      val merged = p
        .select(col("doc_id"), col("dl"), col("term"), col("tf"))
        .withColumn("df", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("term"))))
        .withColumn("seg", lit("base"))
        .withColumn("tbucket",
          pmod(xxhash64(col("term")), lit(Retrieval.PostingBuckets)))
      graft.io.Store.writePartitionedParquet(
        merged, s"$staging/postings", Seq("tbucket"),
        Seq("term", "doc_id"))
      if (hasDochash) {
        val liveDocs = graft.llm.IndexDelete.liveById(spark, live,
          Retrieval.docHashAt(spark, live), "doc_id")
        // the sidecar is the totals' authority: one row per LIVE doc
        liveDocs.agg(count(lit(1)).as("n_docs"),
            coalesce(sum(col("dl")), lit(0L)).as("t_tokens"))
          .withColumn("seg", lit("base"))
          .coalesce(1).write.mode("overwrite").parquet(s"$staging/totals")
        liveDocs.coalesce(1).sortWithinPartitions(col("doc_id"))
          .write.mode("overwrite").parquet(s"$staging/dochash")
      } else {
        // pre-dochash artifact (no deletes possible): segment-sum path
        spark.read.parquet(s"$live/totals")
          .agg(sum(col("n_docs")).as("n_docs"),
            sum(col("t_tokens")).as("t_tokens"))
          .withColumn("seg", lit("base"))
          .coalesce(1).write.mode("overwrite").parquet(s"$staging/totals")
      }
      clearTombstonesInto(live, staging)
    }

  /** The lexical twin of [[ivfAppendSink]]: each micro-batch of
    * `(doc_id, text)` becomes one delta SEGMENT (`seg = "b<batchId>"`)
    * carrying segment-local df and totals — nothing already indexed is
    * re-read or rewritten, and because segments partition the docs,
    * [[graft.llm.Retrieval.segmentedBm25Ranked]] over the grown index
    * answers IDENTICALLY to a from-scratch single index (the
    * streaming spec pins equality with s10 after two streamed
    * batches). */
  def bm25AppendSink(base: String, appId: String = DefaultApp)(
      batch: DataFrame, batchId: Long): Unit = {
    appendOnce(base, batchId,
      Retrieval.frameDocsFingerprintParts(batch), appId) { live =>
      val (p, t) = Retrieval.segmentPostingsFrame(batch, s"b$batchId")
      p.repartition(col("tbucket"))
        .sortWithinPartitions(col("tbucket"), col("term"), col("doc_id"))
        .write.mode("append").partitionBy("tbucket")
        .parquet(s"$live/postings")
      t.coalesce(1).write.mode("append").parquet(s"$live/totals")
      Retrieval.docHashFrame(batch)
        .coalesce(1).sortWithinPartitions(col("doc_id"))
        .write.mode("append").parquet(s"$live/dochash")
    }
  }

  /** [[ivfDeleteSink]]'s lexical twin — the NINTH exactly-once sink:
    * fold one micro-batch of `(doc_id)` delete requests into the BM25
    * index as a tombstone append, resolved through the dochash
    * sidecar ([[graft.llm.Retrieval.bm25RemovalPlan]] — the corpus is
    * never re-read). Pre-merge serving excludes tombstoned docs while
    * df/totals stay as stored (the Lucene deleted-docs contract);
    * [[compactBm25]] physicalizes and recounts. Absent or already-
    * tombstoned ids are ignored; the mark still advances. */
  def bm25DeleteSink(base: String, appId: String = DefaultApp)(
      batch: DataFrame, batchId: Long): Unit =
    removeOnce(base, batchId, appId)(
      Retrieval.bm25RemovalPlan(batch.sparkSession, base, batch))

  /** One-time PQ bootstrap: train the codebook on the initial corpus,
    * encode it against the STAGED (stored) codebook, and write the
    * code table cell-major — cells by assignment to the
    * already-bootstrapped IVF artifact's centroids at `ivfBase`, so
    * the code table and the vector lists shard identically from the
    * first byte. A no-op when already current for these vectors. */
  def pqBootstrap(base: String, ivfBase: String,
      vectors: DataFrame): BootstrapStatus = {
    val spark = vectors.sparkSession
    val v = withNorm(vectors)
    bootstrapOnce(base, Similarity.frameFingerprintParts(v)) { staging =>
      val centroids = spark.read.parquet(s"$ivfBase/centroids")
      Similarity.pqBuildFrom(v, staging,
        Similarity.assignToCentroids(v, centroids)
          .select(col("vec_id"), col("cell")))
    }
  }

  /** The compressed-index twin of [[ivfAppendSink]] — the FOURTH
    * exactly-once sink (IVF vectors, BM25 segments, LSH postings, now
    * PQ codes): each micro-batch encodes against the STORED frozen
    * codebook (`IndexIVFPQ::add` = `sa_encode` with trained codewords,
    * never a retrain) and appends 8-byte code rows under its cells'
    * partition dirs. Cells come from assignment to the IVF artifact's
    * stored centroids — deterministic, so the code table stays aligned
    * with what [[ivfAppendSink]] writes for the same feed regardless
    * of which sink commits a batch first. Same replay contract as the
    * siblings: the high-water mark lives inside the artifact and
    * commits in the same mutate as the rows. */
  def pqAppendSink(base: String, ivfBase: String,
      appId: String = DefaultApp)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val v = withNorm(batch)
    appendOnce(base, batchId,
        Similarity.frameFingerprintParts(v), appId) { live =>
      val cb = spark.read.parquet(s"$live/codebook")
      val centroids = spark.read.parquet(s"$ivfBase/centroids")
      val cells = Similarity.assignToCentroids(v, centroids)
        .select(col("vec_id"), col("cell"))
      Similarity.pqEncode(Similarity.pqSub(Similarity.pqNvFrame(v)), cb)
        .join(cells, "vec_id")
        .repartition(col("cell"))
        .sortWithinPartitions(col("cell"), col("vec_id"))
        .write.mode("append").partitionBy("cell")
        .parquet(s"$live/codes")
    }
  }

  /** The one compaction body every `codes/`-shaped table shares
    * (PQ/SQ/BQ): re-sort each cell partition into one file, leaving
    * everything else under the base (codebook, params, stream_state)
    * unstaged — so the publish swaps layout only and the fingerprint
    * survives ([[compactIvf]]'s contract). */
  private def compactCodesTable(spark: org.apache.spark.sql.SparkSession,
      base: String, schema: org.apache.spark.sql.types.StructType,
      cols: Seq[String]): Boolean =
    ArtifactStore.rewrite(base) { (live, staging) =>
      graft.io.Store.writePartitionedParquet(
        spark.read.schema(schema).parquet(s"$live/codes")
          .select(cols.map(col): _*),
        s"$staging/codes", Seq("cell"), Seq("vec_id"))
    }

  /** Compact the PQ code table after a run of appends: one sorted file
    * per cell partition; the unstaged codebook survives. */
  def compactPq(spark: org.apache.spark.sql.SparkSession,
      base: String): Boolean =
    compactCodesTable(spark, base, Similarity.pqCodesSchema,
      Seq("vec_id", "codes", "cell"))

  /** The streaming RECALL GATE — s24's audit→decide→retrain loop at
    * index-maintenance cadence, for a streaming-maintained IVF-PQ pair
    * ([[ivfAppendSink]] + [[pqAppendSink]]): every appended batch was
    * encoded against models that never saw it, so recall decays batch
    * by batch; the maintenance scheduler runs this gate (like
    * [[compactIvf]], after a run of appends) and the index retrains
    * itself only when the measured SLO is violated.
    *
    * Everything runs off the artifacts alone — there is no corpus
    * table in a streaming deployment: the audit panel (`vec_id%4=0`,
    * the s23/s24 convention) and the ground truth both come out of the
    * stored inverted lists, and the served side is the s21 chain over
    * the stored centroids/codebook/codes
    * ([[Similarity.storedIvfPqServeFrom]]).
    *
    * The retrain is an [[graft.io.ArtifactStore.rewrite]] of BOTH
    * artifacts: the vector set — and therefore the row-content
    * fingerprint — is unchanged; only the models and the layout/codes
    * they derive change, which is exactly rewrite's contract. The
    * non-staged `stream_state` high-water mark survives the publish
    * (compactPq's codebook-survival contract), so batch replay
    * protection carries straight across a retrain, and later appends
    * encode against the NEW frozen models — the Faiss retrain-and-
    * keep-adding lifecycle. Deterministic training makes the result
    * row-identical to a from-scratch bootstrap over the same vectors
    * (spec-pinned).
    *
    * Two protocol guards (both review-caught):
    *
    *  - '''skew deferral''' — the retrain runs ONLY when the two
    *    sinks' high-water marks agree. Retraining the PQ table from
    *    IVF lists that already contain a batch the PQ sink has not
    *    committed would publish that batch's codes under PQ's old mark
    *    and fingerprint, so the sink's replay of that batch would
    *    double-ingest; the symmetric skew would silently DROP codes
    *    the PQ sink had committed. A cycle that observes skew returns
    *    `retrained = false` and defers — the sinks drain within a
    *    trigger and the next maintenance cycle retrains.
    *  - '''self-heal''' — a crash inside a previous cycle's PQ rewrite
    *    leaves the PQ artifact marker-less (data intact, nothing
    *    valid) and every sink append throwing. The PQ artifact is
    *    entirely DERIVABLE from the IVF artifact, so the gate rebuilds
    *    it up front: fingerprint = the IVF artifact's (same vector
    *    set), replay mark copied from the IVF artifact's.
    *
    * `panelMod` bounds the audit's cost: the exact-truth pass is
    * O(|panel| · n) — every `panelMod`-th vector is audited (the
    * s23/%4 convention at fixture scale); a production index raises
    * it with n so the panel stays fixed-size (~1e4 queries) and the
    * audit never outgrows the retrain it gates.
    *
    * The mark-equality check is advisory, not atomic with the
    * rewrites: it closes the steady-state skew case, not a sink
    * actively racing the retrain itself. Like every index-maintenance
    * system (Lucene merges, Faiss rebuilds), the gate expects to run
    * from the maintenance scheduler between triggers — not
    * concurrently with an active write stream on the same index; the
    * publish gap between the two rewrites (spanning the PQ training)
    * is inside the same window, so probes never observe the
    * mixed-generation pair on the healthy path.
    *
    * A co-maintained SQ8 code table ([[sqAppendSink]]) opts in via
    * `sqBase`: it joins the heal (derivable from the IVF artifact like
    * PQ), the skew deferral (its mark must agree too), and the retrain
    * (an IVF retrain re-cells every dependent code table — the SQ
    * ranges themselves are vector-set-pure and reproduce identically,
    * but the cell partitioning must shard with the new lists). The
    * audit signal stays the IVF-PQ pair's recall: one decision, all
    * dependent tables move to the new generation together.
    *
    * Returns `(queries, hits, fired, retrained)` — the audit report
    * the maintenance job logs either way; `fired && !retrained` means
    * the SLO is violated but the rebuild was deferred to an aligned
    * cycle. */
  def recallGateAndRetrain(spark: org.apache.spark.sql.SparkSession,
      ivfBase: String, pqBase: String, panelMod: Long = 4,
      sqBase: Option[String] = None,
      bqBase: Option[String] = None): (Int, Long, Boolean, Boolean) = {
    val ivfFp = healPair(spark, ivfBase, pqBase)
    // co-maintained derived tables ([[sqAppendSink]]/[[bqAppendSink]])
    // are equally derivable from the IVF artifact — same heal
    val kinds = DerivedKinds.toMap
    val derived: Seq[(String, (DataFrame, String) => Unit)] =
      sqBase.map(_ -> kinds("sq")).toSeq ++
        bqBase.map(_ -> kinds("bq")).toSeq
    derived.foreach { case (b, build) =>
      healDerivedAgainst(spark, ivfBase, b, ivfFp)(build)
    }
    def lists = invertedLists(spark, ivfBase)
    val (queries, truthRows, hits) =
      auditRecall(spark, ivfBase, pqBase, panelMod)
    val fired = Similarity.retrainDecision(truthRows, hits)
    // skew deferral covers every co-retrained table: an IVF retrain
    // re-cells the derived codes too, so folding an uncommitted batch
    // in (or dropping a committed one) has exactly the PQ failure mode.
    // Compared on APPEND lineages only: a delete batch never reaches
    // the code-table sinks, so its del:-namespaced mark lives on the
    // IVF base alone by design — full-map equality would defer the
    // retrain forever after the first streamed delete (review-caught);
    // the retrain itself reads the live lists, so removals are always
    // consistently reflected on every rebuilt table
    val retrained = fired && appendMarks(ivfBase) == appendMarks(pqBase) &&
      derived.forall { case (b, _) =>
        appendMarks(b) == appendMarks(ivfBase) }
    if (retrained) {
      val ivfOk = ArtifactStore.rewrite(ivfBase) { (live, staging) =>
        // retrain from the LIVE members: tombstoned rows drop out of
        // the rewritten lists here (same physicalization as
        // [[compactIvf]]) and the tombstone set resets — the preserved
        // fingerprint already covers exactly this membership
        Similarity.ivfBuildFrom(
          graft.llm.IndexDelete.liveListsAt(spark, live)
            .select(col("vec_id"), col("embedding"), col("norm")),
          staging)
        clearTombstonesInto(live, staging)
      }
      require(ivfOk, s"no valid IVF artifact to retrain at $ivfBase")
      val pqOk = ArtifactStore.rewrite(pqBase) { (_, staging) =>
        // vectors and cells come from the freshly-retrained IVF lists,
        // so the code table shards identically to the new generation
        Similarity.pqBuildFrom(
          lists.select(col("vec_id"), col("embedding"), col("norm")),
          staging, lists.select(col("vec_id"), col("cell")))
      }
      require(pqOk, s"no valid PQ artifact to retrain at $pqBase")
      // the derived models are vector-set-pure (SQ ranges reproduce
      // bit-identically; BQ has no model at all), but each code table's
      // CELL partitioning must shard with the new lists — skipping a
      // rewrite would leave that probe path on the old cell layout
      derived.foreach { case (b, build) =>
        val ok = ArtifactStore.rewrite(b) { (_, staging) =>
          build(sqNvFromLists(lists), staging)
        }
        require(ok, s"no valid derived artifact to retrain at $b")
      }
    }
    (queries, hits, fired, retrained)
  }

  /** Stored inverted lists as the derived builds' `(vec_id, cell, nv)`
    * frame. */
  private def sqNvFromLists(lists: DataFrame): DataFrame = lists
    .withColumn("nv",
      expr(Similarity.UnitNvExpr))
    .select(col("vec_id"), col("cell"), col("nv"))

  /** The gate's heal preamble, shared by both retrain postures: roll
    * back a crashed publish first (old generation split between the
    * base and a `.tmp-old-*` aside — the restore brings back the old
    * MARKER too, so the artifact usually revalidates outright, and it
    * must run before any ensure/rewrite's orphan reap could destroy
    * the aside copy). The self-heals below then cover only the
    * residual marker-less-with-data class (aside-less marker loss):
    * IVF re-marks itself from its own rows, PQ rebuilds from its
    * sibling. Returns the healed IVF fingerprint. */
  private def healPair(spark: org.apache.spark.sql.SparkSession,
      ivfBase: String, pqBase: String): String = {
    graft.functions.VectorExpressions.register(spark)
    if (ArtifactStore.currentFingerprint(ivfBase).isEmpty)
      ArtifactStore.restoreAside(ivfBase)
    if (ArtifactStore.currentFingerprint(ivfBase).isEmpty && {
        val (fs, b) = fsb(ivfBase)
        fs.isDir(fs.join(b, "assignments"))
      })
      rebuildIvfFromSelf(spark, ivfBase)
    val ivfFp = ArtifactStore.currentFingerprint(ivfBase).getOrElse(
      throw new IllegalStateException(
        s"no valid IVF artifact at $ivfBase — bootstrap first"))
    if (ArtifactStore.currentFingerprint(pqBase).isEmpty) {
      ArtifactStore.restoreAside(pqBase) // same publish-crash roll-back
      if (ArtifactStore.currentFingerprint(pqBase).isEmpty)
        rebuildPqFrom(spark, ivfBase, pqBase, ivfFp)
    }
    ivfFp
  }

  /** The IVF artifact's LIVE members — stored lists minus tombstones
    * ([[ivfDeleteSink]]). Every maintenance read (audit truth, gate
    * retrains, derived-table rebuilds) goes through here, so deletes
    * propagate to every member artifact at the next maintenance touch
    * and a rebuilt/retrained artifact's content always matches the
    * fingerprint the delete sink left behind. An index that never saw
    * a delete has no tombstone dir and this IS the plain stored scan
    * (plan-identical — the conditional is resolved driver-side). */
  private def invertedLists(spark: org.apache.spark.sql.SparkSession,
      ivfBase: String): DataFrame =
    graft.llm.IndexDelete.liveListsAt(spark, ivfBase)

  /** The recall audit entirely off the artifacts (the s24 posture):
    * exact top-10 truth over the stored vectors vs what the compressed
    * pair actually serves for every `panelMod`-th vector. Returns
    * `(queries, truthRows, hits)`. */
  private def auditRecall(spark: org.apache.spark.sql.SparkSession,
      ivfBase: String, pqBase: String, panelMod: Long): (Int, Long, Long) = {
    val lists = invertedLists(spark, ivfBase)
    val panel = lists.filter(col("vec_id") % panelMod === 0)
      .select(col("vec_id"), col("embedding"), col("norm"))
    val served = Similarity
      .storedIvfPqServeFrom(spark, panel, ivfBase, pqBase)
      .select(col("query_id"), col("neighbor_id"))
    val nvAll = lists.select(col("vec_id"),
      expr(Similarity.UnitNvExpr)
        .as("nv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    val truth = nvAll.filter(col("vec_id") % panelMod === 0)
      .select(col("vec_id").as("query_id"), col("nv").as("qnv"))
      .join(nvAll.select(col("vec_id").as("neighbor_id"),
        col("nv").as("cnv")), col("query_id") =!= col("neighbor_id"))
      .withColumn("score",
        floor(expr("vec_dot(qnv, cnv)") * lit(1048576.0)).cast("long"))
      .withColumn("ern", row_number().over(w))
      .filter(col("ern") <= 10)
      .select(col("query_id"), col("neighbor_id"))
    val r = truth
      .join(served.withColumn("hit", lit(1)),
        Seq("query_id", "neighbor_id"), "left")
      .agg(countDistinct(col("query_id")).cast("integer").as("queries"),
        count(lit(1)).as("truth_rows"),
        count(col("hit")).as("hits"))
      .head() // 1-row audit aggregate, the s24 posture
    (r.getInt(0), r.getLong(1), r.getLong(2))
  }

  // ---------------------------------------------------------------
  // Generation-pointer pair: the retrain posture with NO mixed window
  // ---------------------------------------------------------------

  /** Name of the pointer file at a pair root. The pointed-to
    * generation dir holds the serving `ivf`/`pq` artifact pair;
    * retrains build the NEXT generation completely beside it and then
    * swap this one pointer atomically — so a reader that resolves the
    * pair through [[resolvePair]] can never observe a new-IVF/old-PQ
    * mix, closing the publish gap the in-place
    * [[recallGateAndRetrain]] accepts as a maintenance-window
    * contract (VERDICT r11 #2). */
  private val CurrentName = "CURRENT"

  private def genPaths(pairBase: String, gen: String): (String, String) = {
    val (fs, root) = fsb(pairBase)
    (fs.join(fs.join(root, gen), "ivf"),
      fs.join(fs.join(root, gen), "pq"))
  }

  /** The derived generation members the pair machinery can carry
    * beyond the core IVF-PQ pair (see [[bootstrapPair]]'s
    * `withSq`/`withBq`): kind name → the build tail over the
    * `(vec_id, cell, nv)` lists frame. Every kind here must be fully
    * derivable from the IVF artifact — that is what makes the heal,
    * the adoption and the co-retrain mechanical. Presence is
    * self-describing: a generation that has a member's dir carries the
    * table through every retrain; one that never did stays a pure
    * IVF-PQ pair. */
  private val DerivedKinds: Seq[(String, (DataFrame, String) => Unit)] =
    Seq("sq" -> (Similarity.sqBuildFromNv _),
      "bq" -> (Similarity.bqBuildFromNv _))

  private def memberGenPath(pairBase: String, gen: String,
      kind: String): String = {
    val (fs, root) = fsb(pairBase)
    fs.join(fs.join(root, gen), kind)
  }

  private def memberIfPresent(pairBase: String, gen: String,
      kind: String): Option[String] = {
    val p = memberGenPath(pairBase, gen, kind)
    if (fsb(pairBase)._1.isDir(p)) Some(p) else None
  }


  /** The serving generation named by the pointer, e.g. `"g3"`; None
    * before [[bootstrapPair]] completes. */
  def currentGen(pairBase: String): Option[String] = {
    val (fs, root) = fsb(pairBase)
    val p = fs.join(root, CurrentName)
    if (fs.isFile(p)) Some(fs.read(p).trim) else None
  }

  /** Resolve the pair root to the CURRENT generation's concrete
    * `(ivfBase, pqBase)` — the one read every probe, sink batch and
    * audit starts from. Resolving ONCE and using both paths is what
    * guarantees a consistent pair: generations are immutable except
    * for appends to the current one, and the pointer swap is a single
    * atomic rename. */
  def resolvePair(pairBase: String): (String, String) = {
    val gen = currentGen(pairBase).getOrElse(throw new IllegalStateException(
      s"no CURRENT generation at $pairBase — bootstrapPair first"))
    genPaths(pairBase, gen)
  }

  /** The CURRENT generation's SQ8 base, when the pair was bootstrapped
    * `withSq` — same consistency rule as [[resolvePair]]: resolve once,
    * use the returned path for the whole probe. */
  def resolveSq(pairBase: String): Option[String] =
    memberIfPresent(pairBase, requireGen(pairBase), "sq")

  /** [[resolveSq]] for the binary member (`withBq`). */
  def resolveBq(pairBase: String): Option[String] =
    memberIfPresent(pairBase, requireGen(pairBase), "bq")

  private def swapCurrent(pairBase: String, gen: String): Unit = {
    val (fs, root) = fsb(pairBase)
    // ENFORCED, not advisory (review-caught): on a binding whose
    // replace degrades to delete+rename, a crash in the absence
    // window (or a failed rename after the delete) leaves the pair
    // pointer-less — the next bootstrap then adopts g0 and the
    // retention sweep would destroy the NEWEST generation. Better to
    // refuse the swap than to risk the pointer.
    require(fs.replaceIsAtomic,
      s"generation pointers need an ATOMIC replace; the backend for " +
        s"$pairBase lacks one (no AbstractFileSystem binding for its " +
        "scheme) — bind one (HDFS ships Hdfs) or host the pair root " +
        "on a POSIX path")
    fs.mkdirs(root)
    fs.writeAtomicReplace(fs.join(root, CurrentName), gen)
  }

  /** One-time bootstrap of a generation-pointer pair: generation `g0`
    * is built completely (IVF, then PQ sharded by its cells) and only
    * then named by the pointer. Idempotent: a crash before the
    * pointer write re-runs both bootstraps (valid artifacts no-op)
    * and just writes the pointer; an existing pointer delegates to
    * the per-artifact initialize-only semantics. */
  def bootstrapPair(pairBase: String, vectors: DataFrame,
      withSq: Boolean = false,
      withBq: Boolean = false): BootstrapStatus = {
    def members(gen: String, ivfBase: String): Unit = {
      val spark = vectors.sparkSession
      if (withSq) adoptMember(spark, pairBase, gen, ivfBase, "sq")
      if (withBq) adoptMember(spark, pairBase, gen, ivfBase, "bq")
    }
    currentGen(pairBase) match {
      case Some(gen) =>
        val (ivfBase, pqBase) = genPaths(pairBase, gen)
        // the pair-level status is the WORST member status: discarding
        // the PQ call's result made "IVF current, PQ kept-divergent"
        // (a crash-recovered half-lifecycle) read as a clean repeat
        // run (ADVICE r11 #4 follow-through, VERDICT r12 #6)
        val s = BootstrapStatus.worst(
          bootstrap(ivfBase, vectors),
          pqBootstrap(pqBase, ivfBase, vectors))
        members(gen, ivfBase)
        s
      case None =>
        val (ivfBase, pqBase) = genPaths(pairBase, "g0")
        // pointer absent but g0 artifacts possibly alive (a crash
        // between the member builds and the pointer write): the
        // re-run's inner statuses distinguish the clean retry (same
        // corpus → the pointer write completes the bootstrap → Built)
        // from the operator error (CHANGED corpus → the pair adopts
        // the existing g0 artifacts, which must surface as divergence,
        // not report Built over vectors it does not index)
        val inner = BootstrapStatus.worst(
          bootstrap(ivfBase, vectors),
          pqBootstrap(pqBase, ivfBase, vectors))
        members("g0", ivfBase)
        swapCurrent(pairBase, "g0")
        if (inner == BootstrapStatus.KeptDivergent) inner
        else BootstrapStatus.Built
    }
  }

  /** Add (or heal) a generation's derived member. LATE adoption —
    * `withSq`/`withBq` on a pair that has already streamed appends —
    * must NOT build from the offered bootstrap corpus: that table
    * would silently miss every appended vector and, carrying an empty
    * mark map, defer every future retrain forever (checkpointed
    * sources never replay the committed batches that would
    * fast-forward it). The IVF sibling is the one source that is
    * always complete, so adoption IS the heal: build from the lists,
    * adopt the IVF fingerprint, copy the IVF marks. An existing valid
    * member is kept untouched (initialize-only, like every bootstrap).
    * On a fresh generation this is content-identical to encoding the
    * offered corpus — the lists ARE its assignment. */
  private def adoptMember(spark: org.apache.spark.sql.SparkSession,
      pairBase: String, gen: String, ivfBase: String, kind: String): Unit =
    healDerivedAgainst(spark, ivfBase, memberGenPath(pairBase, gen, kind),
      ArtifactStore.currentFingerprint(ivfBase).getOrElse(
        throw new IllegalStateException(
          s"no valid IVF artifact at $ivfBase — bootstrap failed?")))(
      DerivedKinds.toMap.apply(kind))

  /** The paired-generation sinks: each micro-batch resolves the
    * CURRENT generation once and appends to that pair. Same replay
    * contract as the fixed-base sinks (the high-water mark lives in
    * each generation's artifact and is carried across retrains) PLUS
    * the swap-race guard: if the pointer moved while the batch was
    * committing, the commit landed on a RETIRED generation whose rows
    * the new one does not contain — the sink then throws, the
    * streaming query fails the batch, and the framework's replay
    * lands on the new generation (whose mark map predates the commit,
    * so the replay appends instead of skipping). Together with the
    * gate's pre-swap mark re-check this closes the silent-drop
    * windows around a concurrent retrain (review-caught r12). */
  def ivfAppendSinkPaired(pairBase: String, appId: String = DefaultApp)(
      batch: DataFrame, batchId: Long): Unit = {
    val gen = requireGen(pairBase)
    ivfAppendSink(genPaths(pairBase, gen)._1, appId)(batch, batchId)
    requireGenUnmoved(pairBase, gen, batchId)
  }

  /** [[ivfAppendSinkPaired]]'s PQ twin. */
  def pqAppendSinkPaired(pairBase: String, appId: String = DefaultApp)(
      batch: DataFrame, batchId: Long): Unit = {
    val gen = requireGen(pairBase)
    val (ivfBase, pqBase) = genPaths(pairBase, gen)
    pqAppendSink(pqBase, ivfBase, appId)(batch, batchId)
    requireGenUnmoved(pairBase, gen, batchId)
  }

  /** [[ivfAppendSinkPaired]]'s SQ8 twin (a generation bootstrapped
    * `withSq`). */
  def sqAppendSinkPaired(pairBase: String, appId: String = DefaultApp)(
      batch: DataFrame, batchId: Long): Unit = {
    val gen = requireGen(pairBase)
    sqAppendSink(memberGenPath(pairBase, gen, "sq"),
      genPaths(pairBase, gen)._1, appId)(batch, batchId)
    requireGenUnmoved(pairBase, gen, batchId)
  }

  /** [[ivfAppendSinkPaired]]'s binary twin (a generation bootstrapped
    * `withBq`). */
  def bqAppendSinkPaired(pairBase: String, appId: String = DefaultApp)(
      batch: DataFrame, batchId: Long): Unit = {
    val gen = requireGen(pairBase)
    bqAppendSink(memberGenPath(pairBase, gen, "bq"),
      genPaths(pairBase, gen)._1, appId)(batch, batchId)
    requireGenUnmoved(pairBase, gen, batchId)
  }

  /** [[ivfAppendSinkPaired]]'s DELETE twin ([[ivfDeleteSink]]):
    * tombstones land on the current generation's IVF base — the
    * pair's single membership truth. The compressed members' code
    * tables keep the deleted ids' codes until maintenance (the serve
    * path's exact refine already drops them — it inner-joins the live
    * lists — at worst costing a few diluted rerank-pool slots, the
    * s26 post-filter class); the next compaction or gate retrain
    * physicalizes the removal everywhere. */
  def ivfDeleteSinkPaired(pairBase: String, appId: String = DefaultApp)(
      batch: DataFrame, batchId: Long): Unit = {
    val gen = requireGen(pairBase)
    ivfDeleteSink(genPaths(pairBase, gen)._1, appId)(batch, batchId)
    requireGenUnmoved(pairBase, gen, batchId)
  }

  private def requireGen(pairBase: String): String =
    currentGen(pairBase).getOrElse(throw new IllegalStateException(
      s"no CURRENT generation at $pairBase — bootstrapPair first"))

  private def requireGenUnmoved(pairBase: String, gen: String,
      batchId: Long): Unit = {
    val now = currentGen(pairBase)
    if (!now.contains(gen)) throw new IllegalStateException(
      s"generation at $pairBase swapped $gen -> ${now.getOrElse("?")} " +
        s"during batch $batchId: committed to a retired generation — " +
        s"failing the batch so the replay lands on the current one")
  }

  /** The recall gate over a generation-pointer pair — same
    * audit → integer decision → retrain loop as
    * [[recallGateAndRetrain]], but the retrain builds the ENTIRE next
    * generation (IVF, then PQ sharded by the new cells, replay marks
    * staged across) under `pairBase/g<N+1>` while `g<N>` keeps
    * serving, and then swaps the pointer atomically. Probes resolving
    * through [[resolvePair]] therefore observe the complete old pair
    * or the complete new pair — NEVER new-IVF/old-PQ — at every
    * instant, including the whole PQ-training span the in-place
    * posture leaves mixed. Generations before the one just replaced
    * are deleted (one-generation grace for readers that resolved
    * before the swap and are still scanning — the same reason Lucene
    * keeps the previous commit point until the next one).
    *
    * A generation bootstrapped `withSq` carries its SQ8 table through
    * the same machinery: healed from the IVF sibling, its replay mark
    * part of the skew deferral and the pre-swap re-check, rebuilt
    * against the new generation's cells before the pointer moves — so
    * the never-mixed guarantee covers all THREE artifacts.
    *
    * `midBuild` is a test seam invoked between the two artifact
    * builds — the widest point of the old mixed window. */
  def recallGateAndRetrainPaired(spark: org.apache.spark.sql.SparkSession,
      pairBase: String, panelMod: Long = 4,
      midBuild: () => Unit = () => ()): (Int, Long, Boolean, Boolean) = {
    val gen = currentGen(pairBase).getOrElse(throw new IllegalStateException(
      s"no CURRENT generation at $pairBase — bootstrapPair first"))
    val (ivfBase, pqBase) = genPaths(pairBase, gen)
    val ivfFp = healPair(spark, ivfBase, pqBase)
    // derived generation members join the heal, the skew deferral, the
    // build and the swap-race re-check — presence is the gen dir, not
    // the marker, so a crashed member publish heals instead of silently
    // dropping the table from the next generation
    val derivedCur: Seq[(String, String, (DataFrame, String) => Unit)] =
      DerivedKinds.flatMap { case (kind, build) =>
        memberIfPresent(pairBase, gen, kind).map((kind, _, build))
      }
    derivedCur.foreach { case (_, p, build) =>
      healDerivedAgainst(spark, ivfBase, p, ivfFp)(build)
    }
    val (queries, truthRows, hits) =
      auditRecall(spark, ivfBase, pqBase, panelMod)
    val fired = Similarity.retrainDecision(truthRows, hits)
    // full IVF state snapshot (delete marks included — the swap-race
    // re-check must catch a delete racing the builds: the new
    // generation was built from lists read BEFORE that delete, so
    // swapping would silently UNDO it); cross-artifact skew compares
    // append lineages only, as in the fixed-base gate
    val marksBefore = readState(ivfBase)
    val appendsBefore = appendMarksOf(marksBefore)
    var retrained = fired && appendsBefore == appendMarks(pqBase) &&
      derivedCur.forall { case (_, p, _) =>
        appendMarks(p) == appendsBefore }
    if (retrained) {
      val next = s"g${gen.stripPrefix("g").toLong + 1}"
      val (ivfNew, pqNew) = genPaths(pairBase, next)
      // same vector set → the new generation carries the SAME
      // fingerprint (content-derived, layout/model-insensitive); a
      // crashed prior attempt at this generation either revalidates
      // (no appends since — identical content) or rebuilds (ensure
      // sees the fingerprint moved)
      ArtifactStore.ensure(ivfNew, ivfFp) { staging =>
        Similarity.ivfBuildFrom(
          invertedLists(spark, ivfBase)
            .select(col("vec_id"), col("embedding"), col("norm")),
          staging)
        copyStateInto(ivfBase, staging)
      }
      midBuild() // the old mixed window: g<N> still serves, complete
      val newLists = invertedLists(spark, ivfNew)
      ArtifactStore.ensure(pqNew, ivfFp) { staging =>
        // vectors and cells from the NEW generation's lists, so the
        // code table shards identically to what it will serve beside
        Similarity.pqBuildFrom(
          newLists.select(col("vec_id"), col("embedding"), col("norm")),
          staging, newLists.select(col("vec_id"), col("cell")))
        copyStateInto(pqBase, staging)
      }
      derivedCur.foreach { case (kind, p, build) =>
        ArtifactStore.ensure(memberGenPath(pairBase, next, kind),
            ivfFp) { staging =>
          build(sqNvFromLists(newLists), staging)
          copyStateInto(p, staging)
        }
      }
      // swap-race guard: a sink that committed to g<N> DURING the
      // builds put rows (and marks) there that g<N+1> does not carry —
      // swapping would silently drop them. Abandon the swap instead
      // (the next cycle retrains against the moved fingerprint; the
      // half-built generation is revalidated-or-rebuilt by ensure).
      // Together with the sinks' post-commit pointer re-check this
      // leaves no commit unaccounted for (review-caught r12).
      if (readState(ivfBase) != marksBefore ||
          appendMarks(pqBase) != appendsBefore ||
          derivedCur.exists { case (_, p, _) =>
            appendMarks(p) != appendsBefore }) {
        retrained = false
      } else swapCurrent(pairBase, next)
      // retention (only after a real swap): keep the just-replaced
      // generation as the reader grace copy; everything older goes
      if (retrained) {
        val (fs, root) = fsb(pairBase)
        // gN retention, plus pointer-swap tmp orphans from crashed
        // swapCurrent calls: nothing else reaps the pair ROOT (the
        // .tmp-* reaper runs inside artifact bases only), and pair
        // maintenance is single-maintainer by design, so a .tmp- file
        // here is always a prior crash's remnant (review-caught)
        fs.childNames(root)
          .filter(n => (n.startsWith("g") && n != next && n != gen) ||
            n.startsWith(".tmp-"))
          .map(fs.join(root, _))
          .foreach(fs.delete)
      }
    }
    (queries, hits, fired, retrained)
  }

  /** Stage the replay high-water mark from a live artifact into a
    * new generation's staging dir (staged with the data: a
    * post-publish copy would be an unmanifested extra file). */
  private def copyStateInto(fromBase: String, staging: String): Unit = {
    val (fs, b) = fsb(fromBase)
    val st = fs.join(b, "stream_state")
    if (fs.isFile(st))
      fs.writeAtomic(fs.join(staging, "stream_state"), fs.read(st))
  }

  /** Self-heal for a marker-less IVF artifact. Since the stage-first
    * hardening, the only marker-less window of the gate's IVF rewrite
    * is the publish itself (marker delete → child renames → re-mark;
    * the training body runs against a still-marked artifact). A death
    * there leaves the old generation's files split between the base
    * and the publish's `.tmp-old-*` aside dir — the CALLER first
    * rolls that back ([[graft.io.ArtifactStore.restoreAside]]), after
    * which the complete old file set sits unmarked in the base. The
    * vectors ARE the store in the streaming posture, so the artifact
    * then re-marks ITSELF: the fingerprint is recomputed from the
    * stored rows (xor-composed row hashes — identical to the value
    * the chained marker carried), models retrain from the same rows,
    * and the replay mark is staged across. If a VALID PQ table still
    * shards by the pre-heal cells, the next audit sees the mixed
    * generation as low recall and the normal fired→retrain path
    * restores consistency — the loop is its own repair.
    * (Review-caught: the PQ side had a heal, the IVF side did not.) */
  private def rebuildIvfFromSelf(spark: org.apache.spark.sql.SparkSession,
      ivfBase: String): Unit = {
    // LIVE rows only: the chained marker this heal reproduces always
    // covered "stored rows minus tombstones" (the delete sink xor'd
    // removals out as it tombstoned them), so re-marking from the raw
    // rows would resurrect deleted members under a diverged
    // fingerprint. The rebuild physicalizes the deletes as a side
    // effect (ensure sweeps the stale tombstone dir with the other
    // old children).
    val v = graft.llm.IndexDelete.liveListsAt(spark, ivfBase)
      .select(col("vec_id"), col("embedding"), col("norm"))
    val (n, x) = Similarity.frameFingerprintParts(v)
    ArtifactStore.ensure(ivfBase, fpStr(n, x)) { staging =>
      Similarity.ivfBuildFrom(v, staging)
      copyStateInto(ivfBase, staging)
    }
    ()
  }

  /** Rebuild the PQ artifact entirely from the IVF artifact — the
    * self-heal path for a marker-less PQ base (crash inside a prior
    * rewrite) and the one place the PQ fingerprint is SET rather than
    * chained: the rebuilt content is exactly the IVF lists' vector
    * set, so it carries the IVF artifact's fingerprint and the replay
    * mark is copied from the IVF artifact's `stream_state` (the
    * rebuild's ensure sweeps the old one with the other stale
    * children). */
  private def rebuildPqFrom(spark: org.apache.spark.sql.SparkSession,
      ivfBase: String, pqBase: String, fp: String): Unit = {
    ArtifactStore.ensure(pqBase, fp) { staging =>
      val v = graft.llm.IndexDelete.liveListsAt(spark, ivfBase)
        .select(col("vec_id"), col("embedding"), col("norm"), col("cell"))
      Similarity.pqBuildFrom(
        v.select(col("vec_id"), col("embedding"), col("norm")),
        staging, v.select(col("vec_id"), col("cell")))
      // the replay mark is STAGED with the data (a post-publish copy
      // would be an unmanifested extra file — the artifact would fail
      // its own manifest validation and read as absent)
      copyStateInto(ivfBase, staging)
    }
    ()
  }

  /** [[rebuildPqFrom]] for a derived code table (SQ8/BQ): equally
    * derivable from the IVF artifact (the models are vector-set-pure
    * and reproduce bit-identically — or do not exist; the cells come
    * from the lists), fingerprint set to the IVF artifact's, replay
    * mark copied the same staged way. */
  private def rebuildDerivedFrom(spark: org.apache.spark.sql.SparkSession,
      ivfBase: String, base: String, fp: String)(
      build: (DataFrame, String) => Unit): Unit = {
    ArtifactStore.ensure(base, fp) { staging =>
      build(sqNvFromLists(invertedLists(spark, ivfBase)), staging)
      copyStateInto(ivfBase, staging)
    }
    ()
  }

  /** The derived-member heal shared by both gate postures and
    * [[bootstrapPair]]'s adoption path: roll back a crashed publish
    * first, then rebuild a still-invalid (or absent) member from the
    * IVF sibling. A valid member is untouched. */
  private def healDerivedAgainst(spark: org.apache.spark.sql.SparkSession,
      ivfBase: String, base: String, ivfFp: String)(
      build: (DataFrame, String) => Unit): Unit =
    if (ArtifactStore.currentFingerprint(base).isEmpty) {
      ArtifactStore.restoreAside(base)
      if (ArtifactStore.currentFingerprint(base).isEmpty)
        rebuildDerivedFrom(spark, ivfBase, base, ivfFp)(build)
    }

  /** Per-partition-dir fragmentation of a cell-major table: the
    * MAXIMUM part-file count across the `cell=*` dirs under
    * `base/$sub` — each append adds one file per touched cell, so this
    * is "how many appends since the last compaction" for the hottest
    * cell. 0 when the table does not exist yet. */
  def fragmentation(base: String, sub: String): Int = {
    val (fs, b) = fsb(base)
    val root = fs.join(b, sub)
    val perDir = fs.childNames(root)
      .map(fs.join(root, _)).filter(fs.isDir)
      .map(d => fs.childNames(d).count(_.startsWith("part-")))
    if (perDir.isEmpty) 0 else perDir.max
  }

  /** Compaction POLICY — the scheduler knob the raw `compact*` calls
    * lack: merge a streaming-maintained table's layout only when the
    * hottest partition has accumulated at least `maxFilesPerCell`
    * part files. Compacting after every batch would rewrite the whole
    * table per append (O(index) work for O(batch) input — the
    * write-amplification failure Lucene's tiered merge policy exists
    * to avoid); never compacting degrades every probe with per-file
    * open/footer costs. The threshold is the tier: appends are
    * amortized against a bounded number of files per cell. Returns
    * true iff a compaction actually ran. */
  def maybeCompactIvf(spark: org.apache.spark.sql.SparkSession,
      base: String, maxFilesPerCell: Int = 4): Boolean =
    (fragmentation(base, "assignments") >= maxFilesPerCell ||
      tombstoneFiles(base) >= maxFilesPerCell) &&
      compactIvf(spark, base)

  /** Accumulated tombstone part-file count — [[maybeCompactIvf]]'s
    * second trigger: each [[ivfDeleteSink]] batch appends one file, so
    * this is "delete batches since the last compaction" (the cheap
    * driver-side proxy for Lucene's deleted-docs-ratio merge trigger;
    * an exact ratio would read parquet row counts per policy check). */
  def tombstoneFiles(base: String): Int = {
    val (fs, b) = fsb(base)
    fs.childNames(fs.join(b, "tombstones")).count(_.startsWith("part-"))
  }

  /** [[maybeCompactIvf]] for the PQ code table. */
  def maybeCompactPq(spark: org.apache.spark.sql.SparkSession,
      base: String, maxFilesPerCell: Int = 4): Boolean =
    fragmentation(base, "codes") >= maxFilesPerCell &&
      compactPq(spark, base)

  /** A normed batch as s29's `(vec_id, cell, nv)` build/encode frame:
    * unit vectors with the cell from assignment to the IVF artifact's
    * stored centroids riding each row (SQ's encode is elementwise, so
    * unlike the PQ sink no vec_id re-join is ever needed). */
  private def sqNvc(v: DataFrame, ivfBase: String): DataFrame =
    Similarity.assignToCentroids(v,
        v.sparkSession.read.parquet(s"$ivfBase/centroids"))
      .withColumn("nv",
        expr(Similarity.UnitNvExpr))
      .select(col("vec_id"), col("cell"), col("nv"))

  /** One-time SQ8 bootstrap: train the per-dim `(vmin, vdiff)` ranges
    * on the initial corpus and write the code table cell-major — cells
    * by assignment to the already-bootstrapped IVF artifact's centroids
    * at `ivfBase`, so the scalar code table and the vector lists shard
    * identically from the first byte ([[pqBootstrap]]'s contract for
    * the quantizer whose whole train step is one min/max aggregate). */
  def sqBootstrap(base: String, ivfBase: String,
      vectors: DataFrame): BootstrapStatus = {
    val v = withNorm(vectors)
    bootstrapOnce(base, Similarity.frameFingerprintParts(v)) {
      Similarity.sqBuildFromNv(sqNvc(v, ivfBase), _)
    }
  }

  /** The scalar-quantized twin of [[pqAppendSink]] — the SIXTH
    * exactly-once sink (IVF vectors, BM25 segments, LSH postings, PQ
    * codes, paired-generation sinks, now SQ8 codes), and the cheapest
    * append path of the index triad: SQ8 has NO trained codebook to
    * consult — each micro-batch encodes elementwise against the stored
    * frozen `(vmin, vdiff)` ranges (a 1-row broadcast + one codegen'd
    * `transform`; `ScalarQuantizer::compute_codes` at add time) and
    * appends under its cells' partition dirs. Cells come from
    * assignment to the IVF artifact's stored centroids, keeping the
    * code table aligned with [[ivfAppendSink]]'s lists for the same
    * feed regardless of sink commit order. Same replay contract as the
    * siblings: the per-lineage high-water mark lives inside the
    * artifact and commits in the same mutate as the rows. Note the
    * frozen-range trade inherited from the batch posture (s22's frozen
    * codebook): streamed vectors OUTSIDE the bootstrap corpus's
    * per-dim envelope clamp to code 0/255 — the recall gate, not the
    * sink, is where a drifted envelope fires a retrain. */
  def sqAppendSink(base: String, ivfBase: String,
      appId: String = DefaultApp)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val v = withNorm(batch)
    appendOnce(base, batchId,
        Similarity.frameFingerprintParts(v), appId) { live =>
      Similarity.sqEncode(sqNvc(v, ivfBase),
          spark.read.parquet(s"$live/params"))
        .repartition(col("cell"))
        .sortWithinPartitions(col("cell"), col("vec_id"))
        .write.mode("append").partitionBy("cell")
        .parquet(s"$live/codes")
    }
  }

  /** [[compactPq]] for the SQ8 code table; the unstaged 1-row params
    * frame survives. */
  def compactSq(spark: org.apache.spark.sql.SparkSession,
      base: String): Boolean =
    compactCodesTable(spark, base, Similarity.sqCodesSchema,
      Seq("vec_id", "scodes", "cell"))

  /** [[maybeCompactIvf]] for the SQ8 code table. */
  def maybeCompactSq(spark: org.apache.spark.sql.SparkSession,
      base: String, maxFilesPerCell: Int = 4): Boolean =
    fragmentation(base, "codes") >= maxFilesPerCell &&
      compactSq(spark, base)

  /** One-time BQ bootstrap: sign-bit-encode the initial corpus and
    * write the code table cell-major — the degenerate end of the
    * bootstrap spectrum: there is NO train step at all (not even SQ8's
    * min/max pass), so the whole build is one map-only encode. Cells
    * by assignment to the already-bootstrapped IVF artifact at
    * `ivfBase`, the siblings' contract. */
  def bqBootstrap(base: String, ivfBase: String,
      vectors: DataFrame): BootstrapStatus = {
    val v = withNorm(vectors)
    bootstrapOnce(base, Similarity.frameFingerprintParts(v)) {
      Similarity.bqBuildFromNv(sqNvc(v, ivfBase), _)
    }
  }

  /** [[sqAppendSink]]'s binary twin — the SEVENTH exactly-once sink,
    * and the simplest possible one: sign bits depend on nothing
    * trained, so the append IS the encode (64 comparisons per vector,
    * map-only) plus the shared replay contract. There is no frozen
    * model to drift from — a BQ table never needs an encode-side
    * retrain, only the cell re-layout when the gate retrains the IVF
    * generation (which is why it registers in [[DerivedKinds]]). */
  def bqAppendSink(base: String, ivfBase: String,
      appId: String = DefaultApp)(
      batch: DataFrame, batchId: Long): Unit = {
    val v = withNorm(batch)
    appendOnce(base, batchId,
        Similarity.frameFingerprintParts(v), appId) { live =>
      Similarity.bqBits(sqNvc(v, ivfBase))
        .repartition(col("cell"))
        .sortWithinPartitions(col("cell"), col("vec_id"))
        .write.mode("append").partitionBy("cell")
        .parquet(s"$live/codes")
    }
  }

  /** [[compactPq]] for the BQ code table (one `codes/` child; nothing
    * else under the base, so the rewrite stages everything). */
  def compactBq(spark: org.apache.spark.sql.SparkSession,
      base: String): Boolean =
    compactCodesTable(spark, base, Similarity.bqCodesSchema,
      Seq("vec_id", "bits_lo", "bits_hi", "cell"))

  /** [[maybeCompactIvf]] for the BQ code table. */
  def maybeCompactBq(spark: org.apache.spark.sql.SparkSession,
      base: String, maxFilesPerCell: Int = 4): Boolean =
    fragmentation(base, "codes") >= maxFilesPerCell &&
      compactBq(spark, base)

  /** One-time LSH dedup-index bootstrap over the initial standing
    * corpus (digests + band postings through the atomic-publish path);
    * a no-op when the artifact is already current for these docs. */
  def lshBootstrap(base: String, docs: DataFrame): BootstrapStatus =
    bootstrapOnce(base, Dedup.docsFingerprintParts(docs)) {
      Dedup.writeDedupIndexInto(docs, _)
    }

  /** The dedup twin of [[ivfAppendSink]]/[[bm25AppendSink]] — the
    * THIRD exactly-once index sink: each micro-batch of surviving
    * `(doc_id, text)` docs (the upstream d10/p13-style adjudication
    * decided they stay) folds into the standing LSH index as new
    * digest rows + new band-posting files under the 16 existing band
    * partition dirs. Same replay contract as the siblings: the
    * batch-id high-water mark lives INSIDE the artifact and commits in
    * the same [[graft.io.ArtifactStore.mutate]] as the rows, so a
    * restarted query re-delivering a committed batch is a wholesale
    * no-op, and the index a probe sees is always pre- or post-batch,
    * never partial. */
  def lshAppendSink(base: String, appId: String = DefaultApp)(
      batch: DataFrame, batchId: Long): Unit =
    appendOnce(base, batchId, Dedup.docsFingerprintParts(batch), appId) {
      Dedup.appendDedupIndexInto(batch, _)
    }

  /** Compact the LSH dedup index after a run of appends: each band
    * partition's accumulation of per-batch posting files rewrites to
    * one sorted file per band, and the digest rows (duplicated across
    * appends when base and batch shared text) re-distinct into one
    * file — same fingerprint (the indexed corpus is unchanged; the
    * digest re-distinct only drops redundant rows the probe's
    * set-semantics membership join never saw), same publish-lock
    * marker swap as [[compactIvf]]/[[compactBm25]]. */
  def compactLsh(spark: org.apache.spark.sql.SparkSession,
      base: String): Boolean =
    ArtifactStore.rewrite(base) { (live, staging) =>
      // the compaction also physicalizes takedowns ([[lshDeleteSink]]):
      // tombstoned docs' band postings and digest rows drop out of the
      // rewritten tables, and the tombstone set resets — fingerprint
      // unchanged (the delete sink already moved the logical
      // membership when it tombstoned)
      val bands = graft.llm.IndexDelete.liveById(spark, live,
        spark.read.schema(Dedup.bandIdxSchema).parquet(s"$live/bands"),
        "doc_id")
      graft.io.Store.writePartitionedParquet(
        bands.select(col("doc_id"), col("bucket"), col("band")),
        s"$staging/bands", Seq("band"), Seq("bucket", "doc_id"))
      graft.llm.IndexDelete.liveById(spark, live,
          spark.read.schema(Dedup.digestSchema).parquet(s"$live/digests"),
          "doc_id")
        .distinct()
        .coalesce(1).write.mode("overwrite").parquet(s"$staging/digests")
      clearTombstonesInto(live, staging)
    }

  /** [[ivfDeleteSink]]'s dedup twin — the TENTH exactly-once sink:
    * fold one micro-batch of `(doc_id)` takedown requests into the
    * standing LSH index as a tombstone append, resolved through the
    * per-doc digest rows ([[graft.llm.Dedup.lshRemovalPlan]]). A
    * tombstoned doc immediately stops suppressing arrivals as
    * duplicates (the probe cuts it from both arms); [[compactLsh]]
    * physicalizes. Absent or already-tombstoned ids are ignored; the
    * mark still advances. */
  def lshDeleteSink(base: String, appId: String = DefaultApp)(
      batch: DataFrame, batchId: Long): Unit =
    removeOnce(base, batchId, appId)(
      graft.llm.Dedup.lshRemovalPlan(batch.sparkSession, base, batch))
}
