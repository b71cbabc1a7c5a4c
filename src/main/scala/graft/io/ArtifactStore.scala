package graft.io

import java.io.RandomAccessFile
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator
import scala.jdk.CollectionConverters._

/** Shared-artifact publication: the "train once, probe many" contract
  * behind the persisted IVF and BM25 indexes. A 100 TB pipeline builds
  * an index in one job and serves it to every later job — which means
  * several JVMs (the driver's verify and bench runs, a concurrent
  * notebook) can first-touch the same artifact at once, and a reader
  * must never observe a half-published file set. The reference's whole
  * execution model is exactly this persisted-node-output reuse
  * (`/root/reference/R/DataFrameOperationR.R:124-197` — a node's output
  * dir is recomputed only when absent, else read back), minus the
  * concurrency story this object adds.
  *
  * Mechanism (per artifact base dir):
  *
  *  - '''exclusive lock''' — a `FileLock` on `base/.lock` serializes
  *    check-and-build across processes; a per-path monitor serializes it
  *    across threads of one JVM (file locks are held per-JVM, so a
  *    second thread would otherwise hit
  *    `OverlappingFileLockException`).
  *  - '''staged build + atomic rename''' — `build` writes into
  *    `base/.tmp-<uuid>/…`; each child is then renamed into place
  *    (`ATOMIC_MOVE`, same filesystem by construction). A crashed build
  *    leaves only a `.tmp-*` orphan, reaped on the next build.
  *  - '''marker last, marker briefly absent''' — the build/rewrite
  *    body runs entirely against staging while the PREVIOUS artifact
  *    stays marked, intact and serving; `_FINGERPRINT` is deleted only
  *    for the short sweep + rename window and (re)written only after
  *    the full file set is in place. A crash inside a long body (Spark
  *    training jobs) therefore costs nothing but a staging orphan; a
  *    crash inside the publish window leaves a marker-less
  *    (= rebuild-on-next-touch) dir — never a marked partial set.
  *    (Appends are the exception: [[mutate]] writes into the live
  *    base, so it invalidates FIRST — its window is one small batch.)
  *  - '''manifest validation''' — the marker records every data file's
  *    relative path and size; reuse requires the on-disk file set to
  *    match EXACTLY (a tmp-reaper pruning part-files under a
  *    partitioned dir, or a clobbered write adding extras, is detected
  *    and triggers a rebuild instead of a silently short/long read).
  *
  * The artifact root is `$GRAFT_ARTIFACT_DIR` when set, else
  * `java.io.tmpdir/graft-artifacts-<user>` — user-scoped so a shared
  * /tmp on a multi-user box neither collides nor serves another user's
  * writable files ([[graft.GraftConfig.EnvArtifactDir]] documents the
  * knob; on a cluster it points at a durable shared filesystem).
  */
object ArtifactStore {

  /** Marker file name: first line the content fingerprint, each
    * following line `<size>\t<relative-path>` — the manifest. */
  private val MarkerName = "_FINGERPRINT"
  private val LockName = ".lock"

  private[graft] def artifactRoot(env: Map[String, String] = sys.env): String =
    env.getOrElse(graft.GraftConfig.EnvArtifactDir, {
      val user = env.getOrElse("USER",
        sys.props.getOrElse("user.name", "anon"))
      Paths.get(sys.props("java.io.tmpdir"),
        s"graft-artifacts-${user.replaceAll("[^A-Za-z0-9._-]", "_")}").toString
    })

  /** The publish protocol REQUIRES a local POSIX filesystem: the
    * cross-process mutex is an advisory `FileChannel` lock and the
    * staged publish relies on atomic same-volume rename — neither
    * exists on HDFS or object stores (rename there is non-atomic or
    * O(data), and advisory locks are absent entirely). A non-local
    * artifact root must therefore fail LOUDLY at the first touch:
    * `Paths.get("hdfs://nn/x")` would otherwise silently resolve to a
    * mangled RELATIVE local directory and the engine would "publish"
    * artifacts nobody asked for. `file:`-scheme URIs are accepted and
    * decoded to their local path — root handling must not assume a
    * bare path string. Deployments whose data lives on HDFS/S3 point
    * the root at local scratch or a POSIX-semantics mount; replacing
    * the coordination layer (e.g. conditional puts) is a different
    * store, not a config value. */
  private[graft] def requireLocalRoot(root: String): String = {
    val scheme =
      try new java.net.URI(root).getScheme
      catch { case _: java.net.URISyntaxException => null }
    if (scheme == "file")
      java.nio.file.Paths.get(new java.net.URI(root)).toString
    else {
      // remote = authority-style URI ("hdfs://…", "s3a://…") OR the
      // single-slash hierarchical form ("hdfs:/nn/x" — valid HDFS URI,
      // same silent Paths.get mangling; ADVICE r11). A bare colon in a
      // RELATIVE local path ("artifacts:v2/…") parses as an OPAQUE
      // URI — getPath is null there — and must stay accepted
      // (review-caught regression guard).
      val hierarchicalRemote = scheme != null && {
        val p = try new java.net.URI(root).getPath
                catch { case _: java.net.URISyntaxException => null }
        p != null && p.startsWith("/")
      }
      require(scheme == null ||
        (!root.startsWith(s"$scheme://") && !hierarchicalRemote),
        s"ArtifactStore requires a local POSIX filesystem (advisory " +
          s"locks + atomic rename); got scheme '$scheme' in '$root'. " +
          s"Point ${graft.GraftConfig.EnvArtifactDir} at local scratch.")
      root
    }
  }

  /** `root/<kind>/<corpus-dir-slug>` — one artifact instance per
    * (artifact kind, corpus location). */
  def artifactPath(kind: String, corpusDir: String): String =
    Paths.get(requireLocalRoot(artifactRoot()), kind,
      corpusDir.replaceAll("[^A-Za-z0-9._-]", "_")).toString

  /** Monitors keyed by canonical base path: threads of this JVM
    * serialize here before taking the cross-process file lock. */
  private val monitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def withLock[A](base: Path)(body: => A): A = {
    Files.createDirectories(base)
    val monitor = monitors.computeIfAbsent(
      base.toAbsolutePath.normalize.toString, _ => new Object)
    monitor.synchronized {
      val raf = new RandomAccessFile(base.resolve(LockName).toFile, "rw")
      try {
        val lock = raf.getChannel.lock() // blocks on a concurrent process
        try body finally lock.release()
      } finally raf.close()
    }
  }

  /** Every data file under `base`, as (relpath, size), sorted —
    * excluding the marker, the lock and `.tmp-*` staging orphans. */
  private def manifestOf(base: Path): Seq[(String, Long)] = {
    val s = Files.walk(base)
    try s.iterator.asScala
      .filter(Files.isRegularFile(_))
      .map(p => (base.relativize(p).toString, Files.size(p)))
      .filter { case (rel, _) =>
        rel != MarkerName && rel != LockName && !rel.startsWith(".tmp-")
      }
      .toSeq.sorted
    finally s.close()
  }

  private def renderMarker(fp: String, manifest: Seq[(String, Long)]): String =
    (fp +: manifest.map { case (rel, sz) => s"$sz\t$rel" }).mkString("\n")

  /** The fingerprint the current, FULLY VALID artifact carries — None
    * when the marker is absent or the on-disk file set deviates from
    * the manifest in any way. Call under the lock. */
  private def validFingerprint(base: Path): Option[String] = {
    val marker = base.resolve(MarkerName)
    if (!Files.isRegularFile(marker)) None
    else {
      val lines = new String(Files.readAllBytes(marker), UTF_8).split("\n")
      val expected = lines.drop(1).toSeq.map { l =>
        val i = l.indexOf('\t')
        (l.substring(i + 1), l.substring(0, i).toLong)
      }.sorted
      if (expected == manifestOf(base)) Some(lines.head.trim) else None
    }
  }

  /** Reap `.tmp-*` staging orphans left by crashed builds/rewrites. */
  private def reapStagingOrphans(basePath: Path): Unit = {
    val orphans = Files.list(basePath)
    try orphans.iterator.asScala.toSeq
      .filter(_.getFileName.toString.startsWith(".tmp-"))
      .foreach(deleteRecursively)
    finally orphans.close()
  }

  /** Recursive delete for artifact-layer callers (e.g. the
    * generation-pointer retrain's retention sweep). */
  private[graft] def deleteTree(p: Path): Unit = deleteRecursively(p)

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]())
        .iterator.asScala.foreach(Files.delete)
      finally s.close()
    }

  /** Publish what `build` staged: rename each staged child into place,
    * then write the marker over the resulting manifest. Caller already
    * deleted the marker and holds the lock.
    *
    * Crash-safety invariant: NOTHING is deleted before the marker is
    * written. A replaced live child is renamed ASIDE (atomic, same
    * volume) into the caller's `.tmp-old-*` dir rather than deleted,
    * and the aside dir is reaped only after the marker commits the new
    * manifest — so a death at ANY instant inside the publish window
    * leaves every byte of one complete generation on disk (old = base
    * remainder ∪ aside, new = base ∪ staging). The old delete-then-
    * move pair had a window (after delete, before move) that stranded
    * a streaming-maintained index's SOLE data copy in staging, where
    * the next build's orphan reap destroyed it (ADVICE r11). Recovery
    * of a marker-less base: corpus-backed artifacts rebuild from the
    * corpus ([[ensure]]); self-maintained ones restore via
    * [[restoreAside]] before their self-heal reads the data dirs. */
  private def publishStaged(base: Path, staging: Path, fp: String,
      aside: Path): Unit = {
    val children = Files.list(staging)
    try children.iterator.asScala.toSeq.foreach { child =>
      val target = base.resolve(child.getFileName)
      moveAside(aside, target)
      Files.move(child, target, StandardCopyOption.ATOMIC_MOVE)
    } finally children.close()
    Files.delete(staging)
    writeMarker(base, fp)
    deleteRecursively(aside)
  }

  /** Rename `target` (if it exists) into the `aside` dir — the
    * delete-free way to clear a rename destination. */
  private def moveAside(aside: Path, target: Path): Unit =
    if (Files.exists(target)) {
      Files.createDirectories(aside)
      Files.move(target, aside.resolve(target.getFileName),
        StandardCopyOption.ATOMIC_MOVE)
    }

  /** Roll a crashed publish BACK: restore every child stranded in
    * `.tmp-old-*` aside dirs over its (possibly already-swapped) base
    * child — INCLUDING the old marker, which the publish renames
    * aside rather than deletes, so after restore the OLD generation
    * is complete AND VALID again (no family-specific re-marking
    * needed; this is what makes the roll-back safe for artifacts
    * whose fingerprint cannot be recomputed from the stored rows).
    * Only meaningful on a marker-less base — a valid marker means the
    * publish completed and any aside remnant is garbage, so this is a
    * no-op then. The marker is restored LAST: a crash mid-restore
    * leaves it in the aside and the retry is idempotent. The NEW
    * generation's partial staging remains an orphan for the next
    * reap. Runs under the base lock. Returns true iff anything was
    * restored. */
  def restoreAside(base: String): Boolean = {
    val basePath = Paths.get(requireLocalRoot(base))
    withLock(basePath) {
      if (validFingerprint(basePath).isDefined) false
      else {
        val l = Files.list(basePath)
        val asides =
          try l.iterator.asScala.toSeq
            .filter(_.getFileName.toString.startsWith(".tmp-old-"))
          finally l.close()
        var restored = false
        asides.foreach { a =>
          val c = Files.list(a)
          val children =
            try c.iterator.asScala.toSeq finally c.close()
          val (marker, data) =
            children.partition(_.getFileName.toString == MarkerName)
          (data ++ marker).foreach { child =>
            val target = basePath.resolve(child.getFileName)
            deleteRecursively(target)
            Files.move(child, target, StandardCopyOption.ATOMIC_MOVE)
            restored = true
          }
          Files.delete(a)
        }
        restored
      }
    }
  }

  /** Lock-free currency check for READ paths ([[graft.io
    * .ValidatedPathCache]]'s fast path): same marker + manifest
    * validation as [[isCurrent]] but without taking the publish lock,
    * so a cached reader is never blocked behind a concurrent
    * rebuild's entire training body — during which the OLD artifact
    * is marked, intact and serving by design. Concurrent renames can
    * only produce a FALSE NEGATIVE (the reader then re-runs its
    * ensure round, which does lock); a torn positive is impossible —
    * the marker swaps atomically and validation demands the on-disk
    * set match its manifest exactly. */
  def isCurrentUnlocked(base: String, fingerprint: String): Boolean = {
    val basePath = Paths.get(requireLocalRoot(base))
    try validFingerprint(basePath).contains(fingerprint)
    catch {
      // a file deleted between the walk and its stat (mid-publish
      // rename sweep) reads as "not current", never as an error
      case _: java.io.IOException | _: java.io.UncheckedIOException =>
        false
    }
  }

  /** The marker itself publishes atomically (write-temp + rename): a
    * reader either sees the complete old marker, no marker, or the
    * complete new one — never a torn line. */
  private def writeMarker(base: Path, fp: String): Unit = {
    val tmp = base.resolve(s".tmp-marker-${java.util.UUID.randomUUID}")
    Files.write(tmp, renderMarker(fp, manifestOf(base)).getBytes(UTF_8))
    Files.move(tmp, base.resolve(MarkerName),
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Is the artifact at `base` fully valid and carrying exactly
    * `fingerprint`? The fast path an incremental consumer checks before
    * deciding whether any build/append work is needed at all. */
  def isCurrent(base: String, fingerprint: String): Boolean =
    currentFingerprint(base).contains(fingerprint)

  /** The fingerprint the artifact currently carries — None when absent,
    * partially published, or failing manifest validation. What a
    * streaming appender reads to chain the next batch's fingerprint
    * onto ([[graft.stream.IndexIngest]]). */
  def currentFingerprint(base: String): Option[String] = {
    val basePath = Paths.get(requireLocalRoot(base))
    withLock(basePath)(validFingerprint(basePath))
  }

  /** The build branch of [[ensure]], caller holds the lock. A full
    * rebuild REPLACES the artifact wholesale: after `build` stages the
    * new file set, any live child the build did not stage (e.g. a
    * streaming sink's `stream_state` high-water mark from a previous
    * fingerprint's life) is deleted before publish — a rebuilt
    * artifact must not inherit state keyed to the corpus it replaced,
    * or a restarted streaming query would silently skip batches up to
    * the stale mark. ([[rewrite]] keeps non-staged children on
    * purpose; only the full rebuild sweeps.) */
  private def lockedBuild(basePath: Path, fingerprint: String)(
      build: String => Unit): Unit = {
    reapStagingOrphans(basePath)
    val staging = basePath.resolve(s".tmp-${java.util.UUID.randomUUID}")
    Files.createDirectories(staging)
    build(staging.toString)
    // the marker comes down only NOW: `build` (often several Spark
    // jobs) ran against a still-valid previous artifact, so a crash
    // inside it leaves that artifact marked, intact and serving — the
    // invalidation window is just the sweep + rename + re-mark below.
    // It is RENAMED into the aside dir, not deleted: together with the
    // asided children it is a complete, re-markable copy of the old
    // generation, so [[restoreAside]] can roll a crashed publish back
    // to a FULLY VALID artifact — marker included — for every family,
    // even those whose fingerprint is not recomputable from the
    // stored rows (BM25/LSH hash the raw doc text, which postings do
    // not carry; review-caught).
    val aside = basePath.resolve(s".tmp-old-${java.util.UUID.randomUUID}")
    moveAside(aside, basePath.resolve(MarkerName))
    val staged = {
      val s = Files.list(staging)
      try s.iterator.asScala.map(_.getFileName.toString).toSet
      finally s.close()
    }
    // the wholesale-replace sweep moves unstaged live children ASIDE
    // (not delete): pre-marker, every old byte must stay recoverable
    val live = Files.list(basePath)
    try live.iterator.asScala.toSeq
      .filter { p =>
        val n = p.getFileName.toString
        n != LockName && !n.startsWith(".tmp-") && !staged.contains(n)
      }
      .foreach(moveAside(aside, _))
    finally live.close()
    publishStaged(basePath, staging, fingerprint, aside)
  }

  /** The append branch of [[mutate]], caller holds the lock and has
    * already validated the expected fingerprint. */
  private def lockedMutate(basePath: Path, newFingerprint: String)(
      append: String => Unit): Unit = {
    Files.delete(basePath.resolve(MarkerName))
    append(basePath.toString)
    writeMarker(basePath, newFingerprint)
  }

  /** Ensure the artifact at `base` is current for `fingerprint`,
    * building it (into a staging dir `build` receives) only when the
    * marker is absent, carries a different fingerprint, or the on-disk
    * file set fails manifest validation. Returns true iff `build` ran —
    * the caller's "training actually happened" signal. Safe against
    * concurrent first-touchers in this JVM and in other processes: the
    * loser of the lock race revalidates under the lock and reuses the
    * winner's artifact. */
  def ensure(base: String, fingerprint: String)(build: String => Unit): Boolean = {
    val basePath = Paths.get(requireLocalRoot(base))
    withLock(basePath) {
      if (validFingerprint(basePath).contains(fingerprint)) false
      else { lockedBuild(basePath, fingerprint)(build); true }
    }
  }

  /** The incremental-artifact state machine shared by the s16 (IVF),
    * s17 (BM25) and d19 (LSH dedup) index updates: already at the
    * union fingerprint → nothing to do (repeat runs and every JVM
    * after the first); at the base fingerprint → append the batch in
    * place; absent/stale/invalid → full build of the base, then the
    * append (bootstrap). Returns (built, appended).
    *
    * The whole state machine runs under ONE lock acquisition, so the
    * post-condition "artifact at `unionFp`" is guaranteed on return
    * even against a concurrent writer — the separate-lock version
    * could observe a valid base between windows, lose the race, and
    * return with the append silently refused. */
  def ensureIncremental(base: String, baseFp: String, unionFp: String)(
      build: String => Unit)(append: String => Unit): (Boolean, Boolean) = {
    val basePath = Paths.get(requireLocalRoot(base))
    withLock(basePath) {
      validFingerprint(basePath) match {
        case Some(`unionFp`) => (false, false)
        case cur =>
          val built =
            if (cur.contains(baseFp)) false
            else { lockedBuild(basePath, baseFp)(build); true }
          lockedMutate(basePath, unionFp)(append)
          (built, true)
      }
    }
  }

  /** Content-preserving LAYOUT rewrite — compaction: a run of
    * incremental appends ([[mutate]], the streaming sink) leaves many
    * small files per partition dir, and at 100 TB the small-file
    * problem eventually dominates scan cost (the reason Lucene merges
    * segments and lakehouse tables run OPTIMIZE). `rewriteFn(live,
    * staging)` reads the current artifact and writes compacted
    * replacement children into the staging dir; only the children it
    * writes are swapped in (others — e.g. the centroids, the stream
    * high-water mark — stay). The fingerprint is REUSED: the rows are
    * identical, only the file layout changed, which is exactly what a
    * row-content fingerprint is insensitive to. Returns false (no-op)
    * when the artifact is absent or invalid. */
  def rewrite(base: String)(rewriteFn: (String, String) => Unit): Boolean = {
    val basePath = Paths.get(requireLocalRoot(base))
    withLock(basePath) {
      validFingerprint(basePath) match {
        case None => false
        case Some(fp) =>
          reapStagingOrphans(basePath)
          val staging = basePath.resolve(s".tmp-${java.util.UUID.randomUUID}")
          Files.createDirectories(staging)
          rewriteFn(base, staging.toString)
          // marker down only after the rewrite body completed: a
          // crash inside a long compaction/retrain leaves the old
          // artifact valid and serving. Renamed aside (not deleted)
          // so a crashed publish rolls back to a fully VALID old
          // generation, marker included ([[restoreAside]]).
          val aside =
            basePath.resolve(s".tmp-old-${java.util.UUID.randomUUID}")
          moveAside(aside, basePath.resolve(MarkerName))
          publishStaged(basePath, staging, fp, aside)
          true
      }
    }
  }

  /** In-place incremental update: when the artifact currently carries
    * `expectFingerprint`, run `append` (which writes into the LIVE base
    * — e.g. Spark append-mode into existing partition dirs), then
    * re-manifest and re-mark as `newFingerprint`. Returns false — and
    * does nothing — when the current artifact is absent, invalid, or
    * carries any other fingerprint: the caller then falls back to a
    * full [[ensure]] build. The marker is deleted before `append`
    * touches anything, so a crash mid-append leaves an unmarked (=
    * rebuild-on-next-touch) artifact, never a marked partial one. */
  def mutate(base: String, expectFingerprint: String, newFingerprint: String)(
      append: String => Unit): Boolean = {
    val basePath = Paths.get(requireLocalRoot(base))
    withLock(basePath) {
      if (!validFingerprint(basePath).contains(expectFingerprint)) false
      else { lockedMutate(basePath, newFingerprint)(append); true }
    }
  }

  /** Retention sweep over the artifact root: empty out every artifact
    * base that is neither `live` nor younger than `ttlMillis` — the
    * nightly GC a long-lived artifact root needs, because [[ensure]]
    * replaces in place under ONE base but bases for dead corpora
    * (regenerated fixtures, removed SF dirs) otherwise accumulate
    * forever. Layout swept is [[artifactPath]]'s two levels:
    * `root/<kind>/<corpus-slug>`; returns the swept base paths.
    *
    * Liveness is decided two ways, both required to fail before a
    * base is swept:
    *
    *  - `live(basePath)` — the mark-and-sweep hook: a deployment
    *    passes a predicate over its CURRENT corpus set (e.g. "the
    *    slug resolves to an existing corpus dir"), and live corpora
    *    are kept regardless of age. This is the primary guard for
    *    read-hot artifacts: probes read parquet directly (no write,
    *    no mtime refresh), so age alone cannot distinguish "serving
    *    daily" from "dead" — only the caller knows which corpora
    *    still exist. The predicate is deliberately a REQUIRED
    *    parameter with no default: a `_ => false` default would let
    *    a bare `gc(ttl)` sweep artifacts of still-existing corpora
    *    while in-JVM path caches keep serving the emptied base until
    *    restart (ADVICE r10) — deletion of unmatched bases must be
    *    an explicit opt-in (`_ => false`) at the call site.
    *  - age: newest data-file mtime older than `ttlMillis` (a TTL
    *    must comfortably exceed any serving JVM's lifetime — a JVM
    *    caches artifact paths per corpus and would not re-validate a
    *    swept base until restart).
    *
    * Deletion happens UNDER THE BASE'S OWN LOCK: a concurrent
    * builder either publishes first (fresh marker → young → kept) or
    * blocks until the sweep releases and then rebuilds from scratch;
    * the marker is deleted first so no racer can ever validate a
    * half-swept base. The lock file, the base dir and its in-JVM
    * monitor are deliberately KEPT — a waiting process holds the old
    * lock-file inode open, and unlinking it would let a third
    * process lock a NEW inode concurrently (two writers inside the
    * critical section); an empty marker-less dir is simply an absent
    * artifact that [[ensure]] rebuilds, and the few bytes of lock
    * remnant are the price of a race-free sweep. */
  def gc(ttlMillis: Long, live: String => Boolean,
      root: String = artifactRoot()): Seq[String] = {
    val rootPath = Paths.get(requireLocalRoot(root))
    if (!Files.isDirectory(rootPath)) return Seq.empty
    val now = System.currentTimeMillis()
    val kinds = Files.list(rootPath)
    val bases =
      try kinds.iterator.asScala.filter(Files.isDirectory(_)).flatMap { kind =>
        val slugs = Files.list(kind)
        try slugs.iterator.asScala.filter(Files.isDirectory(_)).toSeq
        finally slugs.close()
      }.toSeq
      finally kinds.close()
    bases.flatMap { basePath =>
      val removed = !live(basePath.toString) && withLock(basePath) {
        // age = newest data file (the lock file's mtime refreshes on
        // every touch — including this sweep's own — so exclude it)
        val s = Files.walk(basePath)
        val newest =
          try s.iterator.asScala
            .filter(Files.isRegularFile(_))
            .filter(_.getFileName.toString != LockName)
            .map(Files.getLastModifiedTime(_).toMillis)
            .foldLeft(0L)(math.max)
          finally s.close()
        // newest == 0 means no data files at all — an already-swept
        // (or never-populated) base: nothing to delete, and reporting
        // it "removed" on every run would overstate the swept set
        // forever (ADVICE r10). The lock-only husk is left in place.
        if (newest == 0L || now - newest <= ttlMillis) false
        else {
          // marker first: a racer that somehow bypassed the lock can
          // never validate a base this sweep is mid-deleting
          Files.deleteIfExists(basePath.resolve(MarkerName))
          val children = Files.list(basePath)
          try children.iterator.asScala.toSeq
            .filter(_.getFileName.toString != LockName)
            .foreach(deleteRecursively)
          finally children.close()
          true
        }
      }
      if (removed) Some(basePath.toString) else None
    }
  }

  /** Canonical fingerprint rendering shared by every artifact family:
    * `<row count>_<unsigned xor of row hashes>`. One format across
    * modules is an artifact-compatibility contract — the streaming
    * sinks parse it back ([[graft.stream.IndexIngest]]) to chain a
    * batch's parts onto the stored value. */
  def fingerprint(n: Long, x: Long): String =
    s"${n}_${java.lang.Long.toUnsignedString(x)}"
}
