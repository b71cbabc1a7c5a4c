package graft.io

import java.io.RandomAccessFile
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator
import scala.jdk.CollectionConverters._

/** The filesystem primitives [[ArtifactStore]]'s publish protocol is
  * written against — ONE protocol core (lock → stage → aside-rename →
  * marker-last), two bindings:
  *
  *  - [[PosixFs]]: java.nio + advisory `FileChannel` locks + atomic
  *    same-volume rename. The local default; what every bare or
  *    `file:`-scheme base resolves to.
  *  - [[HadoopFs]]: `org.apache.hadoop.fs.FileSystem` — HDFS-class
  *    stores, where the data actually lives at 100 TB. HDFS rename is
  *    an atomic namenode metadata operation, so the staged publish
  *    carries over unchanged; the cross-process mutex (advisory file
  *    locks do not exist there) becomes an exclusive-create lock file
  *    with stale-expiry — the standard HDFS mutex (create with
  *    `overwrite = false` is atomic against the namenode).
  *
  * NOT a binding for eventual-rename object stores: on S3 proper,
  * "rename" is copy+delete — non-atomic and O(data). The S3 variant
  * of this protocol keeps data files immutable-once-written under
  * unique names (which the staged layout already guarantees) and
  * replaces the marker rename with a CONDITIONAL PUT on the marker
  * object (`If-None-Match`/ETag compare-and-swap, the primitive Delta
  * and Iceberg commit services use); the lock file is then redundant
  * — the marker CAS is the mutex. That is a third [[ArtifactFs]]
  * binding (the two atomicity contracts below move onto the marker
  * object alone), not a config value on this one.
  *
  * The operations are deliberately few and strongly specified: every
  * crash-safety argument in [[ArtifactStore]] reduces to the two
  * atomicity contracts here — [[ArtifactFs.rename]] (all-or-nothing
  * move, destination absent) and [[ArtifactFs.writeAtomic]] (readers
  * see the whole old file, absence, or the whole new file). A binding
  * that cannot honor them cannot host the store.
  */
private[graft] trait ArtifactFs {
  /** Join with the backend's separator. */
  def join(p: String, child: String): String
  def mkdirs(p: String): Unit
  def exists(p: String): Boolean
  def isFile(p: String): Boolean
  def isDir(p: String): Boolean
  /** Immediate child NAMES of a directory (empty when absent). */
  def childNames(p: String): Seq[String]
  /** Every regular file under `p`, recursively:
    * `(relpath-with-'/', size, mtimeMillis)`. Empty when absent. */
  def filesUnder(p: String): Seq[(String, Long, Long)]
  def read(p: String): String
  /** Publish a small file atomically: a reader sees the whole old
    * content, absence, or the whole new content — never a torn line.
    * The destination must be absent (the protocol clears it first). */
  def writeAtomic(p: String, body: String): Unit
  /** Atomic rename; `dst` must not exist. (Checked: Hadoop's rename
    * into an existing directory would silently nest src INSIDE dst.) */
  def rename(src: String, dst: String): Unit
  /** [[writeAtomic]] over a destination that MAY exist — the replace
    * swap the streaming replay mark (`stream_state`) and the
    * generation pointer (`CURRENT`) live on: a reader sees the whole
    * old content or the whole new content, never a torn or truncated
    * file. */
  def writeAtomicReplace(p: String, body: String): Unit
  /** Whether [[writeAtomicReplace]] is genuinely atomic on this
    * binding (vs the documented delete+rename fallback with its
    * absence window). Callers for whom absence is UNRECOVERABLE — the
    * generation pointer, whose loss regresses a pair to g0 and lets
    * the retention sweep destroy the newest generation — must check
    * this and fail loudly rather than degrade (review-caught). */
  def replaceIsAtomic: Boolean = true
  /** Recursive delete; no-op when absent. */
  def delete(p: String): Unit
  /** Cross-process + cross-thread mutex on an artifact base. */
  def lock[A](base: String)(body: => A): A

  /** Last path segment. */
  final def nameOf(p: String): String =
    p.substring(p.stripSuffix("/").lastIndexOf('/') + 1)
}

/** java.nio binding — local POSIX filesystems. Mutual exclusion is a
  * per-JVM monitor (file locks are held per-JVM; a second thread
  * would hit `OverlappingFileLockException`) around an advisory
  * `FileChannel` lock on `base/.lock` (cross-process). */
private[graft] object PosixFs extends ArtifactFs {
  private val LockName = ".lock"

  /** Monitors keyed by canonical base path: threads of this JVM
    * serialize here before taking the cross-process file lock. */
  private val monitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def path(p: String): Path = Paths.get(p)

  def join(p: String, child: String): String =
    path(p).resolve(child).toString
  def mkdirs(p: String): Unit = { Files.createDirectories(path(p)); () }
  def exists(p: String): Boolean = Files.exists(path(p))
  def isFile(p: String): Boolean = Files.isRegularFile(path(p))
  def isDir(p: String): Boolean = Files.isDirectory(path(p))

  def childNames(p: String): Seq[String] =
    if (!isDir(p)) Seq.empty
    else {
      val s = Files.list(path(p))
      try s.iterator.asScala.map(_.getFileName.toString).toSeq
      finally s.close()
    }

  def filesUnder(p: String): Seq[(String, Long, Long)] = {
    val base = path(p)
    if (!Files.exists(base)) Seq.empty
    else {
      val s = Files.walk(base)
      try s.iterator.asScala
        .filter(Files.isRegularFile(_))
        .map(f => (base.relativize(f).toString, Files.size(f),
          Files.getLastModifiedTime(f).toMillis))
        .toSeq
      finally s.close()
    }
  }

  def read(p: String): String =
    new String(Files.readAllBytes(path(p)), UTF_8)

  def writeAtomic(p: String, body: String): Unit = {
    val target = path(p)
    val tmp = target.resolveSibling(
      s".tmp-marker-${java.util.UUID.randomUUID}")
    Files.write(tmp, body.getBytes(UTF_8))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
  }

  def writeAtomicReplace(p: String, body: String): Unit = {
    val target = path(p)
    val tmp = target.resolveSibling(
      s".tmp-marker-${java.util.UUID.randomUUID}")
    Files.write(tmp, body.getBytes(UTF_8))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def rename(src: String, dst: String): Unit = {
    Files.move(path(src), path(dst), StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  def delete(p: String): Unit = {
    val t = path(p)
    if (Files.exists(t)) {
      val s = Files.walk(t)
      try s.sorted(Comparator.reverseOrder[Path]())
        .iterator.asScala.foreach(Files.delete)
      finally s.close()
    }
  }

  def lock[A](base: String)(body: => A): A = {
    mkdirs(base)
    val monitor = monitors.computeIfAbsent(
      path(base).toAbsolutePath.normalize.toString, _ => new Object)
    monitor.synchronized {
      val raf = new RandomAccessFile(
        path(base).resolve(LockName).toFile, "rw")
      try {
        val lock = raf.getChannel.lock() // blocks on a concurrent process
        try body finally lock.release()
      } finally raf.close()
    }
  }
}

/** `org.apache.hadoop.fs.FileSystem` binding — HDFS-class stores with
  * atomic rename. The mutex is an exclusive-create lock file
  * (`base/.lock`, created `overwrite = false` — atomic at the
  * namenode) polled with backoff; a lock older than [[HadoopFs.LockStaleMs]]
  * is presumed abandoned by a dead process and broken (advisory
  * `FileChannel` locks, which the kernel releases on process death,
  * do not exist here — expiry is the standard HDFS substitute, with
  * the usual caveat that a build longer than the TTL must renew or
  * raise it). In-JVM threads serialize on a per-(fs, base) monitor
  * first, exactly like [[PosixFs]].
  *
  * Paths are backend-native URI strings (`hdfs://nn/...`); callers
  * reach this binding by registering a configured FileSystem for
  * their scheme ([[ArtifactStore.registerHadoopFs]]) — resolution of
  * core-site.xml, kerberos, etc. stays with the caller, where it
  * belongs. */
private[graft] final class HadoopFs(
    fs: org.apache.hadoop.fs.FileSystem) extends ArtifactFs {
  import org.apache.hadoop.fs.{Path => HPath}

  private val LockName = ".lock"

  private def hp(p: String) = new HPath(p)

  private val monitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def join(p: String, child: String): String =
    if (p.endsWith("/")) p + child else s"$p/$child"
  def mkdirs(p: String): Unit = { fs.mkdirs(hp(p)); () }
  def exists(p: String): Boolean = fs.exists(hp(p))
  def isFile(p: String): Boolean =
    try fs.getFileStatus(hp(p)).isFile
    catch { case _: java.io.FileNotFoundException => false }
  def isDir(p: String): Boolean =
    try fs.getFileStatus(hp(p)).isDirectory
    catch { case _: java.io.FileNotFoundException => false }

  def childNames(p: String): Seq[String] =
    if (!isDir(p)) Seq.empty
    else fs.listStatus(hp(p)).toSeq.map(_.getPath.getName)

  def filesUnder(p: String): Seq[(String, Long, Long)] =
    if (!exists(p)) Seq.empty
    else {
      // recursive listStatus, NOT fs.listFiles: listFiles wraps every
      // entry in a LocatedFileStatus whose constructor loads POSIX
      // permissions eagerly — a path some FileSystem impls resolve
      // through `new java.io.File(uri)`, which rejects non-`file`
      // schemes. Plain FileStatus carries everything the manifest
      // needs (path, length, mtime) without that machinery.
      val baseUriPath = fs.makeQualified(hp(p)).toUri.getPath
        .stripSuffix("/")
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[(String, Long, Long)]
      def walk(d: HPath): Unit = fs.listStatus(d).foreach { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.isFile) {
          val full = st.getPath.toUri.getPath
          val rel = full.stripPrefix(baseUriPath).stripPrefix("/")
          buf += ((rel, st.getLen, st.getModificationTime))
        }
      }
      walk(hp(p))
      buf.toSeq
    }

  def read(p: String): String = {
    val in = fs.open(hp(p))
    try new String(in.readAllBytes(), UTF_8) finally in.close()
  }

  def writeAtomic(p: String, body: String): Unit = {
    val parent = p.substring(0, p.stripSuffix("/").lastIndexOf('/'))
    val tmp = join(parent, s".tmp-marker-${java.util.UUID.randomUUID}")
    val out = fs.create(hp(tmp), false)
    try out.write(body.getBytes(UTF_8)) finally out.close()
    rename(tmp, p)
  }

  def rename(src: String, dst: String): Unit = {
    require(!fs.exists(hp(dst)),
      s"rename destination exists: $dst (Hadoop rename would nest " +
        "the source inside it)")
    require(fs.rename(hp(src), hp(dst)), s"rename failed: $src -> $dst")
  }

  def delete(p: String): Unit = { fs.delete(hp(p), true); () }

  /** Replace via `FileContext.rename(OVERWRITE)` — an atomic namenode
    * op on HDFS, so a reader sees whole-old or whole-new, never a
    * torn file or an absence window. Schemes without an
    * `AbstractFileSystem` binding (no FileContext) fall back to
    * delete + rename, which opens a crash window where the file is
    * ABSENT: acceptable for `stream_state` (every write happens
    * inside a marker-down mutate window, so a crash there reads as an
    * invalid artifact and heals), NOT acceptable for a generation
    * pointer — a deployment swapping pointers on such a scheme must
    * bind an AbstractFileSystem (HDFS ships one; so does the test
    * binding). */
  def writeAtomicReplace(p: String, body: String): Unit = {
    val parent = p.substring(0, p.stripSuffix("/").lastIndexOf('/'))
    val tmp = join(parent, s".tmp-marker-${java.util.UUID.randomUUID}")
    val out = fs.create(hp(tmp), false)
    try out.write(body.getBytes(UTF_8)) finally out.close()
    fileContext match {
      case Some(fc) =>
        fc.rename(hp(tmp), hp(p),
          org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      case None =>
        fs.delete(hp(p), false)
        require(fs.rename(hp(tmp), hp(p)), s"rename failed: $tmp -> $p")
    }
  }

  private lazy val fileContext: Option[org.apache.hadoop.fs.FileContext] =
    try Some(org.apache.hadoop.fs.FileContext.getFileContext(
      fs.getUri, fs.getConf))
    catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException => None
    }

  override def replaceIsAtomic: Boolean = fileContext.isDefined

  /** The lock file's current content (the holder's owner token), or
    * None when absent/unreadable. */
  private def lockOwner(lockPath: String): Option[String] =
    try Some(read(lockPath)) catch { case _: java.io.IOException => None }

  /** Owner-token mutex. `create(overwrite = false)` alone is NOT a
    * sufficient mutex on every FileSystem: HDFS makes it atomic at
    * the namenode, but check-then-create implementations (Hadoop's
    * own RawLocalFileSystem; some object-store adapters) let a
    * stampede of contenders all "win" the create — the stress spec
    * measured 16 overlapping critical sections out of 24 acquisitions
    * before this design. So acquisition is create + WRITE OWN TOKEN +
    * settle + READ-BACK: racing creates all write the same file, the
    * LAST write survives, and exactly the racer whose token survives
    * proceeds — everyone else backs off without touching the file
    * (it is now someone else's mutex). The settle pause bounds the
    * read-back race (both racers self-confirming requires one's
    * entire create+write to land inside the other's settle window
    * AFTER its read-back — an exists-check-to-write gap longer than
    * the settle, i.e. a deschedule mid-syscall); on atomic-create
    * filesystems the read-back trivially confirms.
    *
    * Stale break (dead holder — live holders renew, see below): an
    * atomic RENAME, then an IDENTITY CHECK on the renamed inode's
    * token, then the delete — never a bare delete (two waiters
    * deciding "stale" from one pre-break stat would each delete the
    * OTHER's fresh lock), and never a bare rename (a path-based
    * rename can steal a fresh lock created between the stat and the
    * rename; review-caught twice). A stolen fresh lock is renamed
    * BACK; the residual window is detected by the displaced holder's
    * heartbeat, and the marker/manifest validation turns any torn
    * double-publish into a rebuild, never a silently served partial
    * artifact. */
  def lock[A](base: String)(body: => A): A = {
    mkdirs(base)
    val monitor = monitors.computeIfAbsent(base, _ => new Object)
    val lockPath = join(base, LockName)
    val token = s"${java.util.UUID.randomUUID}"
    monitor.synchronized {
      var held = false
      var absentFailures = 0
      while (!held) {
        val created =
          try {
            val out = fs.create(hp(lockPath), false)
            try out.write(token.getBytes(UTF_8)) finally out.close()
            true
          } catch {
            case e: java.io.IOException =>
              if (!fs.exists(hp(lockPath))) {
                // the holder may have released BETWEEN our failed
                // create and this probe — benign contention, retry; a
                // create that keeps failing with NO lock present is a
                // real error (permissions, connectivity) and must
                // surface, not spin (review-caught)
                absentFailures += 1
                if (absentFailures >= 3) throw e
              } else {
                absentFailures = 0
                val observed = lockOwner(lockPath)
                val st =
                  try Some(fs.getFileStatus(hp(lockPath)))
                  catch { case _: java.io.FileNotFoundException => None }
                st.foreach { s =>
                  if (System.currentTimeMillis() - s.getModificationTime
                      > HadoopFs.LockStaleMs) {
                    val broken = join(base,
                      s".tmp-broken-lock-${java.util.UUID.randomUUID}")
                    try {
                      if (fs.rename(hp(lockPath), hp(broken))) {
                        if (lockOwner(broken) == observed)
                          fs.delete(hp(broken), false) // the stale inode
                        else if (!fs.rename(hp(broken), hp(lockPath)))
                          fs.delete(hp(broken), false) // displaced holder
                            // reclaims via its heartbeat; see below
                      }
                    } catch { case _: java.io.IOException => () }
                  }
                }
              }
              false
          }
        if (created) {
          Thread.sleep(HadoopFs.LockSettleMs)
          held = lockOwner(lockPath).contains(token)
        }
        if (!held) Thread.sleep(50)
      }
      // heartbeat: a LIVE holder renews the lock's mtime well inside
      // the stale TTL, so builds of any length (Spark training jobs)
      // are never broken by a waiter — expiry only ever fires on a
      // dead holder's lock (review-caught: the TTL alone capped every
      // build at LockStaleMs). The beat is also the holder's
      // LOSS-OF-LOCK detector: a vanished or foreign-owned lock file
      // (displaced by the break race above, or an operator delete) is
      // reclaimed where possible and ALWAYS logged loudly — silence
      // here would let renewal no-op forever while waiters break in
      // (review-caught, second pass).
      val renewer = HadoopFs.renewPool.scheduleAtFixedRate(
        () => try {
          lockOwner(lockPath) match {
            case Some(`token`) =>
              fs.setTimes(hp(lockPath), System.currentTimeMillis(), -1)
            case Some(other) =>
              System.err.println(s"[graft] lock $lockPath is now owned " +
                s"by $other while this process believed it held it — " +
                "two writers may have raced; the marker/manifest " +
                "validation will catch a torn publish")
            case None =>
              System.err.println(s"[graft] lock file $lockPath vanished " +
                "while held — reclaiming (a waiter's stale-break race, " +
                "or an operator delete)")
              try {
                val out = fs.create(hp(lockPath), false)
                try out.write(token.getBytes(UTF_8)) finally out.close()
              } catch { case _: java.io.IOException => () }
          }
        } catch {
          case e: java.io.IOException =>
            System.err.println(s"[graft] lock renewal failed for " +
              s"$lockPath: $e — a waiter may judge this lock stale " +
              s"after ${HadoopFs.LockStaleMs} ms")
        },
        HadoopFs.LockStaleMs / 3, HadoopFs.LockStaleMs / 3,
        java.util.concurrent.TimeUnit.MILLISECONDS)
      try body finally {
        renewer.cancel(false)
        // release only OUR lock: after a displacement the file at this
        // path is someone else's mutex
        if (lockOwner(lockPath).contains(token))
          fs.delete(hp(lockPath), false)
      }
    }
  }
}

private[graft] object HadoopFs {
  /** A lock file whose mtime is older than this is presumed held by a
    * DEAD process and broken (via atomic rename — see `lock`). Live
    * holders renew their lock's mtime every third of this period, so
    * the TTL bounds only crash-recovery latency, never build length.
    * Volatile test hook: the renew-beats-expiry property is only
    * observable with a TTL a spec can wait out. */
  @volatile private[graft] var LockStaleMs: Long = 15L * 60 * 1000

  /** The acquisition settle pause before the owner-token read-back —
    * the window a weak-create racer's overwrite must land in to be
    * detected (see `lock`). Paid once per acquisition. */
  val LockSettleMs: Long = 30L

  /** Shared daemon scheduler for lock-mtime renewal heartbeats.
    * FOUR threads, not one: a single hung `setTimes` RPC (Hadoop
    * client retries can block for minutes with no timeout) must not
    * head-of-line-block every OTHER held lock's renewal in the JVM
    * past the stale TTL (review-caught, second pass). A JVM holding
    * more than four concurrently-hung locks has bigger problems than
    * renewal. */
  private[io] val renewPool = {
    val p = new java.util.concurrent.ScheduledThreadPoolExecutor(4,
      (r: Runnable) => {
        val t = new Thread(r, "graft-hadoop-lock-renewer")
        t.setDaemon(true)
        t
      })
    p.setRemoveOnCancelPolicy(true)
    p
  }
}
