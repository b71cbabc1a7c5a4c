package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.io.ArtifactStore

/** A RawLocalFileSystem under a non-`file` scheme: the standard Hadoop
  * trick for exercising `org.apache.hadoop.fs.FileSystem` semantics
  * against local disk — `checkPath` validates against `getUri`, so
  * overriding it makes `graftfs:` paths first-class while every
  * operation runs through the real Hadoop FileSystem API surface
  * (create-no-overwrite, rename-returns-boolean, listFiles, ...). */
class GraftTestHadoopFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
}

/** ONE registration for every suite that touches the test scheme:
  * suites run in parallel in one JVM, and two `registerHadoopFs`
  * calls with DIFFERENT configurations would race — the last writer
  * wins, and a suite registered without the AbstractFileSystem
  * binding would silently flip writeAtomicReplace onto its fallback
  * mid-run for the other suite (review-caught). The single shared
  * instance carries the full configuration. */
object GraftTestFs {
  val Scheme = "graftfs"
  lazy val registered: Unit = {
    val conf = new org.apache.hadoop.conf.Configuration()
    conf.set(s"fs.AbstractFileSystem.$Scheme.impl",
      classOf[GraftTestAbstractFs].getName)
    val fs = new GraftTestHadoopFs()
    fs.initialize(java.net.URI.create(s"$Scheme:///"), conf)
    graft.io.ArtifactStore.registerHadoopFs(Scheme, fs)
  }
}

/** The SAME publish protocol ([[graft.io.ArtifactStore]]) driven
  * through the [[graft.io.HadoopFs]] binding — the deployment posture
  * where the index artifacts live next to the data on HDFS. The
  * protocol core is shared (one body, two [[graft.io.ArtifactFs]]
  * bindings), so these tests pin exactly what the binding swap could
  * break: the exclusive-create lock discipline, rename-based publish,
  * aside roll-back, manifest validation and the mutate append window
  * — the crash-at-any-instant guarantees ArtifactStoreSpec proves on
  * POSIX, re-proven through Hadoop's FileSystem API. */
class HadoopArtifactStoreSpec extends AnyFunSuite {

  private val Scheme = GraftTestFs.Scheme

  private def registered: Unit = GraftTestFs.registered

  /** A fresh base as a `graftfs:`-scheme URI; `local()` is the same
    * location as a plain path for direct on-disk assertions. */
  private def freshBase(): String = {
    registered
    Scheme + ":" + Files.createTempDirectory("graft-hfs-spec")
      .resolve("artifact").toString
  }

  private def local(base: String): String = base.stripPrefix(Scheme + ":")

  private def writeData(dir: String, name: String, body: String): Unit = {
    val p = Paths.get(local(dir), "data", name)
    Files.createDirectories(p.getParent)
    Files.write(p, body.getBytes(UTF_8))
  }

  private def readData(base: String, name: String): String =
    new String(
      Files.readAllBytes(Paths.get(local(base), "data", name)), UTF_8)

  test("unregistered remote schemes still fail loudly; registered ones publish") {
    intercept[IllegalArgumentException](
      ArtifactStore.currentFingerprint("hdfs://nn:9000/graft/x"))
    val base = freshBase()
    assert(ArtifactStore.ensure(base, "fp-1")(writeData(_, "part-0", "x")))
    assert(ArtifactStore.isCurrent(base, "fp-1"))
    assert(readData(base, "part-0") == "x")
    // reuse without rebuild; the exclusive-create lock was released
    assert(!ArtifactStore.ensure(base, "fp-1")(_ => fail("must reuse")))
    assert(!Files.exists(Paths.get(local(base), ".lock")),
      "the HDFS-style lock file must be deleted on release")
  }

  test("racing first-touchers through the Hadoop binding: one build wins") {
    val base = freshBase()
    val builds = new AtomicInteger
    val entered = new CountDownLatch(2)
    val pool = Executors.newFixedThreadPool(2)
    val results = (1 to 2).map { _ =>
      pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String = {
          entered.countDown()
          entered.await()
          ArtifactStore.ensure(base, "fp-1") { staging =>
            builds.incrementAndGet()
            Thread.sleep(100)
            writeData(staging, "part-0", "alpha")
            writeData(staging, "part-1", "beta")
          }
          readData(base, "part-0") + readData(base, "part-1")
        }
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(30, TimeUnit.SECONDS))
    assert(builds.get() == 1, s"racers built ${builds.get()} times (want 1)")
    assert(results.map(_.get()).toSet == Set("alphabeta"))
  }

  test("the lock blocks while held and a stale abandoned lock is broken") {
    val base = freshBase()
    ArtifactStore.ensure(base, "fp-1")(writeData(_, "part-0", "v1"))
    // a FRESH foreign lock file (a live holder) blocks the next touch
    val lockFile = Paths.get(local(base), ".lock")
    Files.write(lockFile, Array.emptyByteArray)
    val done = new CountDownLatch(1)
    val t = new Thread(() => {
      ArtifactStore.currentFingerprint(base); done.countDown()
    })
    t.start()
    assert(!done.await(400, TimeUnit.MILLISECONDS),
      "a live lock file must block the protocol")
    Files.delete(lockFile) // the holder releases
    assert(done.await(30, TimeUnit.SECONDS), "release must unblock")
    t.join()
    // an ABANDONED lock (older than the stale TTL — a dead process)
    // must be broken instead of deadlocking the base forever
    Files.write(lockFile, Array.emptyByteArray)
    Files.setLastModifiedTime(lockFile,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - graft.io.HadoopFs.LockStaleMs - 60_000))
    assert(ArtifactStore.currentFingerprint(base).contains("fp-1"),
      "a stale lock must be broken, not waited on forever")
  }

  test("a LIVE holder's lock is renewed past the stale TTL, never broken") {
    // two HadoopFs instances = two processes (separate in-JVM monitor
    // maps), one underlying store. A holds the lock across 4× the TTL;
    // its heartbeat (TTL/3) must keep the mtime fresh so B's waiter
    // loop never judges it stale — the review-caught failure mode was
    // every build longer than the TTL having its lock broken and a
    // second writer entering the critical section.
    registered
    def newFs(): graft.io.HadoopFs = {
      val fs = new GraftTestHadoopFs()
      fs.initialize(java.net.URI.create(s"$Scheme:///"),
        new org.apache.hadoop.conf.Configuration())
      new graft.io.HadoopFs(fs)
    }
    val base = Scheme + ":" + java.nio.file.Files
      .createTempDirectory("graft-hfs-renew").resolve("artifact").toString
    val prevTtl = graft.io.HadoopFs.LockStaleMs
    graft.io.HadoopFs.LockStaleMs = 900L
    try {
      val inCritical = new java.util.concurrent.atomic.AtomicInteger
      val overlaps = new java.util.concurrent.atomic.AtomicInteger
      val pool = Executors.newFixedThreadPool(2)
      def contend(fs: graft.io.HadoopFs, holdMs: Long) =
        pool.submit(new Runnable {
          def run(): Unit = fs.lock(base) {
            if (inCritical.incrementAndGet() > 1) overlaps.incrementAndGet()
            Thread.sleep(holdMs)
            inCritical.decrementAndGet()
          }
        })
      val a = contend(newFs(), 3600L) // 4× the TTL
      Thread.sleep(300)               // A is inside before B starts
      val b = contend(newFs(), 100L)
      pool.shutdown()
      assert(pool.awaitTermination(60, TimeUnit.SECONDS))
      a.get(); b.get()
      assert(overlaps.get() == 0,
        "a waiter broke a LIVE holder's lock — the heartbeat failed")
    } finally graft.io.HadoopFs.LockStaleMs = prevTtl
  }

  test("lock stress: N simulated processes, tiny TTL, mutual exclusion holds") {
    // eight contenders through eight independent FileSystem handles
    // (separate monitor maps = separate processes), each repeatedly
    // taking the lock for longer than the TTL — so every acquisition
    // rides the renewal heartbeat AND every waiter's loop runs the
    // stale-judgment + identity-checked break path continuously. The
    // invariant under all that churn: never two holders at once.
    registered
    def newFs(): graft.io.HadoopFs = {
      val fs = new GraftTestHadoopFs()
      fs.initialize(java.net.URI.create(s"$Scheme:///"),
        new org.apache.hadoop.conf.Configuration())
      new graft.io.HadoopFs(fs)
    }
    val base = Scheme + ":" + Files
      .createTempDirectory("graft-hfs-stress").resolve("artifact").toString
    val prevTtl = graft.io.HadoopFs.LockStaleMs
    graft.io.HadoopFs.LockStaleMs = 300L // every hold outlives the TTL
    try {
      val inCritical = new AtomicInteger
      val overlaps = new AtomicInteger
      val acquisitions = new AtomicInteger
      val pool = Executors.newFixedThreadPool(8)
      val tasks = (1 to 8).map { i =>
        pool.submit(new Runnable {
          def run(): Unit = {
            val fs = newFs()
            (1 to 3).foreach { _ =>
              fs.lock(base) {
                acquisitions.incrementAndGet()
                if (inCritical.incrementAndGet() > 1)
                  overlaps.incrementAndGet()
                Thread.sleep(450L) // 1.5× the TTL inside the lock
                inCritical.decrementAndGet()
              }
            }
          }
        })
      }
      pool.shutdown()
      assert(pool.awaitTermination(120, TimeUnit.SECONDS),
        "stress run wedged — a lock was lost without recovery")
      tasks.foreach(_.get())
      assert(acquisitions.get() == 24, "every contender completed")
      assert(overlaps.get() == 0,
        s"${overlaps.get()} overlapping critical sections — mutual " +
          "exclusion broke under stale-TTL churn")
    } finally graft.io.HadoopFs.LockStaleMs = prevTtl
  }

  test("manifest validation catches pruned and extra files through Hadoop reads") {
    val base = freshBase()
    def build(tag: String)(staging: String): Unit = {
      writeData(staging, "part-0", s"$tag-0")
      writeData(staging, "part-1", s"$tag-1")
    }
    assert(ArtifactStore.ensure(base, "fp-1")(build("v1")))
    assert(!ArtifactStore.ensure(base, "fp-1")(build("BUG")))
    Files.delete(Paths.get(local(base), "data", "part-1"))
    assert(ArtifactStore.ensure(base, "fp-1")(build("v2")), "pruned → rebuild")
    writeData(base, "part-stray", "stray")
    assert(ArtifactStore.ensure(base, "fp-1")(build("v3")), "extra → rebuild")
    assert(!Files.exists(Paths.get(local(base), "data", "part-stray")))
  }

  test("a crashed rebuild/rewrite leaves the previous artifact valid; publish crash rolls back") {
    val base = freshBase()
    assert(ArtifactStore.ensure(base, "fp-old")(writeData(_, "part-0", "v1")))
    intercept[RuntimeException] {
      ArtifactStore.ensure(base, "fp-new") { staging =>
        writeData(staging, "part-0", "half")
        throw new RuntimeException("executor lost mid-build")
      }
    }
    assert(ArtifactStore.isCurrent(base, "fp-old"),
      "old artifact must survive a crashed rebuild")
    assert(readData(base, "part-0") == "v1")
    intercept[RuntimeException] {
      ArtifactStore.rewrite(base) { (_, staging) =>
        writeData(staging, "part-0", "compacted")
        throw new RuntimeException("executor lost mid-rewrite")
      }
    }
    assert(ArtifactStore.isCurrent(base, "fp-old") &&
      readData(base, "part-0") == "v1")

    // crash INSIDE the publish window: marker + old child stranded in
    // the aside dir, staging not yet moved in — restoreAside must
    // bring back a complete, VALID old generation (marker included)
    val basePath = Paths.get(local(base))
    val aside = basePath.resolve(".tmp-old-crash1")
    Files.createDirectories(aside)
    Files.move(basePath.resolve("_FINGERPRINT"),
      aside.resolve("_FINGERPRINT"))
    Files.move(basePath.resolve("data"), aside.resolve("data"))
    writeData((Scheme + ":" + basePath.resolve(".tmp-crash1")).toString,
      "part-0", "v2-unpublished")
    assert(ArtifactStore.currentFingerprint(base).isEmpty)
    assert(ArtifactStore.restoreAside(base), "restore must report work")
    assert(readData(base, "part-0") == "v1")
    assert(ArtifactStore.isCurrent(base, "fp-old"),
      "roll-back must restore validity, marker included")
    assert(!Files.exists(aside), "consumed aside dirs are removed")
    // a successful retry reaps the orphan staging
    assert(ArtifactStore.ensure(base, "fp-new")(writeData(_, "part-0", "v2")))
    assert(readData(base, "part-0") == "v2")
    val strays = Files.list(basePath).iterator()
    var tmpDirs = 0
    while (strays.hasNext)
      if (strays.next().getFileName.toString.startsWith(".tmp-")) tmpDirs += 1
    assert(tmpDirs == 0, "crashed staging dirs must be reaped on retry")
  }

  test("mutate appends over the exact fingerprint; a crashed append unmarks") {
    val base = freshBase()
    ArtifactStore.ensure(base, "fp-A")(writeData(_, "cell=0/part-0", "a0"))
    assert(!ArtifactStore.mutate(base, "fp-STALE", "fp-B")(_ =>
      fail("append must not run over a mismatched fingerprint")))
    assert(ArtifactStore.mutate(base, "fp-A", "fp-AB") { live =>
      writeData(live, "cell=1/part-0", "b0")
    })
    assert(readData(base, "cell=0/part-0") == "a0")
    assert(readData(base, "cell=1/part-0") == "b0")
    assert(!ArtifactStore.ensure(base, "fp-AB")(_ => fail("must reuse")))
    intercept[RuntimeException] {
      ArtifactStore.mutate(base, "fp-AB", "fp-ABC") { live =>
        writeData(live, "cell=2/part-0", "half")
        throw new RuntimeException("append died")
      }
    }
    assert(!Files.exists(Paths.get(local(base), "_FINGERPRINT")),
      "a crashed append must leave the artifact unmarked")
    assert(ArtifactStore.ensure(base, "fp-ABC")(
      writeData(_, "cell=0/part-0", "rebuilt")))
  }

  test("ensureIncremental and gc run through the Hadoop binding") {
    val root = Scheme + ":" +
      Files.createTempDirectory("graft-hfs-gc").toString
    val base = root + "/ivf-index/corpus_a"
    assert(ArtifactStore.ensureIncremental(base, "fp-A", "fp-AB")(
      writeData(_, "base-0", "A"))(writeData(_, "batch-0", "B"))
      == ((true, true)))
    assert(ArtifactStore.isCurrent(base, "fp-AB"))
    assert(ArtifactStore.ensureIncremental(base, "fp-A", "fp-AB")(
      _ => fail("no build"))(_ => fail("no append")) == ((false, false)))
    // age it out and sweep through the graftfs: root view
    val oldTime = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 10_000_000L)
    val walk = Files.walk(Paths.get(local(base)))
    try walk.iterator().forEachRemaining(p =>
      Files.setLastModifiedTime(p, oldTime))
    finally walk.close()
    val removed = ArtifactStore.gc(ttlMillis = 1_000_000L,
      live = _ => false, root = root)
    assert(removed == Seq(base), s"gc removed $removed")
    assert(ArtifactStore.currentFingerprint(base).isEmpty)
    assert(ArtifactStore.ensure(base, "fp-new")(
      writeData(_, "base-0", "new")))
    assert(readData(base, "base-0") == "new")
  }
}
