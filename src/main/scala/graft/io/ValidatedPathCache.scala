package graft.io

/** Per-JVM memo of a VALIDATED artifact resolution.
  *
  * The serving paths memoize "corpus dir → artifact base" so repeat
  * queries skip the ensure round (corpus fingerprint scan + lock).
  * A bare path memo goes stale the moment ANOTHER process moves the
  * artifact under it — a gate retrain, a nightly append, a gc sweep:
  * the first-touch JVM would keep serving the old generation's path
  * with no signal until restart (VERDICT r11 #3, the documented
  * "first-touch-per-JVM staleness").
  *
  * This cache therefore stores the `(base, fingerprint)` pair AS
  * VALIDATED and re-checks the marker on every read
  * ([[ArtifactStore.isCurrentUnlocked]] — a LOCK-FREE manifest walk,
  * file ops only, no Spark job, no corpus scan: taking the publish
  * lock here would block every cached reader behind a concurrent
  * rebuild's whole training body, during which the old artifact is
  * valid and serving by design; a racing rename can only produce a
  * false negative, which falls through to the locking refresh). A
  * mismatch drops the entry and re-runs the caller's `refresh` (its
  * normal ensure round), which revalidates against — or rebuilds
  * to — the current corpus. The fast path costs one stat per
  * manifest file per QUERY (not per row) — O(part files), so a
  * heavily-fragmented streamed artifact pays more until compaction,
  * still driver-side milliseconds; the slow path runs exactly when
  * the artifact actually moved.
  *
  * `A` is the resolution the call site returns (a base path, or a
  * pair of them); `basesOf` lists the artifact bases it stands for —
  * every one must still carry the fingerprint it had when cached. */
final class ValidatedPathCache[A](basesOf: A => Seq[String]) {

  private val m = new java.util.concurrent.ConcurrentHashMap[
    String, (A, Seq[(String, String)])]()

  /** Test hook: forget the memo (NOT the on-disk artifacts), so a
    * spec can exercise the cross-process reuse path. */
  def clear(): Unit = m.clear()

  /** The validated resolution for `key`, re-running `refresh` when
    * absent or when any underlying artifact no longer carries the
    * fingerprint it was cached with. Two racing threads may both
    * refresh (the artifact lock below serializes any actual build);
    * last-put wins, and both get a correct value. A refresh whose
    * artifacts do not validate afterwards (e.g. a concurrent writer
    * mid-flight) is returned but NOT cached — the next read retries. */
  def get(key: String)(refresh: => A): A = {
    val cur = m.get(key)
    if (cur != null && cur._2.forall { case (b, fp) =>
        ArtifactStore.isCurrentUnlocked(b, fp) })
      cur._1
    else {
      val v = refresh
      val marks = basesOf(v).map(b => b -> ArtifactStore.currentFingerprint(b))
      if (marks.nonEmpty && marks.forall(_._2.isDefined))
        m.put(key, (v, marks.map { case (b, f) => (b, f.get) }))
      else
        m.remove(key)
      v
    }
  }
}

object ValidatedPathCache {
  /** For resolutions that ARE the artifact base path. */
  def single(): ValidatedPathCache[String] =
    new ValidatedPathCache[String](b => Seq(b))

  /** For resolutions naming an artifact PAIR (e.g. IVF + PQ). */
  def pair(): ValidatedPathCache[(String, String)] =
    new ValidatedPathCache[(String, String)](p => Seq(p._1, p._2))
}
