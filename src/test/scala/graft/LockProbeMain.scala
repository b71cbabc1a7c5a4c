package graft

/** Subprocess side of ArtifactStoreSpec's cross-process lock test: a
  * genuinely separate JVM that takes the artifact lock, signals it is
  * inside its build (sentinel file beside the base dir), builds slowly,
  * and reports whether it built or reused. */
object LockProbeMain {
  def main(args: Array[String]): Unit = {
    val Array(base, fp, sleepMs) = args
    val built = graft.io.ArtifactStore.ensure(base, fp) { staging =>
      val data = java.nio.file.Paths.get(staging, "data")
      java.nio.file.Files.createDirectories(data)
      java.nio.file.Files.write(data.resolve("part-0"),
        "from-child".getBytes("UTF-8"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(base).getParent.resolve("child-in-build"),
        Array.empty[Byte])
      Thread.sleep(sleepMs.toLong)
    }
    println(if (built) "BUILT" else "REUSED")
  }
}
