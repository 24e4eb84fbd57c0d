package graft.core

import java.nio.file.{Files, Path, Paths}

/** Bounded temp-store policy: every scratch store/topic/checkpoint a graft
  * JVM creates lives under ONE per-process session root
  * (`$java.io.tmpdir/graft-run-<pid>`), deleted on normal JVM exit.
  *
  * Why: temp stores used to land directly in java.io.tmpdir, one dir per
  * call — a long bench/stress campaign accumulated hundreds of them
  * (851 at one point) and filled the host disk mid-sweep. One root per
  * process bounds the growth to "live JVMs", makes crash leftovers
  * attributable (the pid is in the name), and makes cleanup O(1):
  * `tools/clean_tmp` removes roots whose pid is no longer alive. */
object TmpStores {

  /** The per-process session root (created lazily, removed by a shutdown
    * hook — mains stop their SparkSession before the JVM exits, so
    * nothing is still writing under it when the hook runs). */
  lazy val sessionRoot: Path = {
    val p = Paths.get(sys.props("java.io.tmpdir"),
      s"graft-run-${ProcessHandle.current().pid()}")
    Files.createDirectories(p)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteQuietly(p)))
    p
  }

  /** A fresh scratch directory under the session root. */
  def dir(prefix: String): Path =
    Files.createTempDirectory(sessionRoot, prefix)

  /** A FIXED path under the session root (for content-keyed per-JVM
    * caches that must be findable again within the same process). */
  def fixed(name: String): Path = sessionRoot.resolve(name)

  /** Best-effort recursive delete; never throws (shutdown-hook safe). */
  def deleteQuietly(p: Path): Unit =
    try {
      if (Files.exists(p)) {
        val s = Files.walk(p)
        try s.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(q => try Files.deleteIfExists(q) catch { case _: Throwable => () })
        finally s.close()
      }
    } catch { case _: Throwable => () }
}
