package graft.util

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Scratch directories for the sink/round-trip operators. A fixed
  * per-name path (recreated empty on every call) instead of
  * `Files.createTempDirectory` per invocation: repeated warm-up +
  * timed bench runs overwrite one directory rather than leaking a new
  * CSV/JSON/ORC/parquet copy each run, and a JVM shutdown hook removes
  * the whole scratch root.
  */
object TmpDirs {
  private lazy val root: Path = {
    // per-process root: concurrent JVMs (a Bench and a Verify, parallel
    // CI jobs) must not delete each other's live scratch data
    val p = Paths.get(sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      "graft-scratch-" + ProcessHandle.current().pid())
    Files.createDirectories(p)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(p)))
    p
  }

  /** A fresh empty directory at a stable per-name path. */
  def scratch(name: String): String = {
    val p = root.resolve(name)
    deleteRecursively(p)
    Files.createDirectories(p)
    p.toString
  }

  /** The stable per-name path WITHOUT wiping it — for re-reading data
    * a prior `scratch(name)` call produced in this process.
    */
  def path(name: String): String = root.resolve(name).toString

  /** A scratch dir keyed by the sf dir — REQUIRED for any directory
    * cached in a (session, sfDir)-keyed memo: an sf-agnostic name
    * would let a run at a second sf wipe and rebuild the path out
    * from under the first sf's still-live memo entry, silently
    * serving wrong-scale data to later queries.
    */
  def scratchFor(name: String, sfDir: String): String =
    scratch(name + "-" + sfDir.replaceAll("[^A-Za-z0-9]", "_"))

  /** The stable path `scratchFor(name, sfDir)` resolves to, WITHOUT
    * wiping it — the sf-keyed twin of `path` (specs use it instead of
    * re-deriving the sanitization rule inline).
    */
  def pathFor(name: String, sfDir: String): String =
    path(name + "-" + sfDir.replaceAll("[^A-Za-z0-9]", "_"))

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => try Files.delete(f) catch { case _: Throwable => () })
}
