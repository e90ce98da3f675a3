package graft.sources

import java.io.File
import java.nio.file.{Files, Path, Paths}

/** Content-addressed scratch-fixture cache.
  *
  * Derived fixtures (PNG object-store stand-in, schema-merge stage,
  * partition-overwrite stage) live in java.io.tmpdir and must be
  * rebuilt when their SOURCE data changes — a `_DONE` marker keyed
  * only on the sf-dir basename goes stale silently if the dataset at
  * that path is regenerated (e.g. a scratch sf1 rebuilt at a
  * different factor) or the synthetic generator changes. Here the
  * marker CONTENT is a fingerprint of the source files
  * (relative path + size + mtime) plus a caller version tag; any
  * mismatch wipes the stage and rebuilds. Fingerprinting walks file
  * metadata only — no data read — so the fast path stays O(files). */
object FixtureCache {

  /** SHA-256 over the source tree's (relative-path, size, mtime)
    * triples plus `version` (bump it when the generator changes). */
  def fingerprint(sourcePath: String, version: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(version.getBytes("UTF-8"))
    val root = Paths.get(sourcePath)
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala
          .filter(p => Files.isRegularFile(p))
          .map { p: Path =>
            s"${root.relativize(p)}:${Files.size(p)}:" +
              s"${Files.getLastModifiedTime(p).toMillis}"
          }
          .toSeq.sorted
          .foreach(line => md.update((line + "\n").getBytes("UTF-8")))
      } finally walk.close()
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** Runs `build` unless `stage/_DONE` already carries exactly this
    * fingerprint; a stale or absent marker wipes the stage first so a
    * half-built or outdated fixture can never leak through. */
  def ensure(stage: File, fp: String)(build: => Unit): Unit = {
    val done = new File(stage, "_DONE")
    val current =
      if (done.exists()) new String(Files.readAllBytes(done.toPath), "UTF-8")
      else ""
    if (current != fp) {
      deleteRecursively(stage)
      stage.mkdirs()
      build
      Files.write(done.toPath, fp.getBytes("UTF-8"))
      ()
    }
  }

  private def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
    ()
  }
}
