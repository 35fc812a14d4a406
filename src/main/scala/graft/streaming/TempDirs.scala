package graft.streaming

import java.io.File
import java.util.concurrent.ConcurrentLinkedQueue

/** Recursive-delete registry for the streaming gates' scratch dirs
  * (parquet spools, JSONL output, checkpoints).
  *
  * `File.deleteOnExit` never removes a non-empty directory, so every
  * bench/correctness invocation used to leak its spool + checkpoint
  * trees in java.io.tmpdir (ADVICE r5). One JVM shutdown hook walks
  * each registered root bottom-up instead. Registration is O(1) and
  * lock-free; deletion cost is paid once at exit.
  */
object TempDirs {
  private val roots = new ConcurrentLinkedQueue[File]()

  Runtime.getRuntime.addShutdownHook(new Thread("graft-tempdir-sweep") {
    override def run(): Unit = {
      var f = roots.poll()
      while (f != null) { deleteTree(f); f = roots.poll() }
    }
  })

  /** Register a scratch root for recursive deletion at JVM exit. */
  def register(dir: File): File = { roots.add(dir); dir }

  private def deleteTree(f: File): Unit = {
    if (f.isDirectory) {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(deleteTree)
    }
    f.delete(): Unit
  }
}
