package graft.tools

/** Dev-only: verifies the Bench JSON handoff shape — what the driver sees
  * on sbt's stdout, and in what order, when a forked main prints one JSON
  * line to stdout and noise to stderr.
  */
object EmitProbe {
  def main(args: Array[String]): Unit = {
    System.err.println("[noise] stderr line before")
    System.err.flush()
    print("\n{\"metric\":\"total\",\"value\":1.5,\"unit\":\"sec\",\"queries\":{},\"sf\":\"probe\"}\n")
    System.out.flush()
    System.err.println("[noise] stderr line after")
    System.err.flush()
  }
}
