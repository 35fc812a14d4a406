package graft.queries

/** Test-only bridge to the package-private replay-fixture memo. */
object TestFixtureAccess {
  def replayRows[T <: AnyRef](key: String, d: String)(build: => T): T =
    StreamFixtures.replayRows(key, d)(build)
}
