package graft

/** Tag for long-running soak tests (multi-minute streaming replays):
  * `sbt "testOnly * -- -l graft.SlowSoak"` excludes them for quick
  * local iteration; the default `sbt test` runs everything. */
object SlowSoak extends org.scalatest.Tag("graft.SlowSoak")
