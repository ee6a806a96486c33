package graft.operators

/** Strict `b<number>` segment-name parsing, shared by every persisted
  * segment store (text index gram-df, SRP, IVF-PQ, manifest, reservoir
  * snapshots) and by the harness code that lists them.
  *
  * One definition on purpose: the stores' crash mode is a stray
  * non-numeric `b*` entry under a store dir (a `backup/` folder, an
  * interrupted-rename leftover) either killing every subsequent read with
  * a NumberFormatException or — worse — being silently swallowed into a
  * segment merge and destroyed. The strict match existed in
  * [[Dedup.compactSegmentDirs]] and [[Manifest]] but was re-implemented
  * loosely (`startsWith("b") + drop(1).toLong`) at the streaming and
  * harness listing sites; round-11 ADVICE flagged the drift.
  */
object Segments {

  /** Segment name → batch id; None for anything that is not a strict
    * `b<number>` name.
    */
  def id(name: String): Option[Long] =
    if (name.matches("b-?\\d+")) Some(name.stripPrefix("b").toLong)
    else None

  /** True iff `name` is a well-formed segment directory name. */
  def isSegment(name: String): Boolean = id(name).isDefined
}
