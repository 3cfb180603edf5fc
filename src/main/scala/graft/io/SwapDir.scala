package graft.io

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths}

/** Atomic-swap trio shared by the persisted stores
  * ([[graft.dedup.DedupStore]], [[graft.similarity.AnnIndex]],
  * [[graft.operators.BpeStore]]) — extracted in round 15 so the
  * crash-safety logic has ONE implementation instead of divergence-prone
  * copies (round-14 advice).
  *
  * Discipline: a maintenance op (compact) writes a complete staging copy
  * (`<name>_staging`, `_SUCCESS`-terminated by the parquet committer),
  * then [[swapIn]] renames live aside (`<name>_old`), moves staging in
  * and deletes the leftover. [[healSwap]] finishes the one interrupted
  * window (staging complete, live absent) at load time.
  *
  * SINGLE-WRITER CONTRACT: at most one process may run a mutating op
  * (compact/swapIn) on a store directory at a time — the stores target
  * the snapshot-ingest pipeline shape where maintenance is a scheduled
  * job, not a concurrent service. Readers (load → healSwap) are safe
  * beside ONE writer: the heal move is tolerant of losing the race to
  * the writer's own [[swapIn]] (the move that throws
  * FileAlreadyExistsException re-checks that live exists and proceeds),
  * so a reader can never corrupt a swap it merely observed mid-flight.
  * Two concurrent WRITERS remain undefined, exactly as two concurrent
  * `INSERT OVERWRITE`s are.
  */
object SwapDir {

  /** Swap `<dir>/<name>_staging` into `<dir>/<name>`: live renamed aside
    * to `<name>_old`, staging moved in, leftover deleted. Requires a
    * complete staging copy; call only from the single writer.
    */
  def swapIn(dir: String, name: String): Unit = {
    val live = Paths.get(dir, name)
    val old = Paths.get(dir, s"${name}_old")
    val staging = Paths.get(dir, s"${name}_staging")
    deleteRecursively(old) // stale leftover from a crash after a past swap
    if (Files.exists(live)) Files.move(live, old)
    moveTolerant(staging, live)
    deleteRecursively(old)
  }

  /** Finish a swap a crash interrupted: live dir absent but a complete
    * (`_SUCCESS`-bearing) staging copy present -> move it in. Also clears
    * any `_old` leftover. Safe for readers to call concurrently with one
    * writer's [[swapIn]] — see the class contract.
    */
  def healSwap(dir: String, name: String): Unit = {
    val live = Paths.get(dir, name)
    val staging = Paths.get(dir, s"${name}_staging")
    if (!Files.exists(live) && Files.exists(staging.resolve("_SUCCESS")))
      moveTolerant(staging, live)
    deleteRecursively(Paths.get(dir, s"${name}_old"))
  }

  /** Move that tolerates losing a heal-vs-swap race: if the target came
    * into existence between our check and our move (the other side's
    * move won), the swap is already complete and this side's intent is
    * satisfied — re-check and return instead of propagating.
    */
  private def moveTolerant(from: Path, to: Path): Unit =
    try Files.move(from, to)
    catch {
      case e: FileAlreadyExistsException =>
        if (!Files.exists(to)) throw e // target vanished again: a real error
    }

  /** Recursive delete with [[moveTolerant]]'s intent-satisfied semantics:
    * a reader's healSwap and the writer's swapIn can both race to delete
    * `<name>_old`, and the loser's walk/delete would otherwise throw
    * NoSuchFileException (or the UncheckedIOException Files.walk surfaces)
    * even though the tree is gone — which is exactly what this side
    * wanted (round-15 ADVICE). Losing the race is success, not failure.
    *
    * DirectoryNotEmptyException gets the same treatment (round-16 ADVICE):
    * when two deleters interleave, the loser's deleteIfExists on a
    * directory whose children the winner has not yet removed throws it —
    * one bounded retry after the winner's pass, and a tree that is gone
    * (or going) by then satisfies the intent. A tree that persists through
    * the retry is a REAL error (e.g. a concurrent writer adding files) and
    * propagates.
    */
  def deleteRecursively(p: Path): Unit = deleteRecursively(p, retries = 1)

  private def deleteRecursively(p: Path, retries: Int): Unit = {
    if (!Files.exists(p)) return
    import scala.jdk.CollectionConverters._
    try Files.walk(p).iterator().asScala.toSeq.reverse
      .foreach(f => Files.deleteIfExists(f))
    catch {
      case _: java.nio.file.NoSuchFileException => ()
      case e: java.io.UncheckedIOException
        if e.getCause.isInstanceOf[java.nio.file.NoSuchFileException] => ()
      case e: java.nio.file.DirectoryNotEmptyException =>
        if (Files.exists(p)) {
          if (retries > 0) deleteRecursively(p, retries - 1) else throw e
        }
    }
  }
}
