package graft.dedup

import graft.envelope.ChangeEvent
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-key dedup state: the highest change-sequence number already emitted
  * downstream for a `(repo, path)` key. One Long per live key — the minimal
  * state that makes replay exactly-once and order-robust.
  */
final case class KeyProgress(maxEmittedLsn: Long)

/** Commit-sequence dedup — the idempotence/ordering layer the reference
  * lacks entirely (draethos is order-blind and at-least-once; duplicates
  * are absorbed only by key-idempotent sinks, `internal/source/kafka.go:
  * 103-109` + `internal/target/mysql.go:23`). Per the north rule we make
  * it explicit: `flatMapGroupsWithState` keyed on `(repo, path)` holding
  * the max emitted LSN per key.
  *
  * Semantics (order-independent convergence):
  *  - within a group-batch, events are sorted by `lsn` (group iterator
  *    order is not guaranteed);
  *  - an event is emitted iff its `lsn` exceeds everything already emitted
  *    for its key — exact redeliveries (same lsn) and stale out-of-order
  *    events (lower lsn than an already-applied change, e.g. an insert
  *    arriving after its key's delete) are dropped;
  *  - therefore the event with the key's maximum LSN is always emitted,
  *    and the final merged state equals the one-batch oracle reducer
  *    regardless of delivery order or duplication.
  *
  * State is hash-partitioned by key (shuffle #1 of the pipeline) and
  * checkpointed by the engine — resume-safe. At 10^10 scale the state is
  * one Long per live key; RocksDB state store + watermark-based TTL would
  * bound it (here: in-memory HDFS store, unbounded at test scale —
  * explicit trade-off, SURVEY.md §7 risk 2).
  */
object LsnDedup {

  implicit val keyProgressEnc: Encoder[KeyProgress] = Encoders.product[KeyProgress]
  implicit val keyEnc: Encoder[(String, String)] =
    Encoders.tuple(Encoders.STRING, Encoders.STRING)

  def apply(events: Dataset[ChangeEvent]): Dataset[ChangeEvent] = {
    implicit val evEnc: Encoder[ChangeEvent] = ChangeEvent.encoder
    events
      .groupByKey(e => (e.repo, e.path))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        dedupGroup)
  }

  /** Batch analog (for tests / batch replay): same semantics, no state. */
  def batch(events: Dataset[ChangeEvent]): Dataset[ChangeEvent] = {
    implicit val evEnc: Encoder[ChangeEvent] = ChangeEvent.encoder
    events.groupByKey(e => (e.repo, e.path)).flatMapGroups {
      (_: (String, String), it: Iterator[ChangeEvent]) =>
        var last = Long.MinValue
        it.toArray.sortBy(_.lsn).iterator.filter { e =>
          val keep = e.lsn > last
          if (keep) last = e.lsn
          keep
        }
    }
  }

  /** Emits at most ONE event per key per micro-batch: the key's highest
    * new LSN. Intermediate events within a batch can never surface in the
    * lake (last-write-wins), so emitting only the winner halves-or-better
    * the merge-shuffle volume on hot keys without changing convergence.
    */
  private[graft] def dedupGroup(
      key: (String, String),
      events: Iterator[ChangeEvent],
      state: GroupState[KeyProgress]): Iterator[ChangeEvent] = {
    val already = state.getOption.map(_.maxEmittedLsn).getOrElse(Long.MinValue)
    var winner: ChangeEvent = null
    var max = already
    events.foreach { e =>
      if (e.lsn > max) { max = e.lsn; winner = e }
    }
    if (max > already) {
      state.update(KeyProgress(max))
      Iterator.single(winner)
    } else Iterator.empty
  }
}
