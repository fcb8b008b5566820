package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** CDC inline-check retry machine — the reference's eventual-consistency
  * tolerance (/root/reference/dt-connector/src/checker/checker_engine.rs:
  * 731-819 + cdc_state.rs): a row that compares inconsistent is retried
  * up to maxRetries across later batches (replication lag shows up as
  * transient DIFF); only rows that stay inconsistent are reported.
  *
  * Spark-native: `flatMapGroupsWithState` keyed by row identity — the
  * retry counter lives in the streaming state store, surviving restarts
  * via the checkpoint, replacing the reference's persistent state_store.
  */
object CheckRetry {

  final case class CheckObservation(rowId: Long, consistent: Boolean)
  final case class RetryState(retries: Int)
  final case class CheckOutcome(rowId: Long, status: String, retries: Int)

  /** The per-key state transition. Visible for batch unit tests. */
  def transition(maxRetries: Int)(rowId: Long,
      events: Iterator[CheckObservation],
      state: GroupState[RetryState]): Iterator[CheckOutcome] = {
    val evs = events.toSeq
    if (evs.isEmpty) {
      // timeout tick with no new observation: keep waiting
      Iterator.empty
    } else if (evs.exists(_.consistent)) {
      // consistency reached (lag caught up) → resolved, clear state
      val prior = state.getOption.map(_.retries).getOrElse(0)
      state.remove()
      Iterator.single(CheckOutcome(rowId, "OK", prior))
    } else {
      val retries = state.getOption.map(_.retries).getOrElse(0) + 1
      if (retries >= maxRetries) {
        state.remove()
        Iterator.single(CheckOutcome(rowId, "DIFF", retries))
      } else {
        state.update(RetryState(retries))
        Iterator.single(CheckOutcome(rowId, "RETRY", retries))
      }
    }
  }

  /** Wire the machine over a (possibly streaming) observation set. */
  def apply(obs: Dataset[CheckObservation], maxRetries: Int = 3)
      : Dataset[CheckOutcome] =
    obs.groupByKey(_.rowId)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(transition(maxRetries))(
        Encoders.product[RetryState], Encoders.product[CheckOutcome])
}
