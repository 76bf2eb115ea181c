package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** S8 stateful streaming — the running orderbook snapshot
  * (`/root/reference/internal/input/orderbooks.go:122-266`): the reference
  * holds every live offer in an in-memory map updated per checkpoint batch;
  * here the state lives in Spark's managed state store keyed by offer id —
  * fault-tolerant, spillable, and partitioned across executors, with
  * `flatMapGroupsWithState` emitting one event per state transition.
  *
  * Blockchain ordering is total and monotone (no late data), so no watermark
  * is needed; within a micro-batch, changes for one offer are applied in
  * (ledger_sequence, change_order) order. */
object OrderbookStream {

  case class OfferChange(
      offer_id: Long, ledger_sequence: Long, change_order: Long,
      seller_id: String, amount: Double, price_n: Int, price_d: Int,
      deleted: Boolean)

  case class OfferState(
      offer_id: Long, seller_id: String, amount: Double,
      price_n: Int, price_d: Int, last_ledger: Long)

  /** One emitted row per applied batch of changes for an offer:
    * action ∈ created | updated | removed (the star-schema fact feed). */
  case class OfferEvent(
      offer_id: Long, action: String, seller_id: String, amount: Double,
      price: Double, ledger_sequence: Long)

  def updateOffer(
      offerId: Long,
      changes: Iterator[OfferChange],
      state: GroupState[OfferState]): Iterator[OfferEvent] = {
    // total order within the group; iterator order is not guaranteed
    val ordered = changes.toSeq.sortBy(c => (c.ledger_sequence, c.change_order))
    var events = Vector.empty[OfferEvent]
    ordered.foreach { c =>
      val existed = state.exists
      if (c.deleted) {
        if (existed) {
          val s = state.get
          events :+= OfferEvent(offerId, "removed", s.seller_id, s.amount,
            s.price_n.toDouble / s.price_d.toDouble, c.ledger_sequence)
          state.remove()
        }
      } else {
        state.update(OfferState(offerId, c.seller_id, c.amount,
          c.price_n, c.price_d, c.ledger_sequence))
        events :+= OfferEvent(offerId,
          if (existed) "updated" else "created",
          c.seller_id, c.amount,
          c.price_n.toDouble / c.price_d.toDouble, c.ledger_sequence)
      }
    }
    events.iterator
  }

  /** Works identically on a streaming or batch Dataset (batch mode applies
    * one "micro-batch" containing everything — the reference's bounded run). */
  def offerEvents(changes: Dataset[OfferChange]): Dataset[OfferEvent] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.offer_id)
      .flatMapGroupsWithState[OfferState, OfferEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(updateOffer)
  }
}
