package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** Order/payment message shapes for the stream-stream join (top-level
  * for Encoder derivation in specs).
  */
case class OrderMsg(order_id: Long, user_id: Long, amount: Double,
                    o_ts: Timestamp)
case class PaymentMsg(payment_id: Long, order_id: Long, p_ts: Timestamp)

/** Stream-stream joins (SURVEY §2.8 extension; the reference's Flink
  * jobs are single-stream — this is the two-stream correlation shape
  * its alerting roadmap implies: orders correlated with their
  * payments in flight).
  *
  * Scale/state design: BOTH sides carry a watermark and the join
  * condition carries an event-time interval bound, so Spark evicts
  * buffered rows as the watermark passes — state is bounded by
  * (traffic within the interval + watermark delay), never the full
  * stream history. Without the interval bound a stream-stream join
  * buffers forever; that shape is deliberately not exposed here.
  */
object StreamJoins {

  val PayWindowMin = 30
  val LatenessMin = 10

  private def bounds(orders: Dataset[OrderMsg], payments: Dataset[PaymentMsg]) = (
    orders.withWatermark("o_ts", s"$LatenessMin minutes").as("o"),
    payments.withWatermark("p_ts", s"$LatenessMin minutes").as("p"))

  /** Inner interval join: payment must land within `PayWindowMin`
    * minutes of its order.
    */
  def paidOrders(orders: Dataset[OrderMsg],
                 payments: Dataset[PaymentMsg]): DataFrame = {
    val (o, p) = bounds(orders, payments)
    o.join(p,
      expr(s"""o.order_id = p.order_id
              |AND p_ts >= o_ts
              |AND p_ts <= o_ts + interval $PayWindowMin minutes""".stripMargin))
      .select(col("o.order_id"), col("user_id"), col("amount"),
        col("payment_id"), col("o_ts"), col("p_ts"))
  }

  /** Left-outer variant — the unpaid-order detector: once the
    * watermark passes an order's payment window, the order is emitted
    * with a null payment side (and its buffered state dropped).
    */
  def ordersWithPaymentStatus(orders: Dataset[OrderMsg],
                              payments: Dataset[PaymentMsg]): DataFrame = {
    val (o, p) = bounds(orders, payments)
    o.join(p,
      expr(s"""o.order_id = p.order_id
              |AND p_ts >= o_ts
              |AND p_ts <= o_ts + interval $PayWindowMin minutes""".stripMargin),
      "left_outer")
      .select(col("o.order_id"), col("user_id"), col("amount"),
        col("payment_id"), col("o_ts"), col("p_ts"))
  }
}
