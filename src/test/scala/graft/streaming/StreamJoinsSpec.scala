package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream-stream interval join semantics on MemoryStream: in-window
  * payments match, out-of-window payments don't, and the left-outer
  * form emits unpaid orders (null payment side) only after the
  * watermark closes their window.
  */
class StreamJoinsSpec extends SparkSpec {

  import spark.implicits._

  // NOT epoch-based: with event times near epoch 0 the interval
  // join's state-watermark arithmetic goes negative and matching rows
  // are silently dropped (verified on 4.1.2) — use realistic times
  private val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
  private def t(min: Int) = new Timestamp(base + min * 60000L)

  test("inner interval join: in-window payment matches across batches") {
    implicit val sc = spark.sqlContext
    val orders = MemoryStream[OrderMsg]
    val pays = MemoryStream[PaymentMsg]
    val q = StreamJoins.paidOrders(orders.toDS(), pays.toDS())
      .writeStream.format("memory").queryName("paid_out")
      .outputMode("append").start()

    orders.addData(OrderMsg(1, 10, 50.0, t(0)), OrderMsg(2, 20, 75.0, t(5)))
    q.processAllAvailable()
    // payment for order 1 inside its 30-min window, arriving a batch
    // later (the buffered-state case); order 2's payment 40 min late
    pays.addData(PaymentMsg(101, 1, t(20)), PaymentMsg(102, 2, t(45)))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("paid_out")
      .select("order_id", "payment_id").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 101L)))
  }

  test("left-outer: unpaid order emitted with nulls after watermark closes") {
    implicit val sc = spark.sqlContext
    val orders = MemoryStream[OrderMsg]
    val pays = MemoryStream[PaymentMsg]
    val q = StreamJoins.ordersWithPaymentStatus(orders.toDS(), pays.toDS())
      .writeStream.format("memory").queryName("status_out")
      .outputMode("append").start()

    orders.addData(OrderMsg(1, 10, 50.0, t(0)), OrderMsg(2, 20, 75.0, t(0)))
    pays.addData(PaymentMsg(101, 1, t(10)))
    q.processAllAvailable()
    // advance BOTH watermarks far past order 2's window (0 + 30 + 10
    // lateness): the unmatched row may only surface then
    orders.addData(OrderMsg(99, 99, 1.0, t(120)))
    pays.addData(PaymentMsg(999, 99, t(120)))
    q.processAllAvailable()
    // one more batch: outer-join results are emitted on the batch
    // AFTER the watermark advances
    orders.addData(OrderMsg(98, 98, 1.0, t(121)))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("status_out")
      .select("order_id", "payment_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got(1L) === Some(101L))
    assert(got.contains(2L) && got(2L).isEmpty, s"unpaid order missing: $got")
  }
}
