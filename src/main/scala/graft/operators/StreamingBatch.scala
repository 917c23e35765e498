package graft.operators

import graft.{QueryDef, Tables}
import graft.streaming.Alerts
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch-shape oracle checks for the streaming transforms (SURVEY
  * §2.8): the SAME `DataFrame => DataFrame` functions that run under
  * Structured Streaming (graft.streaming.Alerts) applied to the
  * `events` batch table — proving the transform semantics against
  * DuckDB while AlertsSpec proves the incremental execution with
  * MemoryStream.
  *
  * The events→orders mapping is deterministic arithmetic so every
  * alert rule fires on some rows: price spans negative values,
  * quantity spans 0 and >50, total is their product.
  */
object StreamingBatch {

  /** events → order-shaped stream stand-in (the unwrapped CDC feed,
    * SURVEY §2.1 S12).
    */
  def eventsAsOrders(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id").as("order_id"),
      col("ts"),
      col("user_id").as("customer_id"),
      col("event_type").as("product_name"),
      (col("value") - 250.0d).as("price"),
      (col("event_id") % 80L).as("quantity"))
      .withColumn("total", col("price") * col("quantity"))

  private val mapSql =
    """orders_s AS (SELECT event_id AS order_id, ts,
      |  user_id AS customer_id, event_type AS product_name,
      |  value - 250.0 AS price, event_id % 80 AS quantity,
      |  (value - 250.0) * (event_id % 80) AS total
      |  FROM events)""".stripMargin

  private val caseSql =
    """CASE WHEN total > 10000.0 THEN 'HIGH_VALUE_ORDER'
      |WHEN quantity > 50 THEN 'SUSPICIOUS_QUANTITY'
      |WHEN price < 0 THEN 'NEGATIVE_PRICE'
      |WHEN quantity <= 0 THEN 'INVALID_QUANTITY'
      |ELSE 'UNKNOWN' END""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ST1 = P11 filter + P12 CASE (rule priority exactly the
    // reference's, flink_job_alert_detection_simple.py:62-82).
    QueryDef("st1_alerts",
      (s, d) => Alerts.detectAlerts(eventsAsOrders(s, d)),
      Some(s"""WITH $mapSql
              |SELECT $caseSql AS alert_type,
              |order_id, customer_id, product_name, total, quantity
              |FROM orders_s
              |WHERE total > 10000.0 OR quantity > 50
              |OR price < 0 OR quantity <= 0""".stripMargin)),

    // P14: notification formatting; money through DECIMAL(18,2).
    QueryDef("st2_alert_messages",
      (s, d) => Alerts.formatAlertMessage(
        Alerts.detectAlerts(eventsAsOrders(s, d))
          .withColumn("order_id", col("order_id").cast("string"))
          .withColumn("customer_id", col("customer_id").cast("string"))
          .withColumn("quantity", col("quantity").cast("int")))
        .select(col("alert_type"), col("order_id"), col("message")),
      Some(s"""WITH $mapSql,
              |al AS (SELECT $caseSql AS alert_type,
              |  CAST(order_id AS VARCHAR) order_id,
              |  CAST(customer_id AS VARCHAR) customer_id,
              |  product_name, total, CAST(quantity AS INT) quantity
              |  FROM orders_s WHERE total > 10000.0 OR quantity > 50
              |  OR price < 0 OR quantity <= 0)
              |SELECT alert_type, order_id, CASE alert_type
              |WHEN 'HIGH_VALUE_ORDER' THEN 'HIGH VALUE ORDER: order ' || order_id
              |  || ' customer ' || customer_id || ' total $$'
              |  || CAST(CAST(total AS DECIMAL(18,2)) AS VARCHAR)
              |WHEN 'SUSPICIOUS_QUANTITY' THEN 'SUSPICIOUS QUANTITY: order '
              |  || order_id || ' qty ' || CAST(quantity AS VARCHAR)
              |  || ' of ' || product_name
              |WHEN 'NEGATIVE_PRICE' THEN 'NEGATIVE PRICE: order ' || order_id
              |  || ' total $$' || CAST(CAST(total AS DECIMAL(18,2)) AS VARCHAR)
              |  || ' requires review'
              |WHEN 'INVALID_QUANTITY' THEN 'INVALID QUANTITY: order '
              |  || order_id || ' quantity ' || CAST(quantity AS VARCHAR)
              |ELSE 'UNKNOWN ALERT: order ' || order_id END AS message
              |FROM al""".stripMargin)),

    // ST4: tumbling 5-minute rapid-orders count (the implied
    // RAPID_ORDERS rule, flink_job_telegram_sender.py:76-83). Spark's
    // window() and DuckDB's time_bucket are both epoch-aligned.
    QueryDef("st4_rapid_windows",
      (s, d) => Alerts.rapidOrders(eventsAsOrders(s, d))
        .select(col("customer_id"),
          unix_micros(col("window_start")).as("ws_us"),
          unix_micros(col("window_end")).as("we_us"),
          col("order_count")),
      Some(s"""WITH $mapSql
              |SELECT customer_id,
              |epoch_us(time_bucket(INTERVAL '5 minutes', ts)) AS ws_us,
              |epoch_us(time_bucket(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes') AS we_us,
              |COUNT(*) AS order_count
              |FROM orders_s
              |GROUP BY customer_id, time_bucket(INTERVAL '5 minutes', ts)
              |HAVING COUNT(*) >= ${Alerts.RapidCount}""".stripMargin)),

    // ST10: Spark's NATIVE gap-session operator (session_window) —
    // the same semantics st5_sessionize composes from two window
    // passes, but as the built-in merging-session aggregate that also
    // runs under Structured Streaming with a watermark (st5's window
    // functions do not). Sessions merge while the next event starts
    // strictly inside [ts, ts+gap); window end = last event + gap.
    // The oracle mirrors that boundary rule exactly (>= gap starts a
    // new session, end = max ts + gap).
    QueryDef("st6_session_window",
      (s, d) => Tables.events(s, d)
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("sw.start")).as("session_start_us"),
          unix_micros(col("sw.end")).as("session_end_us"),
          col("n_events")),
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) ts_us
             |  FROM events),
             |g AS (SELECT user_id, ts_us, event_id,
             |  CASE WHEN lag(ts_us) OVER w IS NULL
             |    OR ts_us - lag(ts_us) OVER w >= 1800000000
             |    THEN 1 ELSE 0 END AS is_start
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
             |sess AS (SELECT user_id, ts_us,
             |  CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
             |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
             |  FROM g)
             |SELECT user_id, MIN(ts_us) AS session_start_us,
             |MAX(ts_us) + 1800000000 AS session_end_us,
             |COUNT(*) AS n_events
             |FROM sess GROUP BY user_id, sid""".stripMargin))
  )
}
