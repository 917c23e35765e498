package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Silver-layer cleaning (SURVEY §2.2 P2–P7): the inverse of the
  * reference generator's injected defects
  * (reference scripts/setup_source_db.py:204-219 — 2% negative price,
  * 1% zero quantity, 1% empty status, 3% corrupted total; cleaner at
  * dags/daily_pipeline.py:108-118).
  *
  * Expressed as a composable DataFrame transform over the canonical
  * "orders-fact" column names so the same function serves batch tables
  * and the streaming alert feed. All predicates are native Column
  * expressions → whole-stage codegen, filters push down to the scan.
  */
object Cleaning {

  /** P2–P6 on a frame with (order_id, price, quantity, status).
    * Recomputes `total` from cleaned price*quantity — never trusts the
    * source total (3% corrupted by design).
    */
  def cleanOrders(df: DataFrame): DataFrame =
    df.filter(col("order_id").isNotNull)            // P2 non-null key
      .filter(col("quantity") > 0)                  // P3 positive qty
      .withColumn("price", abs(col("price")))       // P4 absolute price
      .filter(col("status").isNotNull && col("status") =!= "") // P5
      .withColumn("total", col("price") * col("quantity"))     // P6

  /** Audit columns (P7). `executionDate` is a parameter (the `ds` of
    * the run) — idempotent per-partition overwrite gives backfill
    * (SURVEY §2.10 C1).
    */
  def withAudit(df: DataFrame, executionDate: String): DataFrame =
    df.withColumn("_ingestion_timestamp", current_timestamp())
      .withColumn("_execution_date", lit(executionDate))

  /** Data-quality audit: per-rule violation counts over the raw fact
    * — the observability face of the P2–P6 cleaner (the reference
    * logs dropped-row counts, dags/daily_pipeline.py:120-126; here
    * it is one conditional-sum aggregate, a single scan at any
    * scale). A row can violate several rules; n_clean counts rows
    * violating none (matches what cleanOrders keeps modulo the P4
    * abs repair, which drops nothing).
    */
  def qualityAudit(df: DataFrame): DataFrame = {
    def viol(c: org.apache.spark.sql.Column) = sum(c.cast("long"))
    df.agg(
      count(lit(1)).as("n_rows"),
      viol(col("order_id").isNull).as("n_null_key"),
      viol(col("quantity") <= 0).as("n_nonpos_qty"),
      viol(col("price") < 0).as("n_neg_price"),
      viol(col("status").isNull || col("status") === "").as("n_bad_status"),
      viol(col("order_id").isNotNull && col("quantity") > 0 &&
        col("status").isNotNull && col("status") =!= "").as("n_clean"))
      .withColumn("clean_ratio",
        round(col("n_clean").cast("double") / col("n_rows"), 6))
  }
}
