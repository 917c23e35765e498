package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class Dirty(order_id: String, price: Double, quantity: Int,
                 status: String, total: Double)

/** The generator↔cleaner property pair (SURVEY §5.1): the Silver rules
  * P2–P6 remove exactly the reference generator's injected defect
  * classes (reference scripts/setup_source_db.py:204-219, cleaner
  * dags/daily_pipeline.py:108-118).
  */
class CleaningSpec extends SparkSpec {

  import spark.implicits._

  val rows = Seq(
    Dirty("O1", 10.0, 2, "completed", 20.0),   // valid
    Dirty(null, 10.0, 2, "completed", 20.0),   // P2: null key
    Dirty("O3", 10.0, 0, "completed", 0.0),    // P3: zero quantity
    Dirty("O4", -10.0, 2, "completed", -20.0), // P4: negative price (kept, abs)
    Dirty("O5", 10.0, 2, "", 20.0),            // P5: empty status
    Dirty("O6", 10.0, 2, null, 20.0),          // P5: null status
    Dirty("O7", 10.0, 3, "processing", 99.9))  // P6: corrupted total (recomputed)

  test("P2-P6: cleaner drops exactly the injected defect classes") {
    val out = Cleaning.cleanOrders(rows.toDF())
      .select("order_id", "price", "total")
      .as[(String, Double, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq("O1", "O4", "O7"))
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId("O4")._2 === 10.0) // abs
    assert(byId("O4")._3 === 20.0) // recomputed from |price|*qty
    assert(byId("O7")._3 === 30.0) // never trusts source total
  }

  test("C5: cleaner is total on empty input") {
    val out = Cleaning.cleanOrders(spark.emptyDataset[Dirty].toDF())
    assert(out.count() === 0)
    assert(out.columns.contains("total"))
  }

  test("P7: audit columns") {
    val out = Cleaning.withAudit(rows.take(1).toDF(), "2024-01-01")
    assert(out.select("_execution_date").as[String].head() === "2024-01-01")
    assert(out.schema("_ingestion_timestamp").dataType.typeName === "timestamp")
  }

  test("P18: quality audit counts each defect class once per rule") {
    val a = Cleaning.qualityAudit(rows.toDF())
      .select("n_rows", "n_null_key", "n_nonpos_qty", "n_neg_price",
        "n_bad_status", "n_clean", "clean_ratio")
      .as[(Long, Long, Long, Long, Long, Long, Double)].head()
    // 7 rows: 1 null key, 1 zero qty, 1 neg price, 2 bad status.
    // n_clean counts P2/P3/P5 passers — O1, O4 (neg price is
    // repaired by abs, not dropped, so it stays clean-keepable), O7.
    assert(a === ((7L, 1L, 1L, 1L, 2L, 3L, 0.428571)))
  }
}
