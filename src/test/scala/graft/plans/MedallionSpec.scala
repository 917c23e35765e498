package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class SrcOrder(order_id: String, order_date: Timestamp,
                    customer_id: String, product_name: String,
                    category: String, price: Double, quantity: Int,
                    status: String)

/** Medallion pipeline semantics: layer contracts on disk, per-day
  * idempotence (C1), empty-day no-op (C5), and the C4 registry gate.
  */
class MedallionSpec extends SparkSpec {

  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  val source = Seq(
    SrcOrder("O1", t("2024-01-01 09:00:00"), "C1", "P1", "Books", 10.0, 2, "completed"),
    SrcOrder("O2", t("2024-01-01 10:00:00"), "C2", "P2", "Toys", 5.0, 1, "completed"),
    SrcOrder(null, t("2024-01-01 11:00:00"), "C3", "P3", "Toys", 5.0, 1, "completed"),
    SrcOrder("O4", t("2024-01-02 09:00:00"), "C1", "P1", "Books", 20.0, 1, "completed"))

  test("C1/C2: runDay materializes bronze→silver→gold and is idempotent") {
    val lake = java.nio.file.Files.createTempDirectory("lake").toString
    val r1 = Medallion.runDay(source.toDF(), lake, "2024-01-01")
    assert(r1.extracted === 3 && r1.cleaned === 2) // null key dropped
    // re-run the same day: same result, no duplication (overwrite)
    Medallion.runDay(source.toDF(), lake, "2024-01-01")
    Medallion.runDay(source.toDF(), lake, "2024-01-02")
    val silver = spark.read.parquet(s"$lake/silver/orders")
    assert(silver.count() === 3) // 2 (day1) + 1 (day2)
    val gold = spark.read.parquet(s"$lake/gold/daily_summary")
      .select("date", "total_orders", "total_revenue")
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(gold.toSeq === Seq(("2024-01-01", 2L, 25.0), ("2024-01-02", 1L, 20.0)))
  }

  test("C1 catchup: re-running one day leaves sibling partitions byte-identical") {
    // the reference's catchup=True backfill contract
    // (dags/daily_pipeline.py:736-751): a day's re-run — even with
    // changed input — must replace exactly that day's partitions
    val lake = java.nio.file.Files.createTempDirectory("lake").toString
    val threeDays = source :+
      SrcOrder("O5", t("2024-01-03 09:00:00"), "C9", "P9", "Games", 7.0, 3, "completed")
    Seq("2024-01-01", "2024-01-02", "2024-01-03")
      .foreach(Medallion.runDay(threeDays.toDF(), lake, _))

    // fingerprint every parquet file outside the re-run day
    def fingerprint(): Map[String, String] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(lake)).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") &&
          !p.toString.contains("date=2024-01-02"))
        .map { p =>
          val md = java.security.MessageDigest.getInstance("MD5")
          p.toString -> md.digest(java.nio.file.Files.readAllBytes(p))
            .map("%02x".format(_)).mkString
        }.toMap
    }
    val before = fingerprint()

    // mutate day 2's input (price change) and replay just that day
    val mutated = threeDays.map(o =>
      if (o.order_id == "O4") o.copy(price = 99.0) else o)
    Medallion.runDay(mutated.toDF(), lake, "2024-01-02")

    assert(fingerprint() === before, "sibling day partitions were rewritten")
    val gold = spark.read.parquet(s"$lake/gold/daily_summary")
      .select("date", "total_revenue").as[(String, Double)].collect().toMap
    assert(gold("2024-01-02") === 99.0) // re-run day reflects the mutation
    assert(gold("2024-01-01") === 25.0 && gold("2024-01-03") === 21.0)
  }

  test("upsert rewrites only touched partitions (copy-on-write MERGE)") {
    val dir = java.nio.file.Files.createTempDirectory("cow").toString + "/t"
    val base = Seq(
      ("K1", 10.0, "2024-01-01"), ("K2", 20.0, "2024-01-01"),
      ("K3", 30.0, "2024-01-02"), ("K4", 40.0, "2024-01-02"))
      .toDF("k", "v", "date")
    base.write.option("partitionOverwriteMode", "dynamic")
      .partitionBy("date").parquet(dir)

    def filesOf(day: String) =
      new java.io.File(s"$dir/date=$day").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified).toMap
    val day1Before = filesOf("2024-01-01")

    // update K3, insert K5 — both land in day 2 only
    val updates = Seq(("K3", 99.0, "2024-01-02"), ("K5", 50.0, "2024-01-02"))
      .toDF("k", "v", "date")
    Medallion.upsertPartitioned(spark, dir, updates, "k")

    assert(filesOf("2024-01-01") === day1Before,
      "untouched partition was rewritten")
    val got = spark.read.parquet(dir).select("k", "v", "date")
      .as[(String, Double, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      ("K1", 10.0, "2024-01-01"), ("K2", 20.0, "2024-01-01"),
      ("K3", 99.0, "2024-01-02"), ("K4", 40.0, "2024-01-02"),
      ("K5", 50.0, "2024-01-02")))
  }

  test("C5: empty day is a no-op, not a crash") {
    val lake = java.nio.file.Files.createTempDirectory("lake").toString
    val r = Medallion.runDay(source.toDF(), lake, "2030-12-31")
    assert(r.extracted === 0)
    assert(!new java.io.File(s"$lake/bronze").exists())
  }

  test("C4: registry promotes only on the reference's better-model rule") {
    import ModelRegistry._
    assert(isBetter(Metrics(0.5, 0.1), None))
    assert(isBetter(Metrics(0.6, 0.0), Some(Metrics(0.5, 0.9))))      // coverage up (any strict gain)
    assert(isBetter(Metrics(0.495, 0.2), Some(Metrics(0.5, 0.1))))    // near-tie, precision up
    assert(!isBetter(Metrics(0.495, 0.05), Some(Metrics(0.5, 0.1))))  // near-tie, precision down
    assert(!isBetter(Metrics(0.4, 0.9), Some(Metrics(0.5, 0.1))))     // coverage down
  }

  test("C4 end-to-end: train→eval→register, production pointer moves") {
    val reg = java.nio.file.Files.createTempDirectory("reg").toString
    val inter = (1L to 200L).flatMap(u =>
      Seq((u, u % 13), (u, (u + 1) % 13), (u, (u * 7) % 13)))
      .toDF("user_id", "item_id")
    val registered = ModelRegistry.trainEvalRegister(spark, inter, reg, "v1")
    assert(registered)
    assert(ModelRegistry.productionVersion(reg) === Some("v1"))
    val sim = spark.read.parquet(s"$reg/version=v1/item_similarity")
    assert(sim.count() > 0)
    // same data again: metrics identical → precision not strictly
    // better → not promoted
    val again = ModelRegistry.trainEvalRegister(spark, inter, reg, "v2")
    assert(!again)
    assert(ModelRegistry.productionVersion(reg) === Some("v1"))
  }
}
