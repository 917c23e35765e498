package graft.plans

import graft.operators.{Cleaning, Recommend}
import graft.functions.Functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The daily medallion pipeline as one lazily-planned program per
  * layer (SURVEY §3.1, §2.10; reference dags/daily_pipeline.py) —
  * Airflow task boundaries become function boundaries, and the ONLY
  * materialization points are the layer contracts (bronze/silver/gold
  * parquet), exactly as SURVEY §3.1 prescribes.
  *
  * Semantics preserved from the reference:
  *  - C1 idempotent backfill: every write is
  *    `overwrite`+`partitionBy(date)` with dynamic partition
  *    overwrite, so re-running a day replaces exactly that day;
  *  - C5 empty-day no-op: each stage short-circuits on empty input;
  *  - C2 task chain extract→clean→aggregate→ml→train→eval→register.
  *
  * Scale notes: per-day partition pruning at every read (hive layout);
  * a 1000-executor backfill runs days in parallel driver-side with no
  * cross-day shuffle at all.
  */
object Medallion {

  final case class DayResult(ds: String, extracted: Long, cleaned: Long)

  private def write(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("date").parquet(path)

  /** Bronze: S1 filtered extraction of one day from the order-shaped
    * source + P7 audit columns.
    */
  def extractDay(orders: DataFrame, ds: String): DataFrame =
    orders.filter(to_date(col("order_date")) === lit(ds))
      .withColumn("_ingestion_timestamp", current_timestamp())
      .withColumn("date", lit(ds))

  /** Silver: P2–P6 cleaning. */
  def cleanDay(bronze: DataFrame): DataFrame =
    Cleaning.cleanOrders(bronze)
      .withColumn("_cleaned_timestamp", current_timestamp())

  /** Gold: A1 daily summary + A2 category rollup. */
  def dailySummary(silver: DataFrame, ds: String): DataFrame =
    silver.agg(
      count(lit(1)).as("total_orders"),
      dsum(col("total")).as("total_revenue"),
      countDistinct(col("customer_id")).as("unique_customers"),
      countDistinct(col("product_name")).as("unique_products"))
      .withColumn("date", lit(ds))

  def categoryAgg(silver: DataFrame, ds: String): DataFrame =
    silver.groupBy(col("category"))
      .agg(count(lit(1)).as("order_count"), dsum(col("total")).as("revenue"))
      .withColumn("date", lit(ds))

  /** Copy-on-write MERGE (upsert) over a date-partitioned parquet
    * table — the Delta/Hudi upsert shape without a table format:
    * rewrite ONLY the partitions the updates touch. Existing rows in
    * touched partitions are anti-joined out by key and replaced by /
    * unioned with the update rows; untouched partitions are never
    * read or written (partition pruning bounds the rewrite, which is
    * what makes late-arriving corrections affordable on a 100 TB
    * table).
    *
    * `updates` must carry the partition column `date` and the merge
    * key. The merged frame is localCheckpoint-ed before the write:
    * it materializes off the source files, so the dynamic-partition
    * overwrite isn't rejected as a read-write cycle on `dir`.
    */
  def upsertPartitioned(spark: SparkSession, dir: String,
                        updates: DataFrame, key: String): Unit = {
    val days = updates.select(col("date")).distinct()
      .collect().map(_.getString(0)).toSeq
    if (days.isEmpty) return
    val existing = spark.read.parquet(dir)
      .filter(col("date").isin(days: _*))
    val merged = existing.join(updates.select(col(key)), Seq(key), "left_anti")
      .unionByName(updates)
      .localCheckpoint()
    write(merged, dir)
  }

  /** One day end-to-end, bronze→silver→gold on disk. Idempotent per
    * partition; total on empty days.
    */
  def runDay(source: DataFrame, lakeDir: String, ds: String): DayResult = {
    val bronze = extractDay(source, ds)
    val nB = bronze.count()
    if (nB == 0) return DayResult(ds, 0, 0) // C5: graceful empty day
    write(bronze, s"$lakeDir/bronze/orders")

    val spark = source.sparkSession
    val silver = cleanDay(
      spark.read.parquet(s"$lakeDir/bronze/orders")
        .filter(col("date") === ds))
    val nS = silver.count()
    write(silver, s"$lakeDir/silver/orders")

    val sGold = spark.read.parquet(s"$lakeDir/silver/orders")
      .filter(col("date") === ds)
    write(dailySummary(sGold, ds), s"$lakeDir/gold/daily_summary")
    write(categoryAgg(sGold, ds), s"$lakeDir/gold/category_agg")
    DayResult(ds, nB, nS)
  }
}

/** Versioned parquet model registry (SURVEY §2.1 S6/S7 replacement):
  * the CF model is two long-form tables (item_similarity, id maps
  * implicit in it) written under `models/version=<v>/`, with a
  * `production` pointer file — no pickle, no external tracker. C4's
  * best-model gate decides promotion.
  */
object ModelRegistry {

  final case class Metrics(coverage: Double, precisionAt10: Double)

  /** C4 gate exactly as the reference (daily_pipeline.py:592-604):
    * better coverage wins; a coverage tie within 0.01 falls through
    * to precision.
    */
  def isBetter(candidate: Metrics, best: Option[Metrics]): Boolean =
    best match {
      case None => true
      case Some(b) =>
        candidate.coverage > b.coverage ||
          (math.abs(candidate.coverage - b.coverage) < 0.01 &&
            candidate.precisionAt10 > b.precisionAt10)
    }

  def save(spark: SparkSession, registryDir: String, version: String,
           sim: DataFrame, m: Metrics): Unit = {
    sim.write.mode(SaveMode.Overwrite)
      .parquet(s"$registryDir/version=$version/item_similarity")
    import spark.implicits._
    Seq((version, m.coverage, m.precisionAt10))
      .toDF("version", "coverage", "precision_at_10")
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$registryDir/version=$version/metrics")
  }

  /** Promote: atomically repoint the production alias (tmp+rename). */
  def promote(registryDir: String, version: String): Unit = {
    val dir = new java.io.File(registryDir)
    dir.mkdirs()
    val tmp = new java.io.File(dir, ".production.tmp")
    java.nio.file.Files.writeString(tmp.toPath, version)
    tmp.renameTo(new java.io.File(dir, "production"))
  }

  def productionVersion(registryDir: String): Option[String] = {
    val f = new java.io.File(registryDir, "production")
    if (f.exists()) Some(java.nio.file.Files.readString(f.toPath).trim)
    else None
  }

  def productionMetrics(spark: SparkSession, registryDir: String): Option[Metrics] =
    productionVersion(registryDir).map { v =>
      val r = spark.read.parquet(s"$registryDir/version=$v/metrics")
        .select("coverage", "precision_at_10").head()
      Metrics(r.getDouble(0), r.getDouble(1))
    }

  /** Train→evaluate→conditionally-register, the reference's ML tail
    * (C2/C4) on any interactions frame.
    */
  def trainEvalRegister(spark: SparkSession, interactions: DataFrame,
                        registryDir: String, version: String): Boolean = {
    val train = Recommend.trainSet(interactions)
    val eval_ = Recommend.evalSet(interactions)
    val sim = Recommend.itemSimilarity(train)
    val recs = Recommend.recommend(train, sim)
    val cov = Recommend.coverage(train, eval_).head()
    val prec = Recommend.precisionAtK(recs, eval_).head()
    val m = Metrics(cov.getAs[Double]("overall_coverage"),
      prec.getAs[Double]("avg_precision"))
    val better = isBetter(m, productionMetrics(spark, registryDir))
    if (better) {
      save(spark, registryDir, version, sim, m)
      promote(registryDir, version)
    }
    better
  }
}
