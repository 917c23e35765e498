package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine operator exposed through the driver contract:
  * a Spark program plus (when SQL-expressible) the equivalent DuckDB
  * oracle SQL over the same parquet tables. Keeping both side by side
  * in each module is what keeps column names/types in lockstep — the
  * driver's compare sorts columns by name and hashes values.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
