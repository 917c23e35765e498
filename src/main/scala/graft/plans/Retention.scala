package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Partition retention (vacuum) for date-partitioned parquet tables —
  * the lifecycle half of the medallion lake: bronze keeps N days,
  * silver/gold keep longer, and the reaper must (a) report before it
  * deletes, (b) delete whole partitions only, (c) never touch data
  * newer than the cutoff. Operates on the FILESYSTEM LISTING of
  * `date=…` partition directories — O(partitions), never a data
  * scan, which is what makes retention affordable on a 100 TB table
  * (the same listing a metastore `DROP PARTITION` would use).
  */
object Retention {

  final case class PartitionInfo(date: String, nFiles: Long, bytes: Long)

  private def listPartitions(spark: SparkSession, dir: String)
  : Seq[PartitionInfo] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("date="))
      .map { s =>
        val files = fs.listStatus(s.getPath).toSeq.filter(_.isFile)
        PartitionInfo(s.getPath.getName.stripPrefix("date="),
          files.size.toLong, files.map(_.getLen).sum)
      }
      .sortBy(_.date)
  }

  /** Dry-run report: the partitions strictly older than `cutoff`
    * (ISO date string — lexicographic order IS date order for the
    * `date=yyyy-MM-dd` layout), with file/byte counts.
    */
  def expired(spark: SparkSession, dir: String, cutoff: String): DataFrame = {
    import spark.implicits._
    listPartitions(spark, dir).filter(_.date < cutoff)
      .toDF("date", "n_files", "bytes")
  }

  /** Delete the expired partitions (whole directories); returns the
    * deleted partition values. Idempotent — a second run deletes
    * nothing. Refuses a blank cutoff rather than emptying the table.
    */
  def vacuum(spark: SparkSession, dir: String, cutoff: String): Seq[String] = {
    require(cutoff.nonEmpty, "refusing to vacuum with an empty cutoff")
    val victims = listPartitions(spark, dir).filter(_.date < cutoff)
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    victims.map { v =>
      fs.delete(new Path(dir, s"date=${v.date}"), true)
      v.date
    }
  }
}
