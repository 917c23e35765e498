package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** ST21: the state data source — Spark 4's offline window into a
  * streaming checkpoint: `spark.read.format("statestore")` reads a
  * stateful operator's live state WITHOUT replaying the stream, the
  * ops surface for "what does the detector currently believe"
  * debugging, state-size audits, and migration validation. Proven on
  * both state shapes the engine uses: a built-in streaming
  * aggregation and a transformWithState ValueState variable (the
  * CUSUM carry), read back by stateVarName.
  */
class StateReaderSpec extends SparkSpec {

  import spark.implicits._

  test("aggregation state reads back offline with current counts") {
    implicit val sc = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("srckpt").toString
    val in = MemoryStream[(String, Long)]
    val q = in.toDF().toDF("k", "v").groupBy("k").count()
      .writeStream.format("memory").queryName("sr_agg_out")
      .outputMode("complete")
      .option("checkpointLocation", ckpt).start()
    in.addData(("a", 1L), ("a", 2L), ("b", 5L)); q.processAllAvailable()
    in.addData(("a", 3L)); q.processAllAvailable()
    q.stop()

    val state = spark.read.format("statestore").load(ckpt)
    // (key struct, value buffer struct) rows; the buffer's field name
    // is operator-internal — address positionally after flattening
    val kv = state.select(col("key.*"), col("value.*")).collect()
    val got = kv.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 3L, "b" -> 1L))
  }

  test("transformWithState carry (cusum) reads back by stateVarName") {
    implicit val sc = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files
        .createTempDirectory("srckpt2").toString
      def rows(counts: Seq[(Int, Int)]) = counts.flatMap { case (b, c) =>
        (0 until c).map(i => BucketEvent("shift", b.toLong * 1000L + i))
      }
      val in = MemoryStream[BucketEvent]
      val q = StatefulOps.cusumStream(in.toDS(), refn = 2L, refs = 4L,
          bucketUs = 1000L)
        .writeStream.format("memory").queryName("sr_cusum_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt).start()
      // buckets 0 (n=2), 1 (n=4), open bucket 2 (n=1):
      // y0 = 2*2-4-2 = -2 -> cs=-2, lo=-2; y1 = 4*2-4-2 = 2 -> cs=0,
      // lo=-2; bucket 2 stays open with openN=1
      in.addData(rows(Seq(0 -> 2, 1 -> 4, 2 -> 1)): _*)
      q.processAllAvailable()
      q.stop()

      val state = spark.read.format("statestore")
        .option("stateVarName", "carry").load(ckpt)
      val carry = state.select(
          col("key").getField("value").as("k"),
          col("value").getField("open").as("open"),
          col("value").getField("openN").as("openN"),
          col("value").getField("cs").as("cs"),
          col("value").getField("lo").as("lo"))
        .as[(String, Long, Long, Long, Long)].collect()
      assert(carry.toSeq === Seq(("shift", 2L, 1L, 0L, -2L)))
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
