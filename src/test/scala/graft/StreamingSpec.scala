package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming ≡ batch: the windowed aggregation produces the same rows
  * whether fed incrementally through a MemoryStream (with watermark)
  * or as one batch.
  */
class StreamingSpec extends SparkSpec {

  test("windowedAgg streaming matches batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val rows = (0 until 200).map { i =>
      (i.toLong * 90L * 1000000000L, if (i % 3 == 0) "click" else "view", i.toDouble / 10)
    } // 90s apart → spans 5 hours
    val schema = Seq("ts", "event_type", "value")

    val mem = MemoryStream[(Long, String, Double)]
    val streamDf = mem.toDF().toDF(schema: _*)
    val q = EventStreams.windowedAgg(streamDf, Some("1 hour"))
      .writeStream.format("memory").queryName("agg_out").outputMode("complete").start()
    mem.addData(rows.take(100): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(100): _*)
    q.processAllAvailable()
    val streamed = spark.table("agg_out")
      .orderBy("wstart", "event_type")
      .collect().map(_.toSeq).toSeq
    q.stop()

    val batch = EventStreams.windowedAgg(rows.toDF(schema: _*))
      .orderBy("wstart", "event_type")
      .collect().map(_.toSeq).toSeq

    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
