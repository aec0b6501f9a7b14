package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators: the incremental-ingest extension of the
  * batch engine (the reference itself is batch-import + point queries —
  * SURVEY.md §2.7 notes streaming as an extension; these are the windowed
  * and stateful shapes a production ingest of the pages table needs).
  */
object StreamOps {

  /** Tumbling 5-minute windowed aggregate over a streaming events source —
    * identical semantics to the batch Relational.q06EventsWindow. */
  def eventsWindowStream(events: DataFrame): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp")) // NTZ → TIMESTAMP for watermarks
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 3).as("sum_value"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  final case class UserCount(user_id: Long, n: Long)

  /** Stateful running per-user event count via mapGroupsWithState —
    * the custom-state shape (KeyValueGroupedDataset) for streaming ER
    * (e.g. incremental cluster membership). */
  def userCountsStream(spark: SparkSession, events: DataFrame): Dataset[UserCount] = {
    import spark.implicits._
    events.select(col("user_id").cast("long").as("user_id")).as[Long]
      .groupByKey(identity)
      .mapGroupsWithState[Long, UserCount](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + rows.size
          state.update(total)
          UserCount(user, total)
      }
  }

  /** Run a streaming DataFrame from a parquet-backed file stream to a
    * memory sink synchronously; returns the sink table name. */
  def runToMemory(spark: SparkSession, stream: DataFrame, name: String,
      mode: OutputMode): Unit = {
    val q = stream.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
