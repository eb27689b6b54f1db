package graft.operators

import graft.queries.RelationalQueries.Q
import graft.queries.Tables
import org.apache.spark.sql.functions._

/** Time-window aggregation over the event stream table — the batch form of
  * the Structured Streaming pipeline in [[graft.streaming]] (same grouping
  * logic; the streaming variant adds a watermark and runs incrementally).
  * Buckets are computed in integral epoch-µs arithmetic so the DuckDB
  * oracle matches exactly (see [[Tables.events]] for the ns-unit story).
  */
object EventWindows {

  private val HourUs = 3600L * 1000000L

  val hourly: Q = Q(
    "ev_window_hourly",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select(expr(s"((ts div 1000) div $HourUs) * $HourUs").as("window_start_us"),
          $"event_type", $"value")
        .groupBy($"window_start_us", $"event_type")
        .agg(count(lit(1)).as("n"),
          Tables.asDec(sum(Tables.dec2($"value")), 2).as("total_value"))
        .orderBy($"window_start_us", $"event_type")
    },
    Some(s"""SELECT (epoch_us(ts) // $HourUs) * $HourUs AS window_start_us,
      event_type, count(*) AS n,
      CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total_value
      FROM events GROUP BY 1, 2 ORDER BY window_start_us, event_type"""))

  val all: Seq[Q] = Seq(hourly)
}
