package graft.operators

import graft.Q
import graft.promql.PromQL
import org.apache.spark.sql.functions._

/** PromQL range queries over the events time series (reference
  * server/.../GetPromQLQueryRangeHandler.java — SURVEY's one deferred
  * front-end, now closed). Each Spark side parses REAL PromQL text and
  * evaluates it with the explode-to-covering-steps plan; the DuckDB
  * oracle replays the same window semantics with a generate_series step
  * grid joined to the raw samples.
  */
object PromQLOps {

  val all: Seq[Q] = Seq(

    // ---- sliding-window sum, label-matched, aggregated by one label ----
    Q("q_promql_range_sum",
      """WITH steps AS (SELECT UNNEST(generate_series(
        |    TIMESTAMP '2024-01-02', TIMESTAMP '2024-01-08', INTERVAL 6 HOUR)) AS t)
        |SELECT s.t AS t, e.event_type,
        |  sum(e.value::DECIMAL(28,4))::DOUBLE AS value
        |FROM steps s JOIN events e
        |  ON e.ts > s.t - INTERVAL 12 HOUR AND e.ts <= s.t
        |WHERE e.event_type <> 'signup'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      PromQL.rangeQuery(s, d,
        """sum by (event_type) (sum_over_time(events{event_type!="signup"}[12h]))""",
        "2024-01-02 00:00:00", "2024-01-08 00:00:00", 6 * 3600)
        .orderBy("t", "event_type")
    },

    // ---- rate(): counter increase / window over per-series samples ----
    Q("q_promql_rate",
      """WITH steps AS (SELECT UNNEST(generate_series(
        |    TIMESTAMP '2024-01-02', TIMESTAMP '2024-01-05', INTERVAL 12 HOUR)) AS t)
        |SELECT s.t AS t, e.event_type, e.user_id,
        |  (arg_max(e.value, e.ts) - arg_min(e.value, e.ts)) / 86400 AS value
        |FROM steps s JOIN events e
        |  ON e.ts > s.t - INTERVAL 24 HOUR AND e.ts <= s.t
        |WHERE e.event_type = 'purchase'
        |GROUP BY 1, 2, 3 ORDER BY 1, 3""".stripMargin) { (s, d) =>
      PromQL.rangeQuery(s, d,
        """rate(events{event_type="purchase"}[24h])""",
        "2024-01-02 00:00:00", "2024-01-05 00:00:00", 12 * 3600)
        .orderBy("t", "user_id")
    },

    // ---- instant vector (bare selector = one-step last_over_time
    //      lookback) combined with a scalar operator ----
    Q("q_promql_instant",
      """WITH steps AS (SELECT UNNEST(generate_series(
        |    TIMESTAMP '2024-01-02', TIMESTAMP '2024-01-04', INTERVAL 6 HOUR)) AS t)
        |SELECT s.t AS t, e.event_type, e.user_id,
        |  arg_max(e.value, e.ts) * 2 AS value
        |FROM steps s JOIN events e
        |  ON e.ts > s.t - INTERVAL 6 HOUR AND e.ts <= s.t
        |WHERE e.event_type = 'error'
        |GROUP BY 1, 2, 3 ORDER BY 1, 3""".stripMargin) { (s, d) =>
      PromQL.rangeQuery(s, d,
        """events{event_type="error"} * 2""",
        "2024-01-02 00:00:00", "2024-01-04 00:00:00", 6 * 3600)
        .orderBy("t", "user_id")
    }
  )
}
