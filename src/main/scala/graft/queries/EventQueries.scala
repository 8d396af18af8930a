package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Engine
import QDef.q

/** Event-time windowing over the `events` table — the batch twins of the
  * Structured Streaming surface (SURVEY §2.7). Hive's only comparable
  * primitive is the `tumbling_window` scalar
  * (ref udf/generic/GenericUDFTumbledWindow.java); sliding/session windows and
  * dedup are capability extensions expressed with Spark's native
  * window()/session_window(). The same expressions run unchanged under
  * readStream (see graft.streaming and its spec).
  */
object EventQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(spark, dir, name)

  val defs: Seq[QDef] = Seq(

    q("e01_tumbling_window",
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type, count(*) AS n, CAST(sum(CAST(value AS DECIMAL(25,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "events")
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"), Exact.dsum($"value").as("total"))
        .select(date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
          $"event_type", $"n", $"total")
        .orderBy($"window_start", $"event_type")
    },

    // Sliding window: each event lands in two 1h windows 30m apart.
    q("e02_sliding_window",
      """SELECT strftime(time_bucket(INTERVAL '30 minutes', ts)
        |    - k * INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S') AS window_start,
        |  count(*) AS n, CAST(sum(CAST(value AS DECIMAL(25,2))) AS DOUBLE) AS total
        |FROM events, (VALUES (0), (1)) o(k)
        |GROUP BY 1 ORDER BY window_start""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "events")
        .groupBy(window($"ts", "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("n"), Exact.dsum($"value").as("total"))
        .select(date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
          $"n", $"total")
        .orderBy($"window_start")
    },

    // Session windows (gap 5 min). Spark closes a session when the next event
    // is >= gap after the previous one; the oracle sessionizes with
    // lag + running flag-sum, the classic SQL formulation.
    q("e03_session_window",
      """WITH g AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |         >= INTERVAL '5 minutes' THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |s AS (SELECT user_id, ts, value,
        |  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM g)
        |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  count(*) AS n, CAST(sum(CAST(value AS DECIMAL(25,2))) AS DOUBLE) AS total
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "events")
        .groupBy(session_window($"ts", "5 minutes"), $"user_id")
        .agg(count(lit(1)).as("n"), Exact.dsum($"value").as("total"))
        .select($"user_id",
          date_format($"session_window.start", "yyyy-MM-dd HH:mm:ss").as("session_start"),
          $"n", $"total")
        .orderBy($"user_id", $"session_start")
    },

    // Deterministic dedup: first event per (user, type) — batch analog of
    // streaming dropDuplicates.
    q("e04_dedup_first_event",
      """SELECT user_id, event_type, event_id AS first_event_id FROM (
        |  SELECT user_id, event_type, event_id,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val w = Window.partitionBy($"user_id", $"event_type").orderBy($"ts", $"event_id")
      t(spark, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_type", $"event_id".as("first_event_id"))
        .orderBy($"user_id", $"event_type")
    },

    q("e05_daily_stats",
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
        |  count(*) AS n, CAST(sum(CAST(value AS DECIMAL(25,2))) AS DOUBLE) AS total, CAST((CAST(sum(CAST(value AS DECIMAL(25,2)))*10000 AS HUGEINT)*2 + count(*)) // (2*count(*)) AS DOUBLE)/10000.0 AS avg_v,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "events")
        .groupBy(date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("day"), $"event_type")
        .agg(count(lit(1)).as("n"), Exact.dsum($"value").as("total"),
          Exact.davg($"value").as("avg_v"),
          countDistinct($"user_id").as("n_users"))
        .orderBy($"day", $"event_type")
    },

    // Ordered funnel conversion (view -> click -> purchase by earliest
    // occurrence per user): one shuffle keyed by user, conditional min
    // aggregation — the sessionized-funnel shape Hive answers with PTFs.
    q("e06_funnel",
      """WITH s AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
        |    min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
        |  FROM events GROUP BY user_id)
        |SELECT count(*) AS n_users,
        |  CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS viewed,
        |  CAST(sum(CASE WHEN t_click > t_view THEN 1 ELSE 0 END) AS BIGINT) AS clicked_after,
        |  CAST(sum(CASE WHEN t_click > t_view AND t_buy > t_click THEN 1 ELSE 0 END) AS BIGINT) AS purchased_after
        |FROM s""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "events")
        .groupBy($"user_id")
        .agg(
          min(when($"event_type" === "view", $"ts")).as("t_view"),
          min(when($"event_type" === "click", $"ts")).as("t_click"),
          min(when($"event_type" === "purchase", $"ts")).as("t_buy"))
        .agg(count(lit(1)).as("n_users"),
          sum(when($"t_view".isNotNull, 1).otherwise(0)).cast("long").as("viewed"),
          sum(when($"t_click" > $"t_view", 1).otherwise(0)).cast("long").as("clicked_after"),
          sum(when($"t_click" > $"t_view" && $"t_buy" > $"t_click", 1).otherwise(0))
            .cast("long").as("purchased_after"))
    },

    // matchpath PTF over real event streams: per-user runs of small-value
    // events ending in a large one ("browse+ then buy" shape). For THIS
    // pattern (SMALL.SMALL+.BIG, greedy, non-overlapping, every row SMALL
    // or BIG) the matcher's semantics reduce to gaps-and-islands SQL — a
    // maximal SMALL run of length L>=2 whose next row is BIG is exactly one
    // match of length L+1 — so the streaming matcher is verified cell-level
    // against a DuckDB oracle, not just rows-only. The order key is a
    // (ts, event_id) composite so ties can't flip match boundaries.
    q("e07_matchpath",
      """WITH ev AS (
        |  SELECT CAST(user_id AS VARCHAR) AS pk,
        |    epoch_ns(ts) // 1000 * 1000 + event_id % 1000 AS ord,
        |    value < 50 AS small
        |  FROM events),
        |r AS (SELECT pk, ord, small,
        |    row_number() OVER (PARTITION BY pk ORDER BY ord) AS rn
        |  FROM ev),
        |isl AS (SELECT pk, ord, rn,
        |    rn - row_number() OVER (PARTITION BY pk, small ORDER BY rn) AS grp
        |  FROM r WHERE small),
        |runs AS (SELECT pk, grp, min(ord) AS run_start, max(rn) AS run_end,
        |    count(*) AS run_len
        |  FROM isl GROUP BY pk, grp),
        |m AS (SELECT runs.pk, runs.run_start AS start_ord,
        |    big.ord AS end_ord, runs.run_len + 1 AS match_len
        |  FROM runs JOIN r big
        |    ON big.pk = runs.pk AND big.rn = runs.run_end + 1 AND NOT big.small
        |  WHERE runs.run_len >= 2)
        |SELECT pk, count(*) AS n_matches,
        |  CAST(max(match_len) AS INT) AS longest,
        |  min(start_ord) AS first_start
        |FROM m GROUP BY pk ORDER BY pk""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ev = t(spark, dir, "events")
        .withColumn("ord", unix_micros($"ts") * 1000L + pmod($"event_id", lit(1000L)))
      graft.operators.MatchPath.matchpath(ev, "user_id", "ord",
        Seq("SMALL" -> ($"value" < 50.0), "BIG" -> ($"value" >= 50.0)),
        "SMALL.SMALL+.BIG")
        .groupBy($"pk")
        .agg(count(lit(1)).as("n_matches"), max($"match_len").as("longest"),
          min($"start_ord").as("first_start"))
        .orderBy($"pk")
    },

    // Stream-stream event-time range join (click attribution): the batch
    // twin of Streams.clickAttribution — same helper, same plan shape (one
    // shuffle keyed on user_id, range predicate as a sort-merge residual).
    // StreamsSpec pins stream == batch on this exact frame; the DuckDB
    // oracle pins batch == SQL semantics, so the streaming operator is
    // transitively under the cell-level gate.
    q("e08_stream_stream_join",
      """SELECT c.user_id AS user_id, c.event_id AS click_id,
        |  p.event_id AS purchase_id,
        |  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
        |FROM events c JOIN events p ON c.user_id = p.user_id
        |  AND c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 6 HOUR
        |ORDER BY user_id, click_id, purchase_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ev = t(spark, dir, "events")
      graft.streaming.Streams.clickAttribution(
          ev.filter($"event_type" === "click"),
          ev.filter($"event_type" === "purchase"))
        .select($"user_id", $"click_id", $"purchase_id",
          date_format($"click_ts", "yyyy-MM-dd HH:mm:ss").as("click_ts"),
          date_format($"purchase_ts", "yyyy-MM-dd HH:mm:ss").as("purchase_ts"))
        .orderBy($"user_id", $"click_id", $"purchase_id")
    },

    // Left-outer attribution funnel: every click emits — matched or with
    // NULL purchase columns (the watermark-driven outer stream join; see
    // Streams.attributionFunnel). Batch twin == plain LEFT JOIN, which the
    // oracle replays; NULL sort keys are coalesced on BOTH sides so row
    // order hashes identically across engines.
    q("e09_stream_outer_join",
      """SELECT c.user_id AS user_id, c.event_id AS click_id,
        |  p.event_id AS purchase_id,
        |  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id
        |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 6 HOUR
        |ORDER BY user_id, click_id, coalesce(purchase_id, -1)""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val ev = t(spark, dir, "events")
      graft.streaming.Streams.attributionFunnel(
          ev.filter($"event_type" === "click"),
          ev.filter($"event_type" === "purchase"))
        .select($"user_id", $"click_id", $"purchase_id",
          date_format($"click_ts", "yyyy-MM-dd HH:mm:ss").as("click_ts"),
          date_format($"purchase_ts", "yyyy-MM-dd HH:mm:ss").as("purchase_ts"))
        .orderBy($"user_id", $"click_id", coalesce($"purchase_id", lit(-1L)))
    },
  )
}
