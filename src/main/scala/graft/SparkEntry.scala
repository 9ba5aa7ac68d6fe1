package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.EtlOps.RichDF
import graft.ops.{AsofJoin, Dates, Names, Rules}
import graft.text.{SimHash, TextFunctions => TF}
import graft.dedup.Dedup
import graft.sim.Similarity

/** Driver contract: one `queries` entry (+ DuckDB `oracleSql`) per
  * operator in SURVEY.md §2.
  *
  * Oracle-parity rules (SURVEY §5): identical output column names and
  * aliases on both sides, explicit ORDER BY on a unique key, money
  * sums through DECIMAL(18,2), no raw ns timestamps in outputs, and
  * every shared hash is md5-derived (DuckDB: `('0x'||substr(md5(x),
  * 1,15))::BIGINT` ≡ Spark `conv(substring(md5(x),1,15),16,10)`).
  */
object SparkEntry {

  // ---------------------------------------------------------------- helpers

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** decimal(18,2) cast used identically on both engines for money. */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** The analog input frame for the reference's healthcare columns,
    * derived deterministically from lineitem ⨝ orders: FACTURA ←
    * orderkey, SERVICIO ← partkey%1000, tipologia ← partkey%11 bucket,
    * AMBITO ← orderpriority, CANT ← quantity. Gives the reference's
    * rule queries realistic grouping/skew without synthesizing data. */
  private def sendas(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val ord = t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select(
        li("l_orderkey").as("factura"),
        li("l_linenumber").as("linea"),
        format_string("%03d", li("l_partkey") % 1000).as("servicio"),
        element_at(
          array(Seq("C1", "C4", "C5", "C7", "C8", "HD", "ARI", "RM",
            "Qx1", "Qx2", "H1").map(lit): _*),
          (li("l_partkey") % 11 + 1).cast("int")).as("tipologia"),
        when(ord("o_orderpriority").startsWith("1") ||
             ord("o_orderpriority").startsWith("2"), "CONSULTA EXTERNA")
          .otherwise("HOSPITALIZADO").as("ambito"),
        li("l_quantity").cast("long").as("cant"),
        concat(lit("PGP-"), ord("o_orderpriority")).as("cod_plan"),
        to_date(li("l_shipdate")).as("fec_servicio"))
  }

  /** Same construction as SQL, for the oracle side. */
  private val sendasSql: String = """
    SELECT l_orderkey AS factura, l_linenumber AS linea,
           printf('%03d', l_partkey % 1000) AS servicio,
           (['C1','C4','C5','C7','C8','HD','ARI','RM','Qx1','Qx2','H1'])
             [CAST(l_partkey % 11 + 1 AS INT)] AS tipologia,
           CASE WHEN o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%'
                THEN 'CONSULTA EXTERNA' ELSE 'HOSPITALIZADO' END AS ambito,
           CAST(l_quantity AS BIGINT) AS cant,
           'PGP-' || o_orderpriority AS cod_plan,
           CAST(l_shipdate AS DATE) AS fec_servicio
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey"""

  // ---------------------------------------------------------------- entry

  /** Flagship: the 6-way star join (TPC-H Q5 shape) on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    queries("q5_multijoin")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    analyticsQueries ++ etlQueries ++ llmQueries

  def oracleSql: Map[String, String] =
    analyticsOracle ++ etlOracle ++ llmOracle

  // ======================================================== analytics 13-24

  private def analyticsQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // 13: TPC-H Q1 shape — partial aggregation (map-side combine) does
    // the heavy lifting; one shuffle on the tiny group key.
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dec(sum(dec(col("l_quantity")))).as("sum_qty"),
          dec(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
          dec(round(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))), 2))
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty",
          round(col("sum_qty").cast("double") / col("count_order"), 2))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // 14: TPC-H Q3 shape — two shuffle joins on keys + agg + top-N.
    "q3_join_agg" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-03-15"))
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1995-03-15"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(l("l_orderkey"), o("o_orderdate").cast("date").as("o_orderdate"))
        .agg(dec(round(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))), 2))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // 15: TPC-H Q5 shape — dims broadcast, facts shuffle once each.
    "q5_multijoin" -> ((s, dir) => {
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = t(s, dir, "nation")
      val cu = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
                col("o_orderdate") < lit("1998-01-01"))
      val l = t(s, dir, "lineitem")
      val su = t(s, dir, "supplier")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(su, l("l_suppkey") === su("s_suppkey"))
        .join(cu, o("o_custkey") === cu("c_custkey") &&
                  cu("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(n("n_name"))
        .agg(dec(round(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))), 2))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // 16: rank + running sum windows per customer.
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          rank().over(w).as("rnk"),
          dec(sum(dec(col("o_totalprice"))).over(wsum)).as("running_spend"))
        .filter(col("rnk") <= 3)
        .orderBy("o_custkey", "rnk", "o_orderkey")
    }),

    // 17: top-k per group via row_number.
    "q_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
      t(s, dir, "part")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select("p_brand", "rn", "p_partkey", "p_name")
        .orderBy("p_brand", "rn")
    }),

    // 18: GROUP BY ROLLUP multi-level aggregates.
    "q_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dec(sum(dec(col("l_extendedprice")))).as("sum_price"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // 19: UNION ALL + EXCEPT composition over customer segments.
    "q_set_ops" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val big = c.filter(col("c_acctbal") > 5000).select("c_custkey")
      val building = c.filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val both = big.intersect(building).withColumn("src", lit("both"))
      val onlyBig = big.except(building).withColumn("src", lit("big_only"))
      both.unionAll(onlyBig).orderBy("src", "c_custkey")
    }),

    // 20: pivot event_type → count columns (portable CASE form).
    "q_pivot" -> ((s, dir) => {
      val e = t(s, dir, "events")
      e.groupBy(col("user_id"))
        .agg(
          sum(when(col("event_type") === "click", 1).otherwise(0)).as("n_click"),
          sum(when(col("event_type") === "view", 1).otherwise(0)).as("n_view"),
          sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("n_purchase"),
          sum(when(col("event_type") === "signup", 1).otherwise(0)).as("n_signup"),
          sum(when(col("event_type") === "error", 1).otherwise(0)).as("n_error"))
        .orderBy("user_id")
    }),

    // 21: JSON field extraction from event props.
    "q_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .filter(col("k") > 50)
        .orderBy("event_id")
    }),

    // 22: tumbling time-window aggregation over events.
    "q_time_bucket" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).cast("date").as("day"),
          hour(date_trunc("hour", col("ts"))).as("hr"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          dec(sum(dec(col("value")))).as("sum_value"))
        .orderBy("day", "hr", "event_type")
    }),

    // 23: gap-based sessionization — lag + cumulative sum of session
    // starts, then per-session aggregates. Two windows over the same
    // (user) partitioning → one shuffle.
    "q_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val e = t(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) >
              lit(1800L * 1000000L), 1).otherwise(0))
        .withColumn("sess_id", sum(col("new_sess"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      e.groupBy(col("user_id"), col("sess_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("event_id")).as("first_event"))
        .orderBy("user_id", "sess_id")
    }),

    // 24: as-of join — most recent order ≤ event day per user.
    "q_asof_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), to_date(col("ts")).as("d"))
      val o = t(s, dir, "orders")
        .groupBy(col("o_custkey"), to_date(col("o_orderdate")).as("od"))
        .agg(max(col("o_orderkey")).as("last_orderkey"))
      AsofJoin.asof(e, o, "user_id", "o_custkey", "d", "od",
          Seq("last_orderkey"))
        .select(col("event_id"), col("user_id"), col("last_orderkey"))
        .orderBy("event_id")
    }))

  private def analyticsOracle: Map[String, String] = Map(
    "q1_agg" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_base_price,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DECIMAL(18,2)) AS sum_disc_price,
             count(*) AS count_order,
             round(CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) / count(*), 2) AS avg_qty
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",
    "q3_join_agg" -> """
      SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DECIMAL(18,2)) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-03-15'
        AND l_shipdate  > TIMESTAMP '1995-03-15'
      GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
      ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q5_multijoin" -> """
      SELECT n_name,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DECIMAL(18,2)) AS revenue
      FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
                    JOIN supplier ON l_suppkey  = s_suppkey
                    JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
                    JOIN nation   ON s_nationkey = n_nationkey
                    JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
      GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "q_window_rank" -> """
      SELECT * FROM (
        SELECT o_orderkey, o_custkey,
               rank() OVER w AS rnk,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                 OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DECIMAL(18,2)) AS running_spend
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
      WHERE rnk <= 3 ORDER BY o_custkey, rnk, o_orderkey""",
    "q_topk_per_group" -> """
      SELECT p_brand, rn, p_partkey, p_name FROM (
        SELECT p_brand, p_partkey, p_name,
               row_number() OVER (PARTITION BY p_brand
                 ORDER BY p_retailprice DESC, p_partkey) AS rn
        FROM part)
      WHERE rn <= 5 ORDER BY p_brand, rn""",
    "q_rollup" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_price,
             count(*) AS n_rows
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "q_set_ops" -> """
      WITH big AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
           building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      SELECT c_custkey, 'both' AS src FROM (SELECT * FROM big INTERSECT SELECT * FROM building)
      UNION ALL
      SELECT c_custkey, 'big_only' AS src FROM (SELECT * FROM big EXCEPT SELECT * FROM building)
      ORDER BY src, c_custkey""",
    "q_pivot" -> """
      SELECT user_id,
             sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END)::BIGINT AS n_click,
             sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END)::BIGINT AS n_view,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n_purchase,
             sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END)::BIGINT AS n_signup,
             sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END)::BIGINT AS n_error
      FROM events GROUP BY user_id ORDER BY user_id""",
    "q_json_extract" -> """
      SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
      ORDER BY event_id""",
    "q_time_bucket" -> """
      SELECT CAST(date_trunc('hour', ts) AS DATE) AS day,
             CAST(hour(date_trunc('hour', ts)) AS INT) AS hr, event_type,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_value
      FROM events
      GROUP BY 1, 2, 3 ORDER BY day, hr, event_type""",
    "q_sessionize" -> """
      WITH g AS (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP))
                            > 1800 * 1000000 THEN 1 ELSE 0 END AS new_sess
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      s AS (
        SELECT user_id, event_id,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        FROM g)
      SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
             count(*) AS n_events, min(event_id) AS first_event
      FROM s GROUP BY user_id, sess_id ORDER BY user_id, sess_id""",
    "q_asof_join" -> """
      WITH e AS (SELECT event_id, user_id, CAST(ts AS DATE) AS d FROM events),
           o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS od,
                        max(o_orderkey) AS last_orderkey
                 FROM orders GROUP BY 1, 2)
      SELECT e.event_id, e.user_id, o.last_orderkey
      FROM e ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.d >= o.od
      ORDER BY event_id""")

  // ======================================================== ETL rows 1-12

  private def etlQueries: Map[String, (SparkSession, String) => DataFrame] = Map.empty
  private def etlOracle: Map[String, String] = Map.empty

  // ======================================================== LLM rows 25-35

  private def llmQueries: Map[String, (SparkSession, String) => DataFrame] = Map.empty
  private def llmOracle: Map[String, String] = Map.empty
}
