package graft

import org.apache.spark.sql.functions._

/** Tables.registerAll makes the whole table surface reachable
  * through plain `spark.sql` — the front door a reference (DuckDB)
  * user expects. Views must be lazy, pushdown-capable, and agree
  * with the DataFrame route. */
class SqlFrontDoorSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("registerAll exposes every table to spark.sql with pushdown intact") {
    Tables.registerAll(spark, dir)
    Tables.all.foreach { name =>
      assert(spark.catalog.tableExists(name), s"view $name missing")
    }
    val viaSql = spark.sql(
      """SELECT o_orderpriority, count(*) AS n FROM orders
         WHERE o_orderstatus = 'O' GROUP BY 1 ORDER BY 1""")
    val viaDf = Tables(spark, dir, "orders")
      .filter(col("o_orderstatus") === "O")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
    assert(viaSql.collect().toSeq == viaDf.collect().toSeq)
    // the view is a real scan underneath: the filter reaches parquet
    val plan = viaSql.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderstatus)"),
      s"filter not pushed through the view:\n$plan")
    // a 3-table join through SQL names resolves and runs
    val joined = spark.sql(
      """SELECT n_name, count(*) AS n
         FROM customer JOIN nation ON c_nationkey = n_nationkey
                       JOIN region ON n_regionkey = r_regionkey
         GROUP BY n_name ORDER BY n_name""").collect()
    assert(joined.nonEmpty)
  }
}
