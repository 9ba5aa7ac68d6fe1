package graft.sources

import graft.SparkSpec

/** Persistent SQL views ([[GraftViewRules]] + [[ViewSqlTable]]):
  * CREATE/DROP VIEW against the warehouse metadata, readable from any
  * session that can loadTable, snapshot-consistent per query,
  * time-travel-safe, schema-bound at creation, and loud on drift and
  * recursion. */
class GraftViewSpec extends SparkSpec {
  import spark.implicits._

  private def freshWarehouse(): String = java.nio.file.Files
    .createTempDirectory("graft_views").toString

  private var seq = 0
  private def freshCat(wh: String): String = {
    seq += 1
    val cat = s"gvw$seq"
    GraftCatalog.register(spark, cat, wh)
    cat
  }

  test("CREATE VIEW persists in warehouse metadata; reads follow the table head") {
    val wh = freshWarehouse()
    val cat = freshCat(wh)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $cat.t SELECT id, id * 2 FROM range(1, 6)")
    spark.sql(s"CREATE VIEW $cat.w AS " +
      s"SELECT k, v * 10 AS v10 FROM $cat.t WHERE k > 2")
    assert(spark.sql(s"SELECT * FROM $cat.w ORDER BY k")
      .as[(Long, Long)].collect().toSeq ==
      Seq((3L, 60L), (4L, 80L), (5L, 100L)))
    // the view follows the TABLE head (re-runs its text per query)
    spark.sql(s"INSERT INTO $cat.t VALUES (9, 9)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.w")
      .head.getLong(0) == 4L)
    // PERSISTENT: a fresh catalog registration over the same
    // warehouse (a "new session") still serves it
    val cat2 = freshCat(wh)
    assert(spark.sql(s"SELECT count(*) FROM $cat2.w")
      .head.getLong(0) == 4L)
    // the metadata file is real and named for the view
    assert(java.nio.file.Files.isRegularFile(
      java.nio.file.Paths.get(s"$wh/_views/w.json")))
  }

  test("time-travel-safe: a VERSION AS OF view stays pinned while the head moves") {
    val wh = freshWarehouse()
    val cat = freshCat(wh)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT)")
    spark.sql(s"INSERT INTO $cat.t SELECT id FROM range(1, 4)") // v1
    spark.sql(s"CREATE VIEW $cat.pinned AS " +
      s"SELECT k FROM $cat.t VERSION AS OF 1")
    spark.sql(s"INSERT INTO $cat.t SELECT id FROM range(10, 20)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.pinned")
      .head.getLong(0) == 3L, "the pinned view must not see v2")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t")
      .head.getLong(0) == 13L)
  }

  test("OR REPLACE re-binds; IF NOT EXISTS no-ops; plain re-create is loud; DROP works") {
    val wh = freshWarehouse()
    val cat = freshCat(wh)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT)")
    spark.sql(s"INSERT INTO $cat.t VALUES (1), (2), (3)")
    spark.sql(s"CREATE VIEW $cat.w AS SELECT k FROM $cat.t")
    intercept[Exception] {
      spark.sql(s"CREATE VIEW $cat.w AS SELECT k + 1 AS k FROM $cat.t")
    }
    spark.sql(s"CREATE VIEW IF NOT EXISTS $cat.w AS " +
      s"SELECT k + 100 AS k FROM $cat.t") // no-op: exists
    assert(spark.sql(s"SELECT max(k) FROM $cat.w").head.getLong(0) == 3L)
    spark.sql(s"CREATE OR REPLACE VIEW $cat.w AS " +
      s"SELECT k * 10 AS k10 FROM $cat.t")
    assert(spark.sql(s"SELECT max(k10) FROM $cat.w")
      .head.getLong(0) == 30L)
    spark.sql(s"DROP VIEW $cat.w")
    intercept[Exception] { spark.sql(s"SELECT * FROM $cat.w") }
    // DROP of a missing view: loud without IF EXISTS, silent with
    intercept[Exception] { spark.sql(s"DROP VIEW $cat.w") }
    spark.sql(s"DROP VIEW IF EXISTS $cat.w")
  }

  test("schema binding at creation: drifted underlying query is loud, not silently re-shaped") {
    val wh = freshWarehouse()
    val cat = freshCat(wh)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 10)")
    spark.sql(s"CREATE VIEW $cat.w AS SELECT * FROM $cat.t")
    assert(spark.sql(s"SELECT * FROM $cat.w").count() == 1L)
    // widen the underlying SELECT * by adding a column: arity drift
    spark.sql(s"ALTER TABLE $cat.t ADD COLUMN extra STRING")
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.w").collect()
    }
    assert(e.getMessage.contains("CREATE OR REPLACE"), e.getMessage)
    // re-bind picks up the new shape
    spark.sql(s"CREATE OR REPLACE VIEW $cat.w AS SELECT * FROM $cat.t")
    assert(spark.sql(s"SELECT * FROM $cat.w").columns.toSeq ==
      Seq("k", "v", "extra"))
  }

  test("views over views compose; a recursive definition is loud; table-name collisions refused") {
    val wh = freshWarehouse()
    val cat = freshCat(wh)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT)")
    spark.sql(s"INSERT INTO $cat.t VALUES (1), (2), (3), (4)")
    spark.sql(s"CREATE VIEW $cat.evens AS " +
      s"SELECT k FROM $cat.t WHERE k % 2 = 0")
    spark.sql(s"CREATE VIEW $cat.big_evens AS " +
      s"SELECT k FROM $cat.evens WHERE k > 2")
    assert(spark.sql(s"SELECT k FROM $cat.big_evens")
      .as[Long].collect().toSeq == Seq(4L))
    // recursion: re-bind evens to read big_evens -> cycle, loud
    spark.sql(s"CREATE OR REPLACE VIEW $cat.evens AS " +
      s"SELECT k FROM $cat.big_evens")
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.evens").collect()
    }
    assert(e.getMessage.contains("recursive"), e.getMessage)
    // a view may not shadow an existing table
    val e2 = intercept[Exception] {
      spark.sql(s"CREATE VIEW $cat.t AS SELECT 1 AS one")
    }
    assert(e2.getMessage.toLowerCase.contains("already exists"),
      e2.getMessage)
  }

  test("SHOW VIEWS lists warehouse views; LIKE filters; ALTER VIEW AS re-binds") {
    val wh = freshWarehouse()
    val cat = freshCat(wh)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT)")
    spark.sql(s"INSERT INTO $cat.t VALUES (1), (2), (3)")
    spark.sql(s"CREATE VIEW $cat.alpha AS SELECT k FROM $cat.t")
    spark.sql(s"CREATE VIEW $cat.beta AS SELECT k * 2 AS k2 FROM $cat.t")
    assert(spark.sql(s"SHOW VIEWS IN $cat")
      .select("viewName").as[String].collect().toSeq ==
      Seq("alpha", "beta"))
    assert(spark.sql(s"SHOW VIEWS IN $cat LIKE 'al*'")
      .select("viewName").as[String].collect().toSeq == Seq("alpha"))
    // ALTER VIEW ... AS re-binds in place (exists-checked)
    spark.sql(s"ALTER VIEW $cat.alpha AS SELECT k + 100 AS k FROM $cat.t")
    assert(spark.sql(s"SELECT min(k) FROM $cat.alpha")
      .head.getLong(0) == 101L)
    val e = intercept[Exception] {
      spark.sql(s"ALTER VIEW $cat.nope AS SELECT 1 AS one")
    }
    assert(e.getMessage.toLowerCase.contains("view"), e.getMessage)
    // DROP then SHOW reflects it
    spark.sql(s"DROP VIEW $cat.alpha")
    assert(spark.sql(s"SHOW VIEWS IN $cat")
      .select("viewName").as[String].collect().toSeq == Seq("beta"))
  }

  test("views interplay with nested evolution: projections survive, star views re-bind") {
    val wh = freshWarehouse()
    val cat = freshCat(wh)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, meta STRUCT<a: INT>)")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, named_struct('a', 10))")
    // a view projecting a NESTED FIELD — stable under nested ADDs
    // (the projection's shape doesn't change when a sibling arrives)
    spark.sql(s"CREATE VIEW $cat.va AS SELECT k, meta.a AS a FROM $cat.t")
    spark.sql(s"ALTER TABLE $cat.t ADD COLUMN meta.flag STRING")
    spark.sql(s"INSERT INTO $cat.t VALUES " +
      "(2, named_struct('a', 20, 'flag', 'x'))")
    assert(spark.sql(s"SELECT k, a FROM $cat.va ORDER BY k")
      .as[(Long, Int)].collect().toSeq == Seq((1L, 10), (2L, 20)))
    // a STAR view binds the struct type at creation: the nested add
    // changes the struct's shape underneath — loud, re-bind recovers
    spark.sql(s"CREATE VIEW $cat.vs AS SELECT * FROM $cat.t")
    spark.sql(s"ALTER TABLE $cat.t ADD COLUMN meta.extra INT")
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.vs").collect()
    }
    assert(e.getMessage.contains("CREATE OR REPLACE"), e.getMessage)
    spark.sql(s"CREATE OR REPLACE VIEW $cat.vs AS SELECT * FROM $cat.t")
    assert(spark.sql(s"SELECT meta.flag FROM $cat.vs WHERE k = 2")
      .as[String].head() == "x")
    // nested RENAME under the field-projecting view: the old name is
    // gone — loud analysis error from the re-run text, never silent
    // nulls
    spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN meta.a TO aa")
    intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.va").collect()
    }
    spark.sql(s"CREATE OR REPLACE VIEW $cat.va AS " +
      s"SELECT k, meta.aa AS a FROM $cat.t")
    assert(spark.sql(s"SELECT sum(a) FROM $cat.va").head.getLong(0) == 30L)
  }

  test("outer filters and projections push into the view's inner scans") {
    val wh = freshWarehouse()
    val cat = freshCat(wh)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, region STRING) " +
      "PARTITIONED BY (region)")
    spark.sql(s"INSERT INTO $cat.t SELECT id, 'EU' FROM range(1, 100)")
    spark.sql(s"INSERT INTO $cat.t SELECT id, 'US' FROM range(100, 200)")
    spark.sql(s"CREATE VIEW $cat.w AS SELECT k, region FROM $cat.t")
    // the outer equality lands on the inner frame, where the
    // versioned scan partition-prunes — real skipped IO through the
    // view boundary
    val n = spark.sql(s"SELECT count(*) FROM $cat.w " +
      "WHERE region = 'US'").head.getLong(0)
    assert(n == 100L)
    val (accPath, read, tot) = GraftCatalog.lastVersionedScan.get()
    assert(accPath == s"$wh/t" && read < tot,
      s"expected partition pruning through the view, " +
        s"read $read of $tot at $accPath")
  }
}
