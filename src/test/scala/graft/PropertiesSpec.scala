package graft

import graft.ops.EtlOps.RichDF
import graft.sources.BatchLoad
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

/** Algebraic laws of the incremental operators, ScalaCheck-driven:
  * replays and re-applies MUST be no-ops (idempotence) or the
  * cross-batch/upsert story breaks on retry. Small generated frames,
  * low case counts — the laws, not the volume, are the point. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val params = Parameters.default.withMinSuccessfulTests(20)

  private def rows: Gen[List[(Long, String, Int)]] =
    Gen.listOfN(12, for {
      k <- Gen.choose(1L, 6L)
      s <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(0, 9)
    } yield (k, s, v))

  private def df(xs: List[(Long, String, Int)]): DataFrame =
    xs.toDF("k", "s", "v")

  private def canon(d: DataFrame): Set[(Long, String, Int)] =
    d.as[(Long, String, Int)].collect().toSet

  test("upsert is idempotent: applying the same deduped batch twice = once") {
    val prop = Prop.forAll(rows, rows) { (t0, u0) =>
      val target = df(t0).dedupFirst(Seq("k"), Seq(col("s"), col("v")))
      val updates = df(u0).dedupFirst(Seq("k"), Seq(col("s"), col("v")))
      val once = target.upsert(updates, Seq("k"))
      val twice = once.upsert(updates, Seq("k"))
      canon(once) == canon(twice)
    }
    assert(check(params, prop).passed)
  }

  test("appendIncremental is idempotent: replaying a batch adds nothing") {
    val prop = Prop.forAll(rows, rows) { (a0, b0) =>
      val acc = df(a0).distinct()
      val batch = df(b0).distinct()
      val once = BatchLoad.appendIncremental(Some(acc), batch)
      val twice = BatchLoad.appendIncremental(Some(once), batch)
      canon(once) == canon(twice) &&
        canon(once) == (canon(acc) ++ canon(batch))
    }
    assert(check(params, prop).passed)
  }

  test("dedupFirst is idempotent and key-unique") {
    val prop = Prop.forAll(rows) { xs =>
      val once = df(xs).dedupFirst(Seq("k"), Seq(col("s"), col("v")))
      val twice = once.dedupFirst(Seq("k"), Seq(col("s"), col("v")))
      val keys = once.select("k").as[Long].collect()
      canon(once) == canon(twice) && keys.length == keys.distinct.length
    }
    assert(check(params, prop).passed)
  }

  test("chunking with stride == size partitions the token stream exactly") {
    // non-overlapping chunks concatenated must reproduce the tokens
    val texts: Gen[List[String]] = Gen.listOfN(6, for {
      n <- Gen.choose(0, 23)
      ws <- Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd"))
    } yield ws.mkString(" "))
    val prop = Prop.forAll(texts) { ts =>
      val docs = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val chunks = graft.text.Chunker
        .chunkTokens(docs, "text", "doc_id", 7, 7)
        .orderBy("doc_id", "chunk_id")
        .select("doc_id", "toks")
        .as[(Long, Seq[String])].collect()
        .groupBy(_._1).view.mapValues(_.flatMap(_._2).toSeq).toMap
      ts.zipWithIndex.forall { case (t, i) =>
        val toks = t.split(" ").filter(_.nonEmpty).toSeq
        chunks.getOrElse(i.toLong, Seq.empty) == toks
      }
    }
    assert(check(params, prop).passed)
  }

  test("connectedComponents: every edge's endpoints share a component; labels are fixpoints") {
    val edges: Gen[List[(Long, Long)]] = Gen.listOfN(10, for {
      a <- Gen.choose(1L, 9L)
      b <- Gen.choose(1L, 9L) if a != b
    } yield (math.min(a, b), math.max(a, b)))
    val prop = Prop.forAll(edges) { es =>
      es.isEmpty || {
        val pairs = es.toDF("id_a", "id_b")
        val comp = graft.dedup.Dedup.connectedComponents(pairs)
          .as[(Long, Long)].collect().toMap
        val endpointsAgree = es.forall { case (a, b) => comp(a) == comp(b) }
        // relabeling the components with themselves changes nothing
        val again = graft.dedup.Dedup.connectedComponents(
          comp.toSeq.toDF("id_a", "id_b"))
          .as[(Long, Long)].collect().toMap
        endpointsAgree && comp.forall { case (id, c) =>
          id == c || again(id) == comp(id)
        }
      }
    }
    assert(check(params, prop).passed)
  }

  test("packBins: bins are contiguous from 0 and overfill ≤ one row per bin") {
    val weights: Gen[List[Long]] = Gen.listOfN(12, Gen.choose(1L, 400L))
    val prop = Prop.forAll(weights) { ws =>
      val rows = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("id", "w")
      val packed = graft.text.Chunker
        .packBins(rows, Seq(col("id")), "w", 500L)
        .select("id", "w", "bin").as[(Long, Long, Long)].collect()
        .sortBy(_._1)
      val bins = packed.map(_._3)
      val contiguous = bins.distinct.sorted.sameElements(
        0L.to(bins.max))
      val capacityOk = packed.groupBy(_._3).values.forall { rs =>
        val total = rs.map(_._2).sum
        // start-offset rule: at most ONE row's weight past the budget
        total <= 500L + rs.map(_._2).max
      }
      ws.isEmpty || (contiguous && capacityOk)
    }
    assert(check(params, prop).passed)
  }
}
