package graft

import graft.ops.EtlOps.RichDF
import graft.ops.Names
import org.apache.spark.sql.functions._
import scala.util.Random

/** Differential tests: randomized inputs, distributed operator vs a
  * straight-line Scala oracle implementing the reference's sequential
  * loop semantics (capital_sendas.py separar_nombres / validacion_Qx /
  * validacion_C5). Catches window-rewrite divergences the fixed
  * examples and the SQL oracle (same-algorithm) cannot.
  */
class DifferentialSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(42)

  // ---- reference loop: separar_nombres -------------------------------
  private def splitRef(name: String): (String, String, String, String) = {
    val particles = Set("DE", "DEL", "LA", "LOS")
    var parte = ""
    val partes = scala.collection.mutable.ArrayBuffer.empty[String]
    name.split(" ").filter(_.nonEmpty).foreach { tok =>
      if (particles(tok)) parte = parte + tok + " "
      else { partes += (parte + tok); parte = "" }
    }
    val p = partes.toSeq
    p.length match {
      case 0 => ("", "", "", "")
      case 1 => (p(0), "", "", "")
      case 2 => (p(0), "", p(1), "")
      case 3 => (p(0), "", p(1), p(2))
      case 4 => (p(0), p(1), p(2), p(3))
      case _ => (p(0), p.slice(1, p.length - 2).mkString(" "),
        p(p.length - 2), p(p.length - 1))
    }
  }

  test("name split matches the reference loop on 60 random names") {
    val vocab = Seq("DE", "DEL", "LA", "LOS", "JUAN", "ANA", "CRUZ",
      "MARIA", "PEREZ", "GOMEZ", "RIOS", "SOL")
    val names = (1 to 60).map { _ =>
      (1 + rnd.nextInt(7) to 7).map(_ => vocab(rnd.nextInt(vocab.size)))
        .take(1 + rnd.nextInt(6)).mkString(" ")
    }.distinct
    val got = names.toDF("n")
      .withColumn("p", Names.splitFullName(col("n")))
      .select(col("n"), col("p.nombre1"), col("p.nombre2"),
        col("p.apellido1"), col("p.apellido2"))
      .as[(String, String, String, String, String)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    names.foreach { n =>
      assert(got(n) == splitRef(n), s"name '$n'")
    }
  }

  // ---- reference loop: validacion_Qx ---------------------------------
  private def cappedRef(rows: Seq[(String, String, Int)]): Map[Int, Int] = {
    // rows: (grupo, tipologia, id) pre-sorted by scan order
    rows.groupBy(_._1).flatMap { case (_, g) =>
      var tot = 0
      var sub = 0
      var cur = ""
      g.map { case (_, tip, id) =>
        var v = 0
        if (tot < 3) {
          if (tip == cur) {
            if (sub < 2) { v = 1; tot += 1; sub += 1 }
          } else { v = 1; tot += 1; sub = 1; cur = tip }
        }
        id -> v
      }
    }
  }

  test("cappedGroupMark matches the validacion_Qx loop on random data") {
    val rows = (1 to 300).map { i =>
      (s"F${rnd.nextInt(20)}", s"Qx${1 + rnd.nextInt(3)}", i)
    }
    // scan order: group asc, tipologia DESC, id asc (sub-groups contiguous)
    val scan = rows.sorted(Ordering.Tuple3(
      Ordering.String, Ordering.String.reverse, Ordering.Int))
    val expected = cappedRef(scan)
    val got = rows.toDF("g", "tip", "id")
      .cappedGroupMark(Seq("g"), "tip",
        Seq(col("tip").desc, col("id").asc), 3, 2, "v")
      .select("id", "v").as[(Int, Int)].collect().toMap
    expected.foreach { case (id, v) =>
      assert(got(id) == v, s"row $id")
    }
  }

  // ---- reference loop: validacion_C5 ---------------------------------
  private def gapRef(rows: Seq[(String, Long, String)],
      gapDays: Int): Map[String, Int] = {
    rows.groupBy(_._1).flatMap { case (_, g) =>
      var last = Option.empty[Long]
      g.sortBy(r => (r._2, r._3)).map { case (_, ts, id) =>
        val mark = last.forall(l => (ts - l) / 86400000000L > gapDays)
        if (mark) last = Some(ts)
        id -> (if (mark) 1 else 0)
      }
    }
  }

  test("priorityPick matches the asignar_tipologia loop on random data") {
    // reference: first predicate (in order) any row satisfies wins;
    // among its rows the first by the order columns is kept; groups
    // with no matching row vanish (capital_sendas.py:217-257)
    val rows = (1 to 300).map { i =>
      (s"g${rnd.nextInt(30)}", Seq("ped", "gin", "neutral", "other")(rnd.nextInt(4)), i)
    }
    val predFns = Seq[((String, Int)) => Boolean](
      { case (k, o) => k == "ped" && o % 2 == 0 },
      { case (k, _) => k == "gin" },
      { case (k, _) => k == "neutral" })
    val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
      val ranked = rs.flatMap { case (_, kind, ord) =>
        val p = predFns.indexWhere(f => f((kind, ord)))
        if (p < 0) None else Some(((kind, ord), p))
      }
      if (ranked.isEmpty) None
      else Some(g -> ranked.minBy { case ((kind, ord), p) => (p, ord, kind) }._1)
    }
    val got = ops.Rules.priorityPick(rows.toDF("g", "kind", "ord"),
        Seq("g"),
        Seq(col("kind") === "ped" && col("ord") % 2 === 0,
          col("kind") === "gin",
          col("kind") === "neutral"),
        Seq(col("ord"), col("kind")))
      .select("g", "kind", "ord").as[(String, String, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (g, v) => assert(got(g) == v, s"group $g") }
  }

  test("upsert matches a sequential map-merge on random batches") {
    val target = (1 to 200).map(k => (k.toLong, s"t$k", rnd.nextInt(100)))
      .filter(_ => rnd.nextBoolean())
    val updates = (1 to 200).map(k => (k.toLong, s"u$k", rnd.nextInt(100)))
      .filter(_ => rnd.nextInt(3) == 0)
    val expected = {
      val m = scala.collection.mutable.LinkedHashMap[Long, (String, Int)]()
      target.foreach { case (k, s, v) => m(k) = (s, v) }
      updates.foreach { case (k, s, v) => m(k) = (s, v) }
      m.map { case (k, (s, v)) => (k, s, v) }.toSet
    }
    val got = target.toDF("k", "s", "v")
      .upsert(updates.toDF("k", "s", "v"), Seq("k"))
      .as[(Long, String, Int)].collect().toSet
    assert(got == expected)
  }

  test("coalesceLookup matches the reference's fine-else-coarse fillna merge") {
    // reference: tipologia via (SERVICIO, CENTRO) else SERVICIO
    // (capital_sendas.py:170-198) — sequential oracle over sorted maps
    val facts = (1 to 300).map(i =>
      (i, s"s${rnd.nextInt(20)}", s"c${rnd.nextInt(5)}"))
    val lookup = (1 to 60).map { _ =>
      (s"s${rnd.nextInt(20)}", s"c${rnd.nextInt(5)}", rnd.nextInt(1000))
    }.distinct
    val fineMap = lookup.groupBy(r => (r._1, r._2))
      .map { case (k, rs) => k -> rs.map(_._3).min }
    val coarseMap = lookup.groupBy(_._1)
      .map { case (k, rs) => k -> rs.map(_._3).min }
    val expected = facts.map { case (i, s, c) =>
      i -> fineMap.get((s, c)).orElse(coarseMap.get(s))
    }.toMap
    val got = facts.toDF("i", "srv", "cen")
      .coalesceLookup(
        lookup.toDF("srv", "cen", "tip"),
        Seq("srv", "cen"), Seq("srv"), "tip", Seq(col("tip")))
      .select(col("i"), col("tip"))
      .as[(Int, Option[Int])].collect().toMap
    facts.foreach { case (i, _, _) =>
      assert(got(i) == expected(i), s"fact $i")
    }
  }

  test("gapMark matches the validacion_C5 loop on random timestamps") {
    val baseMicros = 1704067200000000L // 2024-01-01 UTC
    val rows = (1 to 400).map { i =>
      val grp = s"g${rnd.nextInt(12)}"
      val ts = baseMicros + rnd.nextInt(40) * 86400000000L +
        rnd.nextInt(86400) * 1000000L
      (grp, ts, f"e$i%04d")
    }
    val expected = gapRef(rows, 3)
    val got = rows.toDF("g", "tsu", "id")
      .withColumn("ts", timestamp_micros(col("tsu")))
      .gapMark(Seq("g"), "ts", "id", 3, "v")
      .select("id", "v").as[(String, Int)].collect().toMap
    expected.foreach { case (id, v) =>
      assert(got(id) == v, s"event $id")
    }
  }

  test("chunkDedup matches a sequential first-seen scan on random corpora") {
    // reference semantics: walk docs in (doc_id, chunk_idx) order,
    // first occurrence of every chunk text owns it, count the rest
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps")
    val docs = (0L until 80L).map { i =>
      val n = 1 + rnd.nextInt(12)
      (i, (1 to n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val width = 2
    val seen = scala.collection.mutable.Set.empty[String]
    val expected = docs.map { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val chunks = toks.grouped(width).map(_.mkString(" ")).toSeq
      val dups = chunks.count { c =>
        val dup = seen(c); seen += c; dup
      }
      id -> ((chunks.length.toLong, dups.toLong))
    }.toMap
    val got = graft.dedup.Dedup.chunkDedup(
        docs.toDF("doc_id", "text"), "text", "doc_id", width)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == expected)
  }

  test("shingleDedup matches a sequential first-seen scan on random corpora") {
    // stride-1 semantics: EVERY width-token window in (doc_id, pos)
    // order; first occurrence of a window's text owns it. Short docs
    // (< width tokens) emit no shingles and no output row.
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps")
    val docs = (0L until 80L).map { i =>
      val n = 1 + rnd.nextInt(12)
      (i, (1 to n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val width = 3
    val seen = scala.collection.mutable.Set.empty[String]
    val expected = docs.flatMap { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val windows = toks.sliding(width, 1).filter(_.length == width)
        .map(_.mkString(" ")).toSeq
      val dups = windows.count { w =>
        val dup = seen(w); seen += w; dup
      }
      if (windows.isEmpty) None
      else Some(id -> ((windows.length.toLong, dups.toLong)))
    }.toMap
    val got = graft.dedup.Dedup.shingleDedup(
        docs.toDF("doc_id", "text"), "text", "doc_id", width)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == expected)
  }

  test("shingleDedup catches a shifted duplicate passage chunkDedup misses") {
    // the same 4-token passage embedded at offsets 0 and 1: chunk
    // boundaries (width 4) only align for the first doc, so the
    // chunk form sees no duplicate — the shingle form must.
    val passage = "alpha beta gamma delta"
    val docs = Seq(
      (0L, passage + " eps omega theta iota"),
      (1L, "kappa " + passage + " eps omega theta")).toDF("doc_id", "text")
    val chunk = graft.dedup.Dedup.chunkDedup(docs, "text", "doc_id", 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val shingle = graft.dedup.Dedup.shingleDedup(docs, "text", "doc_id", 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(chunk(1L) == 0L, "chunk form is alignment-blind by design")
    assert(shingle(1L) >= 1L, "shingle form must catch the shifted passage")
    assert(shingle(0L) == 0L)
  }

  test("Versioned.changes matches a sequential key-map diff on random commits") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_diff").toString
    val v0 = (0L until 120L).map(k => (k, rnd.nextInt(5)))
    // v1: drop ~1/4, mutate ~1/4, keep ~1/2, insert 30 fresh keys
    val v1 = v0.flatMap { case (k, v) =>
      rnd.nextInt(4) match {
        case 0 => None
        case 1 => Some((k, v + 100))
        case _ => Some((k, v))
      }
    } ++ (1000L until 1030L).map(k => (k, rnd.nextInt(5)))
    graft.sources.Versioned.commit(v0.toDF("k", "v"), path, overwrite = false)
    graft.sources.Versioned.commit(v1.toDF("k", "v"), path, overwrite = true)
    val m0 = v0.toMap
    val m1 = v1.toMap
    val expected = (m0.keySet ++ m1.keySet).map { k =>
      k -> ((m0.get(k), m1.get(k)) match {
        case (None, Some(_)) => "insert"
        case (Some(_), None) => "delete"
        case (Some(a), Some(b)) if a != b => "update"
        case _ => "unchanged"
      })
    }.toMap
    val got = graft.sources.Versioned.changes(spark, path, 0, 1, Seq("k"))
      .select(col("k"), col("change_type"))
      .as[(Long, String)].collect().toMap
    assert(got == expected)
  }
}
