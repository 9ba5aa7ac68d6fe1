package graft.dedup

import graft.SparkSpec

import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "b1"),
    (2L, "the quick brown fox jumps over the lazy dog", "b1"),
    (3L, "the quick brown fox jumps over a lazy dog!!", "b1"),
    (4L, "completely different text with nothing shared", "b1"),
    (5L, "isolated other block text", "b2"))
    .toDF("doc_id", "text", "blk")

  test("exact dedup keeps min id and counts dups") {
    val got = Dedup.exact(docs, "text", "doc_id")
      .select("doc_id", "n_dups").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("minhashLshPairs surfaces identical docs as candidates") {
    val pairs = Dedup.minhashLshPairs(docs, "text", "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // identical -> all bands equal
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L) ||
      pairs.forall(p => p._1 < p._2))
  }

  test("minhashLshIncrementalPairs == full LSH pairs touching the new batch") {
    val full = Dedup.minhashLshPairs(docs, "text", "doc_id")
      .as[(Long, Long)].collect().toSet
    val newB = Dedup.bandedSignatures(
      docs.filter(col("doc_id") % 2 === 0), "text", "doc_id")
    val oldB = Dedup.bandedSignatures(
      docs.filter(col("doc_id") % 2 =!= 0), "text", "doc_id")
    val inc = Dedup.minhashLshIncrementalPairs(newB, oldB)
      .as[(Long, Long)].collect().toSet
    assert(inc == full.filter(p => p._1 % 2 == 0 || p._2 % 2 == 0))
    assert(inc.contains((1L, 2L))) // identical docs split across batches
  }

  test("ngramJaccardPairs respects the threshold inside blocks") {
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        Seq("blk"), 3, 1, 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // jaccard 1.0
    assert(!pairs.contains((1L, 4L))) // near-zero overlap
  }

  test("containmentPairs catches a short doc embedded in a long one") {
    // doc 11 is a strict substring of doc 12: containment(11 in 12)
    // is 1.0, while Jaccard is diluted by 12's extra shingles
    val d = Seq(
      (11L, "the quick brown fox", "b1"),
      (12L, "the quick brown fox jumps over the lazy dog today", "b1"),
      (13L, "completely unrelated words here entirely", "b1"))
      .toDF("doc_id", "text", "blk")
    val got = Dedup.containmentPairs(d, "text", "doc_id",
        Seq("blk"), 3, 9, 10)
      .select("id_a", "id_b", "cont_ab", "cont_ba")
      .as[(Long, Long, Double, Double)].collect()
    assert(got.map(r => (r._1, r._2)).toSet == Set((11L, 12L)))
    val (_, _, contAb, contBa) = got.head
    assert(contAb == 1.0, "every shingle of the substring is contained")
    assert(contBa < 1.0, "the superstring has extra shingles")
    // the symmetric score would have failed a 0.9 threshold here
    val jac = Dedup.ngramJaccardPairs(d, "text", "doc_id",
        Seq("blk"), 3, 9, 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!jac.contains((11L, 12L)))
  }

  test("containmentPairs fails loudly on an oversized block") {
    val big = (1 to 50).map(i => (i.toLong, s"text number $i", "same"))
      .toDF("doc_id", "text", "blk")
    val ex = intercept[Exception] {
      Dedup.containmentPairs(big, "text", "doc_id", Seq("blk"), 3, 1, 2,
        maxBlock = 10).count()
    }
    assert(ex.getMessage.contains("block over"))
  }

  test("ngramJaccardPairs fails loudly on an oversized block") {
    val big = (1 to 50).map(i => (i.toLong, s"text number $i", "same"))
      .toDF("doc_id", "text", "blk")
    val ex = intercept[Exception] {
      Dedup.ngramJaccardPairs(big, "text", "doc_id", Seq("blk"), 3, 1, 2,
        maxBlock = 10).count()
    }
    assert(ex.getMessage.contains("block over"))
  }

  test("connectedComponents closes chains transitively (min-id labels)") {
    // 1-2, 2-3 chain (1≁3 directly); 5-6 island; 10-20 long chain
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), (14L, 20L))
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 14L -> 10L,
      20L -> 10L))
  }

  test("connectedComponents on an empty pair set returns no rows") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty).count() == 0)
  }

  test("connectedComponentsStar matches propagation on adversarial shapes") {
    // long chain (the shape propagation is slowest on), star, two
    // cliques bridged by one edge, island pair, reversed/duplicate
    // edges — the contraction algorithm must produce identical
    // (id, min-id) labels
    val chain = (100L until 140L).map(i => (i, i + 1))
    val star = (1L to 8L).map(i => (50L, 50L + i))
    val cliqueA = for (a <- 200L to 204L; b <- (a + 1) to 204L) yield (a, b)
    val cliqueB = for (a <- 300L to 304L; b <- (a + 1) to 304L) yield (b, a)
    val bridge = Seq((204L, 300L))
    val island = Seq((900L, 901L), (901L, 900L), (900L, 901L))
    // self-loops: 700 appears ONLY as (700,700) — must still get a
    // singleton row (the orient() drop must not lose it); 50 also
    // self-loops but already lives in the star component
    val selfLoops = Seq((700L, 700L), (50L, 50L))
    // high-degree hub FUSED to a long chain — the composite that
    // stresses both star steps in one component
    val hubChain = (1L to 100L).map(i => (5000L, 5000L + i)) ++
      (0L until 80L).map(i => (5100L + i, 5100L + i + 1))
    val pairs = (chain ++ star ++ cliqueA ++ cliqueB ++ bridge ++
      island ++ selfLoops ++ hubChain)
      .toDF("id_a", "id_b")
    // the 80-hop chain exceeds propagation's default 50-round budget
    // (rounds = diameter there; contraction stays at its default)
    val expected = Dedup.connectedComponents(pairs, maxIter = 200)
      .as[(Long, Long)].collect().toMap
    val got = Dedup.connectedComponentsStar(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
    assert(got(140L) == 100L && got(58L) == 50L && got(304L) == 200L)
    assert(got(700L) == 700L && got(5180L) == 5000L)
  }

  test("connectedComponentsStar on an empty pair set returns no rows") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponentsStar(empty).count() == 0)
  }

  test("connectedComponentsStar closes a 400-hop chain within its round budget") {
    // the discriminating case: propagation needs diameter rounds
    // (400 > its maxIter=50), contraction needs ~log² and must
    // finish inside the default 60 — this is WHY the variant exists
    val chain = (0L until 400L).map(i => (1000L + i, 1000L + i + 1))
    val got = Dedup.connectedComponentsStar(chain.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect()
    assert(got.length == 401)
    assert(got.forall(_._2 == 1000L))
  }

  test("chunkDedup: first occurrence owns, later chunks count as dups") {
    // width=3: doc 1 = chunks [a b c][d e f]; doc 2 repeats [a b c]
    // then diverges; doc 3 repeats doc 1's SECOND chunk as its first
    // (ownership is by (doc, idx) order, not position); doc 4 shares
    // nothing. A trailing partial chunk ("tail") is its own window.
    val d = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c x y z"),
      (3L, "d e f q r s tail"),
      (4L, "u v w"))
      .toDF("doc_id", "text")
    val got = Dedup.chunkDedup(d, "text", "doc_id", 3)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(1L -> (2L, 0L), 2L -> (2L, 1L),
      3L -> (3L, 1L), 4L -> (1L, 0L)))
  }

  test("chunkDedup: intra-doc repetition dedups against the doc itself") {
    val d = Seq((7L, "p q r p q r p q r")).toDF("doc_id", "text")
    val got = Dedup.chunkDedup(d, "text", "doc_id", 3)
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((7L, 3L, 2L))) // chunks 1,2 dup chunk 0
  }
}
