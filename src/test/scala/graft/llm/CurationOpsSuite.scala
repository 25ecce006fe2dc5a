package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Decontamination, BM25 search, and sequence packing — the round-4
  * curation additions (each also oracle-checked end-to-end via
  * SparkEntry.oracleSql).
  */
class CurationOpsSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  // ---- decontamination -------------------------------------------------

  test("decontaminate flags exactly the docs sharing an n-gram with the benchmark") {
    val df = Seq(
      (1L, "alpha beta gamma delta"), // shares the 3-gram "alpha beta gamma"
      (2L, "beta gamma delta epsilon"), // shares "beta gamma delta"
      (3L, "zeta eta theta iota"), // clean
      (10L, "alpha beta gamma x y z"), // benchmark
      (20L, "q beta gamma delta w") // benchmark
    ).toDF("id", "text")
    val bench = df.filter(col("id") >= 10)
    val corpus = df.filter(col("id") < 10)
    val got = Decontaminate.overlapReport(corpus, bench, "id", "text", n = 3)
      .orderBy("id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 10L), (2L, 1L, 20L)))
    val clean = Decontaminate.removeContaminated(corpus, bench, "id", "text", n = 3)
      .select("id").as[Long].collect().toSeq
    assert(clean === Seq(3L))
  }

  test("decontaminate report agrees with a brute-force shingle intersection on the corpus") {
    val bench = docs.filter(pmod(col("doc_id"), lit(25)) === 0)
    val corpus = docs.filter(pmod(col("doc_id"), lit(25)) =!= 0)
    val got = Decontaminate.overlapReport(corpus, bench, "doc_id", "text", n = 5)
      .select("id", "hit_ngrams").as[(Long, Long)].collect().toMap
    val benchSh = bench
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), 5)).as("ng"))
      .as[(Long, String)].collect().groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val corpSh = corpus
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), 5)).as("ng"))
      .as[(Long, String)].collect()
    val brute = corpSh.filter { case (_, ng) => benchSh.contains(ng) }
      .groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(got === brute)
  }

  // ---- BM25 search -----------------------------------------------------

  test("bm25: single-term corpus ranks higher-tf/shorter docs first") {
    val df = Seq(
      (1L, "spark spark spark"), // tf 3, dl 3
      (2L, "spark a b c d e f g"), // tf 1, dl 8
      (3L, "spark spark a b"), // tf 2, dl 4
      (4L, "x y z") // tf 0 — excluded
    ).toDF("id", "text")
    val got = Search.bm25TopK(df, "id", "text", Seq("spark"), k = 10)
      .select("id", "rank").as[(Long, Long)].collect().toSeq
    assert(got.map(_._1) === Seq(1L, 3L, 2L))
    assert(got.map(_._2) === Seq(1L, 2L, 3L))
  }

  test("bm25 matches a scala reference implementation on the sf0.001 corpus") {
    val terms = Seq("spark", "join", "shuffle")
    val k1 = 1.2; val b = 0.75
    val rows = docs.select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val toks = rows.map { case (id, t) => id -> t.trim.split("\\s+").filter(_.nonEmpty) }
    val n = toks.length.toDouble
    val avgdl = toks.map(_._2.length.toLong).sum.toDouble / n
    val idf = terms.map { t =>
      val df = toks.count(_._2.contains(t)).toDouble
      t -> math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    }.toMap
    val expected = toks.map { case (id, ws) =>
      val dl = ws.length.toDouble
      val score = terms.map { t =>
        val tf = ws.count(_ == t).toDouble
        idf(t) * tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))
      }.sum
      id -> math.round(score * 1e6)
    }.filter(_._2 > 0).sortBy { case (id, s) => (-s, id) }.take(5)
    val got = Search.bm25TopK(docs, "doc_id", "text", terms, k = 5)
      .select("id", "bm25_fixed").as[(Long, Long)].collect().toSeq
    assert(got === expected.toSeq)
  }

  // ---- sequence packing ------------------------------------------------

  test("next-fit packing respects the budget and opens one sequence per oversized doc") {
    val df = Seq(
      (0L, 100L), (8L, 100L), (16L, 100L), // shard 0: 100+100 fit, third spills
      (1L, 300L), // shard 1: oversized alone in seq 0
      (9L, 10L), // shard 1: next-fit does NOT reopen seq 0 — new seq
      (2L, 256L), (10L, 1L) // shard 2: exact fit, then spill
    ).toDF("doc_id", "toks")
    val got = Packing.nextFitPack(df, "doc_id", col("toks"), numShards = 8, budgetTokens = 256)
      .orderBy("id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (0L, 0L, 0L, 0L), (1L, 1L, 0L, 0L), (2L, 2L, 0L, 0L),
      (8L, 0L, 0L, 1L), (9L, 1L, 1L, 0L), (10L, 2L, 1L, 0L),
      (16L, 0L, 1L, 0L)))
  }

  test("packing fails loudly on null ids and packs null token counts as 0") {
    // silent row drops from a packing pass are training-data loss — a
    // null (or non-castable) id must fail the job, not vanish
    val nullId = Seq((Some(1L), 10L), (None, 20L)).toDF("doc_id", "toks")
    val e = intercept[Exception] {
      Packing.nextFitPack(nullId, "doc_id", col("toks"), numShards = 2, budgetTokens = 64).collect()
    }
    assert(e.getMessage.contains("nextFitPack"), s"unexpected error: ${e.getMessage}")
    // null token count (e.g. null text) keeps its slot at 0 budget
    val nullToks = Seq((0L, Some(10L)), (2L, None)).toDF("doc_id", "toks")
    val got = Packing.nextFitPack(nullToks, "doc_id", col("toks"), numShards = 2, budgetTokens = 64)
      .orderBy("id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((0L, 0L, 0L, 0L), (2L, 0L, 0L, 1L)))
  }

  test("packing on the corpus: sequences stay within budget unless a single doc exceeds it") {
    val packed = Packing.nextFitPack(docs, "doc_id",
      TextAnalysis.tokenCount(col("text")), numShards = 8, budgetTokens = 256)
    val withToks = packed.join(
      docs.select(col("doc_id").as("id"), TextAnalysis.tokenCount(col("text")).cast("long").as("tk")),
      "id")
    val seqs = withToks.groupBy("shard", "seq_no")
      .agg(sum("tk").as("total"), count(lit(1)).as("members"))
      .as[(Long, Long, Long, Long)].collect()
    assert(seqs.forall { case (_, _, total, members) => total <= 256 || members == 1 })
    // every doc packed exactly once
    assert(packed.count() === docs.count())
    // shards pack independently and deterministically: re-run is identical
    val again = Packing.nextFitPack(docs, "doc_id",
      TextAnalysis.tokenCount(col("text")), numShards = 8, budgetTokens = 256)
      .orderBy("id").collect()
    assert(packed.orderBy("id").collect().toSeq === again.toSeq)
  }
}
