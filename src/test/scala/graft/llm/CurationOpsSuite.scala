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
    // but a NON-null count that fails the cast (corrupt '12k', wrong
    // column) fails loudly — pre-fix it coalesced to 0 and the doc
    // packed as free, silently overflowing the emitted sequence's budget
    val corrupt = Seq((0L, "10"), (1L, "12k")).toDF("doc_id", "toks")
    val e2 = intercept[Exception] {
      Packing.nextFitPack(corrupt, "doc_id", col("toks"), numShards = 2, budgetTokens = 64)
        .collect()
    }
    assert(e2.getMessage.contains("non-numeric token count"), s"unexpected: ${e2.getMessage}")
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

  // ---- unigram LM quality score ---------------------------------------

  test("unigramLogProb matches hand-computed per-term micros sums") {
    val df = Seq((1L, "a a b"), (2L, "b c"), (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProb(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    // tf: a=2 b=2 c=1, N=5; per-term micros round BEFORE summation
    val lpA = math.round(math.log(2.0 / 5.0) * 1e6) // = lpB
    val lpC = math.round(math.log(1.0 / 5.0) * 1e6)
    assert(got === Seq(
      (1L, 3L, 2 * lpA + lpA), // a a b
      (2L, 2L, lpA + lpC), // b c
      (3L, 0L, 0L))) // empty doc
  }

  test("persisted BM25 index answers like the direct scorer; probe prunes term buckets") {
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    Search.buildIndex(docs, "doc_id", "text", dir, termBuckets = 16)
    val terms = Seq("spark", "join", "shuffle")
    val indexed = Search.topKIndexed(spark, dir, terms, k = 10)
      .select("id", "rank").as[(Long, Long)].collect().toSeq
    val direct = Search.bm25TopK(docs, "doc_id", "text", terms, k = 10)
      .select("id", "rank").as[(Long, Long)].collect().toSeq
    // same docs in the same order (scores differ only in where the
    // per-term micros rounding lands — never enough to reorder here)
    assert(indexed === direct)
    // the probe's postings scan reads only the query terms' buckets
    val plan = Search.topKIndexed(spark, dir, terms, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("tb"), s"no bucket predicate in probe plan:\n$plan")
    // phrase probe from the SAME index: agrees with a direct shingle scan
    val phrase = Seq("the", "spark")
    val viaIndex = Search.phraseIndexed(spark, dir, phrase)
      .as[Long].collect().sorted.toSeq
    val viaScan = docs
      .filter(array_contains(Dedup.shingles(col("text"), 2), phrase.mkString(" ")))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(viaIndex === viaScan)
    // crash-atomicity of a REBUILD: data tables stage under a fresh
    // generation, the meta row commits last — simulate a crash just
    // before the meta write by rebuilding with different termBuckets and
    // restoring the OLD meta row: probes must still answer from the old,
    // fully-paired generation (stale stats pruning new tables was the
    // failure mode the v3 layout closes)
    Search.buildIndex(docs, "doc_id", "text", dir, termBuckets = 7)
    IndexTestHooks.undoLastMetaPublish(dir)
    val afterCrash = Search.topKIndexed(spark, dir, terms, k = 10)
      .select("id", "rank").as[(Long, Long)].collect().toSeq
    assert(afterCrash === direct, "probe after a crashed rebuild must answer from the old generation")
    // layout-version guard fails loudly (tamper the COMMITTED meta table
    // in place — the pointer still aims at it)
    import org.apache.spark.sql.functions.lit
    val committedMeta = IndexTestHooks.metaPath(dir)
    spark.read.parquet(committedMeta).withColumn("version", lit(99))
      .write.mode("overwrite").parquet(s"$dir/meta_tmp.parquet")
    spark.read.parquet(s"$dir/meta_tmp.parquet")
      .write.mode("overwrite").parquet(committedMeta)
    val e = intercept[IllegalArgumentException] {
      Search.topKIndexed(spark, dir, terms, k = 10)
    }
    assert(e.getMessage.contains("layout version"))
    // a legacy v2 index (no meta.parquet at all — stats lived in a
    // driver-local stats.json) gets the same friendly rebuild message,
    // not a raw PATH_NOT_FOUND AnalysisException from the meta read
    val legacy = graft.TestSpark.freshDir("search-legacy-v2")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(legacy, "postings"))
    val e2 = intercept[IllegalArgumentException] {
      Search.topKIndexed(spark, legacy, terms, k = 10)
    }
    assert(e2.getMessage.contains("rebuild the index"), e2.getMessage)
  }

  test("stripOverlaps removes covered spans, keeps clean docs byte-identical") {
    val bench = Seq((100L, "secret eval answer")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the secret eval answer is here"), // 3-gram hit covers tokens 2-4
      (2L, "completely clean document text"),
      (3L, "secret eval answer")             // fully contaminated → empty
    ).toDF("doc_id", "text")
    val out = Decontaminate.stripOverlaps(corpus, bench, "doc_id", "text", 3)
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(out === Seq(
      (1L, "the is here", 3L),
      (2L, "completely clean document text", 0L),
      (3L, "", 3L)))
  }

  test("bigramLogProb matches hand-computed interpolated micros; short docs get zeros") {
    val df = Seq((1L, "a b a"), (2L, "b"), (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLogProb(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    // tokens: a b a b → N=4, cu(a)=2, cu(b)=2; bigrams (a,b)=1, (b,a)=1
    // identical double ops to the operator: (λ·cb)/c1 + ((1−λ)·c2)/N
    def wt(cb: Long, c1: Long, c2: Long): Long =
      math.round(math.log(0.9 * cb / c1.toDouble + (1.0 - 0.9) * c2 / 4.0) * 1e6)
    assert(got === Seq(
      (1L, 2L, wt(1, 2, 2) + wt(1, 2, 2)), // (a,b) + (b,a): symmetric counts here
      (2L, 0L, 0L), // single token: no bigram
      (3L, 0L, 0L))) // empty doc
  }

  test("containmentPairs flags an excerpt inside a larger doc that Jaccard misses") {
    val big = (1 to 40).map(i => s"w$i").mkString(" ")   // 38 distinct 3-grams
    val quote = (5 to 12).map(i => s"w$i").mkString(" ") // 6 3-grams, all inside big
    val df = Seq((1L, big), (2L, quote), (3L, "totally different words here four five"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, "doc_id", "text", 3, 0.8)
      .select("id_contained", "id_container", "isect", "size_contained")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((2L, 1L, 6L, 6L))) // containment 6/6 = 1.0, directed
    // symmetric Jaccard misses the same pair at the same threshold:
    // isect/(union) = 6/38 ≈ 0.16
    assert(Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, 0.8).count() === 0L)
  }

  test("containmentPairs emits BOTH directions for mutual near-identical docs") {
    val a = (1 to 20).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, a), (2L, a)).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, "doc_id", "text", 3, 0.9)
      .select("id_contained", "id_container").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L), (2L, 1L)))
  }

  test("rrfFuse combines ranked lists with 1/(k0+rank) and breaks ties by id") {
    val l1 = Seq((10L, 1L), (20L, 2L)).toDF("id", "rank")
    val l2 = Seq((20L, 1L), (30L, 2L)).toDF("id", "rank")
    val got = Search.rrfFuse(Seq(l1, l2), k0 = 60, topK = 10)
      .select("id", "rrf_micros", "rank").as[(Long, Long, Long)].collect().toSeq
    def m(x: Double) = math.round(x * 1e6)
    assert(got === Seq(
      (20L, m(1.0 / 62 + 1.0 / 61), 1L), // in both lists: terms summed in list order
      (10L, m(1.0 / 61), 2L),            // lex-only
      (30L, m(1.0 / 62), 3L)))           // sem-only; same raw score class → id tiebreak
    // topK truncates the fused list, not the inputs
    assert(Search.rrfFuse(Seq(l1, l2), topK = 1).count() === 1L)
  }

  test("bigramLmTrain + bigramLmScore on the same corpus equals the combined bigramLogProb") {
    val lm = TextAnalysis.bigramLmTrain(docs, "doc_id", "text")
    val split = TextAnalysis.bigramLmScore(docs, "doc_id", "text", lm)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    val combined = TextAnalysis.bigramLogProb(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(split === combined)
    // a persisted-then-reloaded LM scores an UNSEEN doc with only its
    // in-LM bigrams (inner join — unseen bigrams contribute nothing)
    val unseen = Seq((99L, "zzzq zzzq zzzq")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScore(unseen, "doc_id", "text", lm)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((99L, 0L, 0L)))
  }

  test("unigramLogProb on the corpus: singleton-token docs score below common-token docs") {
    val scored = TextAnalysis.unigramLogProb(docs, "doc_id", "text")
    // every doc's token count matches the direct column computation
    val direct = docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    val got = scored.as[(Long, Long, Long)].collect()
    assert(got.forall { case (id, n, _) => direct(id) == n })
    // log-probs are strictly negative for non-empty docs (tf < N always here)
    assert(got.forall { case (_, n, lp) => n == 0 || lp < 0 })
  }

  // ---- boilerplate-line removal ---------------------------------------

  test("removeBoilerplateLines drops high-df lines everywhere, keeps blanks and rare lines") {
    val df = Seq(
      (1L, "keep1\nFOO\n\nbar"),
      (2L, "FOO\nkeep2"),
      (3L, "FOO")
    ).toDF("id", "text")
    val got = Dedup.removeBoilerplateLines(df, "id", "text", minDocs = 3)
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    // FOO hits 3 distinct docs -> removed from EVERY doc (no canonical
    // survivor, unlike dedupLines); the blank line is structure and stays
    assert(got === Seq(
      (1L, "keep1\n\nbar", 1L),
      (2L, "keep2", 1L),
      (3L, "", 1L)))
    // below the threshold nothing is removed
    val none = Dedup.removeBoilerplateLines(df, "id", "text", minDocs = 4)
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(none.map(_._3).forall(_ == 0L))
    assert(none.map(_._2) === Seq("keep1\nFOO\n\nbar", "FOO\nkeep2", "FOO"))
    // minDocs < 2 would remove every non-blank line: rejected loudly
    intercept[IllegalArgumentException] {
      Dedup.removeBoilerplateLines(df, "id", "text", minDocs = 1)
    }
  }

  test("removeBoilerplateLines counts DISTINCT docs (within-doc repeats don't cross the bar)") {
    val df = Seq(
      (1L, "X\nX\nX"), // X repeats within one doc only
      (2L, "y\nz")
    ).toDF("id", "text")
    val got = Dedup.removeBoilerplateLines(df, "id", "text", minDocs = 2)
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(got === Seq((1L, "X\nX\nX", 0L), (2L, "y\nz", 0L)))
  }

  // ---- token-budget sampling ------------------------------------------

  test("budgetSample keeps exactly the hash-order prefix within budget per stratum") {
    import graft.operators.Sampling
    val rows = (1L to 12L).map(i => (i, if (i % 2 == 0) "even" else "odd", 10L * i))
    val df = rows.toDF("id", "grp", "cost")
    val budget = 150L
    val got = Sampling.budgetSample(df, "id", "grp", col("cost"), budget)
      .select("id", "grp", "cum_cost").as[(Long, String, Long)].collect().toSet
    // replay the exact selection rule in Scala: the running sum includes
    // EVERY row in hash order (an overflowing row is dropped but its cost
    // stays in the total — a strict prefix, not a skip-and-refill knapsack)
    def hb(k: Long) = ((k % Sampling.P) * Sampling.A + Sampling.B) % Sampling.P
    val strictPrefix = rows.groupBy(_._2).flatMap { case (grp, rs) =>
      var cum = 0L
      rs.sortBy(r => (hb(r._1), r._1)).flatMap { case (id, _, cost) =>
        cum += cost
        if (cum <= budget) Some((id, grp, cum)) else None
      }
    }.toSet
    assert(got === strictPrefix)
    // every kept row is within budget
    assert(got.forall(_._3 <= budget))
  }

  test("budgetSample is deterministic and null-key-loud") {
    import graft.operators.Sampling
    val a = Sampling.budgetSample(docs.select("doc_id", "source", "n_chars"),
      "doc_id", "source", col("n_chars"), 5000L).orderBy("doc_id").collect().toSeq
    val b = Sampling.budgetSample(docs.select("doc_id", "source", "n_chars"),
      "doc_id", "source", col("n_chars"), 5000L).orderBy("doc_id").collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
    val nullKey = Seq((Option.empty[Long], "s", 10L)).toDF("id", "grp", "cost")
    val e = intercept[Exception] {
      Sampling.budgetSample(nullKey, "id", "grp", col("cost"), 100L).collect()
    }
    assert(e.getMessage.contains("sampling key"), s"unexpected: ${e.getMessage}")
    // a NULL cost would ride free and a negative cost breaks the prefix
    // property — both fail loudly instead
    val nullCost = Seq((1L, "s", Some(10L)), (2L, "s", Option.empty[Long])).toDF("id", "grp", "cost")
    val e2 = intercept[Exception] {
      Sampling.budgetSample(nullCost, "id", "grp", col("cost"), 100L).collect()
    }
    assert(e2.getMessage.contains("budgetSample cost"), s"unexpected: ${e2.getMessage}")
    val negCost = Seq((1L, "s", 10L), (2L, "s", -5L)).toDF("id", "grp", "cost")
    val e3 = intercept[Exception] {
      Sampling.budgetSample(negCost, "id", "grp", col("cost"), 100L).collect()
    }
    assert(e3.getMessage.contains("budgetSample cost"), s"unexpected: ${e3.getMessage}")
    // NaN is neither null nor < 0 but poisons the running sum (NaN→0
    // under the non-ANSI long cast would disable the budget entirely)
    val nanCost = Seq((1L, "s", 10.0), (2L, "s", Double.NaN), (3L, "s", 999999.0))
      .toDF("id", "grp", "cost")
    val e4 = intercept[Exception] {
      Sampling.budgetSample(nanCost, "id", "grp", col("cost"), 100L).collect()
    }
    assert(e4.getMessage.contains("budgetSample cost"), s"unexpected: ${e4.getMessage}")
    // an input that already carries cum_cost would be silently overwritten
    // (the same loud guard topKPerGroup applies to 'rk')
    val collide = Seq((1L, "s", 10L, 0L)).toDF("id", "grp", "cost", "cum_cost")
    val e5 = intercept[IllegalArgumentException] {
      Sampling.budgetSample(collide, "id", "grp", col("cost"), 100L)
    }
    assert(e5.getMessage.contains("cum_cost"), s"unexpected: ${e5.getMessage}")
    val collideCase = Seq((1L, "s", 10L, 0L)).toDF("id", "grp", "cost", "CUM_COST")
    val e6 = intercept[IllegalArgumentException] {
      Sampling.budgetSample(collideCase, "id", "grp", col("cost"), 100L)
    }
    assert(e6.getMessage.contains("cum_cost"), s"unexpected: ${e6.getMessage}")
    // fractional costs break oracle portability (Spark's double→long cast
    // truncates, DuckDB's rounds — different boundary rows) and can
    // overspend the true budget; the running total must be exact 64-bit
    val fracCost = Seq((1L, "s", 1.5), (2L, "s", 2.0)).toDF("id", "grp", "cost")
    val e7 = intercept[Exception] {
      Sampling.budgetSample(fracCost, "id", "grp", col("cost"), 100L).collect()
    }
    assert(e7.getMessage.contains("budgetSample cost"), s"unexpected: ${e7.getMessage}")
    // integral doubles still pass (the common cast-from-count case)
    val intDouble = Seq((1L, "s", 10.0), (2L, "s", 20.0)).toDF("id", "grp", "cost")
    assert(Sampling.budgetSample(intDouble, "id", "grp", col("cost"), 100L).count() === 2L)
  }

  // ---- target-mix rebalancing -----------------------------------------

  test("rebalanceToTargetMix keeps the scarcest stratum whole and scales the rest") {
    import graft.operators.Sampling
    // 40 "web", 10 "code"; target 50/50 -> code binds: t = 10/0.5 = 20,
    // so code keeps all 10 (rate 1.0) and web keeps rate 20*0.5/40 = 0.25
    val df = ((1L to 40L).map(i => (i, "web")) ++ (41L to 50L).map(i => (i, "code")))
      .toDF("id", "grp")
    val got = Sampling.rebalanceToTargetMix(df, "id", "grp", Map("web" -> 0.5, "code" -> 0.5))
      .as[(Long, String)].collect().toSet
    def hb(k: Long) = ((k % Sampling.P) * Sampling.A + Sampling.B) % Sampling.P
    val expected =
      (41L to 50L).map(i => (i, "code")).toSet ++
        (1L to 40L).filter(i => hb(i) < (0.25 * Sampling.P).toLong).map(i => (i, "web")).toSet
    assert(got === expected)
    assert(got.count(_._2 == "code") === 10)
    // a target stratum with no corpus rows is an infeasible mix: loud
    intercept[IllegalArgumentException] {
      Sampling.rebalanceToTargetMix(df, "id", "grp", Map("web" -> 0.5, "books" -> 0.5))
    }
    // non-target strata drop entirely
    val webOnly = Sampling.rebalanceToTargetMix(df, "id", "grp", Map("web" -> 1.0))
      .as[(Long, String)].collect()
    assert(webOnly.forall(_._2 == "web") && webOnly.length === 40)
    // the binding stratum is kept WHOLE even when the rate round-trip
    // fl(fl(t*share)/cnt) lands just below 1.0 (share = 0.61:
    // 10/0.61*0.61/10 < 1.0 in doubles) — the rate pin makes "scarcest
    // stratum binds" exact. Distinguishing row: the id whose hash bucket
    // is exactly P-1, which an un-pinned threshold of
    // (0.99999…*P).toLong = P-1 would drop.
    assert((10.0 / 0.61) * 0.61 / 10.0 < 1.0) // the hazard this pins against
    val maxBucketId =
      ((BigInt(Sampling.P) - 1 - Sampling.B) * BigInt(Sampling.A).modInverse(BigInt(Sampling.P)))
        .mod(BigInt(Sampling.P)).toLong
    def hb2(k: Long) = ((k % Sampling.P) * Sampling.A + Sampling.B) % Sampling.P
    assert(hb2(maxBucketId) === Sampling.P - 1)
    val df2 = ((1L to 9L).map(i => (i, "bind")) :+ ((maxBucketId, "bind")))
      .++((101L to 140L).map(i => (i, "rest"))).toDF("id", "grp")
    val pinned = Sampling.rebalanceToTargetMix(df2, "id", "grp",
      Map("bind" -> 0.61, "rest" -> 0.39))
      .as[(Long, String)].collect()
    // bind binds (10/0.61 < 40/0.39): ALL 10 rows survive, including hb = P-1
    assert(pinned.count(_._2 == "bind") === 10)
    assert(pinned.exists(_._1 == maxBucketId))
  }

  // ---- Bloom-prefiltered decontamination ------------------------------

  test("overlapReportBloom equals the exact overlapReport bit for bit") {
    val bench = docs.filter(pmod(col("doc_id"), lit(25)) === 0)
    val corpus = docs.filter(pmod(col("doc_id"), lit(25)) =!= 0)
    val exact = Decontaminate.overlapReport(corpus, bench, "doc_id", "text", n = 3)
      .as[(Long, Long, Long)].collect().toSet
    val bloom = Decontaminate.overlapReportBloom(corpus, bench, "doc_id", "text", n = 3)
    // the probe plan actually carries the Bloom predicate
    assert(bloom.queryExecution.executedPlan.toString.contains("might_contain"),
      "Bloom probe predicate missing from the physical plan")
    assert(bloom.as[(Long, Long, Long)].collect().toSet === exact)
  }

  test("persisted decontamination index reproduces the broadcast path bit for bit") {
    val bench = docs.filter(pmod(col("doc_id"), lit(25)) === 0)
    val corpus = docs.filter(pmod(col("doc_id"), lit(25)) =!= 0)
    val dir = graft.TestSpark.freshDir("decon_idx")
    Decontaminate.buildIndex(bench, "doc_id", "text", n = 3, dir)
    val exact = Decontaminate.overlapReport(corpus, bench, "doc_id", "text", n = 3)
      .as[(Long, Long, Long)].collect().toSet
    val indexed = Decontaminate.overlapReportIndexed(spark, dir, corpus, "doc_id", "text")
    assert(indexed.queryExecution.executedPlan.toString.contains("might_contain"),
      "stored Bloom bitmap missing from the probe plan")
    assert(indexed.as[(Long, Long, Long)].collect().toSet === exact)
    // the index answers without the benchmark: a second screen over a
    // different batch reuses the same on-disk index
    val batch2 = docs.filter(pmod(col("doc_id"), lit(25)) === 1)
    val exact2 = Decontaminate.overlapReport(batch2, bench, "doc_id", "text", n = 3, minHits = 2)
      .as[(Long, Long, Long)].collect().toSet
    val indexed2 = Decontaminate.overlapReportIndexed(spark, dir, batch2, "doc_id", "text", minHits = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(indexed2 === exact2)
    // empty benchmark: null bitmap short-circuits to an empty report
    val dirEmpty = graft.TestSpark.freshDir("decon_idx_empty")
    Decontaminate.buildIndex(docs.filter(lit(false)), "doc_id", "text", n = 3, dirEmpty)
    assert(Decontaminate.overlapReportIndexed(spark, dirEmpty, corpus, "doc_id", "text").count() === 0)
  }

  test("overlapReportBloom: empty benchmark flags nothing; minHits respected") {
    val bench = docs.filter(lit(false))
    val corpus = docs.limit(20)
    assert(Decontaminate.overlapReportBloom(corpus, bench, "doc_id", "text", n = 3).count() === 0)
    val bench2 = docs.filter(pmod(col("doc_id"), lit(25)) === 0)
    val exact2 = Decontaminate.overlapReport(corpus, bench2, "doc_id", "text", n = 3, minHits = 3)
      .as[(Long, Long, Long)].collect().toSet
    val bloom2 = Decontaminate.overlapReportBloom(corpus, bench2, "doc_id", "text", n = 3, minHits = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(bloom2 === exact2)
  }

  test("bm25: duplicate query terms score as a SET — scan and indexed paths agree") {
    val corpus = docs.limit(100)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "bm25_fixed").as[(Long, Long)].collect().toSeq
    val dup = rows(Search.bm25TopK(corpus, "doc_id", "text", Seq("the", "the", "a"), k = 10))
    val single = rows(Search.bm25TopK(corpus, "doc_id", "text", Seq("the", "a"), k = 10))
    assert(dup === single, "duplicate term doubled its contribution in the scan path")
    // (scan vs indexed may differ by ±1 micro — the documented
    // rounding-LOCATION difference — so each path is compared to itself)
    val dir = graft.TestSpark.freshDir("bm25-dupterms")
    Search.buildIndex(corpus, "doc_id", "text", dir)
    val idxDup = rows(Search.topKIndexed(spark, dir, Seq("the", "the", "a"), k = 10))
    val idxSingle = rows(Search.topKIndexed(spark, dir, Seq("the", "a"), k = 10))
    assert(idxDup === idxSingle, "indexed path diverged on duplicate query terms")
  }

  test("generation sweep: a crash orphan cannot displace the published spare") {
    import java.nio.file.{Files, Paths}
    val dir = graft.TestSpark.freshDir("gen-sweep-orphan")
    val docs100 = docs.limit(100)
    Search.buildIndex(docs100, "doc_id", "text", dir, termBuckets = 4)
    val genA = spark.read.parquet(IndexTestHooks.metaPath(dir)).select("gen").head().getString(0)
    // a crashed rebuild's orphan: data written, meta never committed —
    // and NEWER by mtime than the published generation. Pre-fix the
    // newest-by-mtime spare heuristic kept the ORPHAN and deleted the
    // published generation A out from under any in-flight probe.
    val orphan = Paths.get(dir, "gen-orphan99")
    Files.createDirectories(orphan)
    Files.write(orphan.resolve("junk"), Array[Byte](1, 2))
    Search.buildIndex(docs100, "doc_id", "text", dir, termBuckets = 4)
    val genC = spark.read.parquet(IndexTestHooks.metaPath(dir)).select("gen").head().getString(0)
    assert(genC !== genA)
    assert(Files.isDirectory(Paths.get(dir, genA)),
      "published previous generation (the in-flight readers' spare) was deleted")
    assert(!Files.exists(orphan), "crash orphan was kept instead of reclaimed")
    assert(Search.topKIndexed(spark, dir, Seq("the"), k = 5).count() > 0)
  }

  // ---- score propagation ----------------------------------------------

  /** Scala replica of Propagate's rounded-micros recurrence over the
    * normalized simple graph — the hand-checkable reference the
    * distributed plan must reproduce exactly (same per-edge rounding
    * before the neighbor sum).
    */
  private def refPropagate(
      seeds: Map[Long, Long],
      edges: Seq[(Long, Long)],
      d: Double,
      rounds: Int): Map[Long, Long] = {
    val dir = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter(e => e._1 != e._2).distinct
    val deg = dir.groupBy(_._1).map { case (k, v) => k -> v.size }
    val base = seeds.map { case (id, s0) => id -> math.round((1.0 - d) * s0.toDouble) }
    var s = seeds
    for (_ <- 1 to rounds) {
      val inflow = dir.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) =>
          math.round(d * s(src).toDouble / deg(src).toDouble)
        }.sum
      }
      s = base.map { case (id, b) => id -> (b + inflow.getOrElse(id, 0L)) }
    }
    s
  }

  private def runPropagate(
      seeds: Map[Long, Long],
      edges: Seq[(Long, Long)],
      rounds: Int = 3): Map[Long, Long] =
    Propagate.propagateScores(
      seeds.toSeq.toDF("id", "s0_micros"),
      edges.toDF("id_a", "id_b"),
      damping = 0.85, rounds = rounds)
      .as[(Long, Long)].collect().toMap

  test("propagate: isolated nodes sit at the teleport-only fixed point, any round count") {
    val seeds = Map(1L -> 1000000L, 2L -> 437000L, 3L -> 50000L)
    // only a self-pair, which normalization drops → the graph is edgeless
    val got = runPropagate(seeds, Seq((1L, 1L)), rounds = 3)
    val expected = seeds.map { case (id, s0) => id -> math.round((1.0 - 0.85) * s0.toDouble) }
    assert(got === expected)
    // fixed point: one round gives the same scores as three
    assert(runPropagate(seeds, Seq((1L, 1L)), rounds = 1) === expected)
  }

  test("propagate: duplicate and reversed pair evidence does not change degrees or scores") {
    val seeds = (1L to 4L).map(i => i -> i * 250000L).toMap
    val clean = Seq((1L, 2L), (2L, 3L))
    val noisy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 3L), (2L, 3L))
    assert(runPropagate(seeds, noisy) === runPropagate(seeds, clean))
  }

  test("propagate: matches the hand-computed recurrence on a path + isolated graph") {
    // 1-2-3-4 path, 5 isolated; asymmetric seeds so every degree matters
    val seeds = Map(1L -> 900000L, 2L -> 100000L, 3L -> 700000L, 4L -> 300000L, 5L -> 555000L)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    for (rounds <- Seq(1, 2, 3)) {
      assert(runPropagate(seeds, edges, rounds) === refPropagate(seeds, edges, 0.85, rounds),
        s"divergence at rounds=$rounds")
    }
  }

  test("propagate: matches the recurrence on randomized graphs (seeded, self-loops + dups included)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 6) {
      val n = 3 + rnd.nextInt(8)
      val ids = (1L to n.toLong).toIndexedSeq
      val seeds = ids.map(i => i -> (rnd.nextInt(1000000) + 1).toLong).toMap
      val edges = Seq.fill(rnd.nextInt(2 * n))((ids(rnd.nextInt(n)), ids(rnd.nextInt(n))))
      val rounds = 1 + rnd.nextInt(3)
      assert(runPropagate(seeds, edges, rounds) === refPropagate(seeds, edges, 0.85, rounds),
        s"divergence on trial=$trial n=$n edges=$edges rounds=$rounds")
    }
  }

  test("propagate: tol early-stop equals the equivalent fixed-round result") {
    val seeds = Map(1L -> 900000L, 2L -> 100000L, 3L -> 700000L, 4L -> 300000L)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    def run(rounds: Int, tol: Option[Long]): Map[Long, Long] =
      Propagate.propagateScores(
        seeds.toSeq.toDF("id", "s0_micros"), edges.toDF("id_a", "id_b"),
        damping = 0.85, rounds = rounds, tolMicros = tol)
        .as[(Long, Long)].collect().toMap
    // find the round r* where the recurrence reaches the geometric-tail
    // bound d/(1−d)·Σ|Δ| <= tol (the operator's stopping rule), then
    // pin: tol-stopped run (cap >> r*) === fixed-round run at r*
    // tol must make the geometric-tail threshold Σ|Δ| ≤ tol·(1−d)/d (≈1765
    // at tol=10000) reachable inside the 50-round search window on this
    // path graph (crossed ≈ round 44); 2000L sat below the window's tail
    val tol = 10000L
    var prev = refPropagate(seeds, edges, 0.85, 1)
    var rStar = 1
    var found = false
    for (r <- 2 to 50 if !found) {
      val cur = refPropagate(seeds, edges, 0.85, r)
      val sd = cur.map { case (k, v) => math.abs(v - prev(k)) }.sum
      if (sd.toDouble * 0.85 <= tol.toDouble * 0.15) { rStar = r; found = true } else prev = cur
    }
    assert(found, "recurrence did not converge within 50 rounds — widen tol")
    assert(rStar > 2, s"tol reached too early (r*=$rStar) to distinguish early-stop from cap")
    assert(run(rounds = 50, tol = Some(tol)) === refPropagate(seeds, edges, 0.85, rStar))
    // the guarantee the bound buys: the early-stopped score is within tol
    // of ANY longer run's score, per node — on the adversarial shape for
    // a bare max|Δ| rule (hub fed by many small-delta spokes, where the
    // hub's next-round move is ~deg × the per-spoke delta)
    val hubSeeds = (1L to 40L).map(i => i -> 500000L).toMap + (0L -> 100000L)
    val hubEdges = (1L to 40L).map(i => (0L, i))
    val hubTol = 5000L
    val stopped = Propagate.propagateScores(
      hubSeeds.toSeq.toDF("id", "s0_micros"), hubEdges.toDF("id_a", "id_b"),
      damping = 0.85, rounds = 50, tolMicros = Some(hubTol))
      .as[(Long, Long)].collect().toMap
    val longRun = refPropagate(hubSeeds, hubEdges, 0.85, 50)
    for ((k, v) <- longRun)
      assert(math.abs(stopped(k) - v) <= hubTol, s"node $k moved ${stopped(k) - v} past tol")
    // a tol of 0 on an edgeless graph stops after round 1 (teleport fixed
    // point) and matches any larger cap
    val iso = Map(7L -> 123456L)
    def runIso(rounds: Int, tol: Option[Long]) =
      Propagate.propagateScores(iso.toSeq.toDF("id", "s0_micros"),
        Seq.empty[(Long, Long)].toDF("id_a", "id_b"),
        damping = 0.85, rounds = rounds, tolMicros = tol)
        .as[(Long, Long)].collect().toMap
    assert(runIso(50, Some(0L)) === runIso(1, None))
    // no tol → unchanged fixed-round contract
    assert(run(rounds = 3, tol = None) === refPropagate(seeds, edges, 0.85, 3))
  }

  test("propagate: an edge with a null endpoint fails loudly (not a silently truncated graph)") {
    // pre-fix the src =!= dst filter evaluated to NULL for such rows and
    // dropped them — degrees and inflow computed on a truncated graph
    val seeds = Seq((1L, 500000L), (2L, 500000L)).toDF("id", "s0_micros")
    val badEdges = Seq((Some(1L), Some(2L)), (Some(1L), Option.empty[Long]))
      .toDF("id_a", "id_b")
    val e = intercept[Exception] {
      Propagate.propagateScores(seeds, badEdges, damping = 0.85, rounds = 2).collect()
    }
    assert(e.getMessage.contains("null endpoint"), s"unexpected: ${e.getMessage}")
  }

  test("propagate: report exposes rounds-executed and early-stop vs cap-hit") {
    val seeds = Map(1L -> 900000L, 2L -> 100000L, 3L -> 700000L, 4L -> 300000L)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    def report(rounds: Int, tol: Option[Long]) =
      Propagate.propagateScoresReport(
        seeds.toSeq.toDF("id", "s0_micros"), edges.toDF("id_a", "id_b"),
        damping = 0.85, rounds = rounds, tolMicros = tol)
    // tol reachable inside the cap → converged, with the stop round reported
    val early = report(60, Some(10000L))
    assert(early.converged)
    assert(early.rounds > 2 && early.rounds < 60, s"rounds=${early.rounds}")
    // the reported round IS the equivalent fixed-round run
    assert(early.scores.as[(Long, Long)].collect().toMap ===
      refPropagate(seeds, edges, 0.85, early.rounds))
    // cap fires strictly BEFORE tolerance → not converged, rounds == cap
    val cap = early.rounds - 1
    val capped = report(cap, Some(10000L))
    assert(!capped.converged && capped.rounds === cap)
    // tolerance met exactly AT the cap → converged=true: the check runs
    // on the final round too (pre-fix it was skipped there, so a run
    // reaching tolerance at the cap reported converged=false and a
    // caller needlessly reran with a higher cap)
    val atCap = report(early.rounds, Some(10000L))
    assert(atCap.converged && atCap.rounds === early.rounds)
    // fixed-round contract: never reports converged
    val fixed = report(3, None)
    assert(!fixed.converged && fixed.rounds === 3)
  }

  test("propagate: high-quality neighborhood lifts a low-seed member above its isolated twin") {
    // doc 10 (low seed) is near-dup of two high-quality docs; doc 20 has
    // the same seed but no edges — the diffusion signal the operator exists for
    val seeds = Map(10L -> 100000L, 11L -> 1000000L, 12L -> 1000000L, 20L -> 100000L)
    val got = runPropagate(seeds, Seq((10L, 11L), (10L, 12L)))
    assert(got(10L) > got(20L))
  }
}
