package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DedupSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("exact dedup keeps the lowest id per key") {
    val df = Seq((3L, "a"), (1L, "a"), (2L, "b")).toDF("id", "text")
    val got = Dedup.exact(df, "id", Seq("text")).select("id").as[Long].collect().sorted
    assert(got.toSeq === Seq(1L, 2L))
  }

  test("keepBest keeps the highest-score member per group, ties to lowest id") {
    val df = Seq(
      (1L, "a", 10L, "en"), (2L, "a", 30L, "zh"), (3L, "a", 30L, "fr"),
      (4L, "b", 5L, "en")
    ).toDF("id", "text", "score", "lang")
    val got = Dedup.keepBest(df, "id", Seq("text"), "score", Seq("lang"))
      .select("id", "lang", "score", "dup_count")
      .as[(Long, String, Long, Long)].collect().toSet
    // group "a": score 30 tie between ids 2 and 3 → id 2 wins, carry kept in sync
    assert(got === Set((2L, "zh", 30L, 3L), (4L, "en", 5L, 1L)))
    // plan shape: one aggregate, no window exchange-and-sort per member
    val plan = Dedup.keepBest(df, "id", Seq("text"), "score", Seq("lang"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"keepBest must not plan a window:\n$plan")
    // non-numeric id fails loudly at analysis time
    val e = intercept[IllegalArgumentException] {
      Dedup.keepBest(df.withColumn("sid", col("id").cast("string")), "sid", Seq("text"), "score")
    }
    assert(e.getMessage.contains("numeric id"))
  }

  test("keepBest: a NaN score loses to any real score (NaN orders above doubles in Spark)") {
    val df = Seq(
      (1L, "a", Double.NaN, "en"), (2L, "a", 0.3, "zh"),
      (3L, "b", Double.NaN, "fr"), (4L, "b", Double.NaN, "de")
    ).toDF("id", "text", "score", "lang")
    val got = Dedup.keepBest(df, "id", Seq("text"), "score", Seq("lang"))
      .select("id", "lang").as[(Long, String)].collect().toSet
    // pre-fix max(struct(score,...)) crowned the NaN copy (0.0/0.0 quality
    // ratio upstream) as the canonical doc over the genuinely scored one
    assert(got === Set((2L, "zh"), (3L, "fr"))) // all-NaN group: lowest id, deterministic
    val s = Dedup.keepBest(df, "id", Seq("text"), "score")
      .filter(col("id") === 3L).select("score").head().getDouble(0)
    assert(s.isNaN) // the emitted score stays the winner's original value
  }

  test("simhashPairs: token-less documents are excluded, not an all-pairs 0-signature clique") {
    val weird = Seq((1L, ""), (2L, " \t\n"), (3L, "   "), (4L, "real text here"),
      (5L, "real text here")).toDF("doc_id", "text")
    val got = Dedup.simhashPairs(weird, "doc_id", "text", maxDist = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // pre-fix the three empty docs all carried signature 0, collided in
    // every chunk band, and passed the hamming verify — k²/2 junk pairs
    assert(got === Set((4L, 5L)))
  }

  test("embeddingNearDupPairs LSH path tolerates empty/mismatched vectors (stream-wedge regression)") {
    // one empty embedding in a streaming micro-batch previously threw in
    // the signature kernel on EVERY replay — a permanently wedged
    // EmbDedupStream; degenerate and width-mismatched vectors are now
    // excluded before signing, output-identical to the brute-force arm
    val mixed = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(1.0f, 0.01f, 0.0f, 0.0f)),
      (3L, Seq.empty[Float]), // empty
      (4L, Seq(0.0f, 0.0f, 0.0f, 0.0f)), // zero
      (5L, Seq(1.0f, 0.5f)) // stale width
    ).toDF("vec_id", "embedding")
    val lsh = Dedup.embeddingNearDupPairs(mixed, "vec_id", "embedding", threshold = 0.9,
      lshBits = 4, lshTables = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val brute = Dedup.embeddingNearDupPairs(mixed, "vec_id", "embedding", threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh === Set((1L, 2L)))
    assert(brute === lsh) // the two arms agree on what a pair is
    // the pinned-dim form (streaming shells) survives the same batch
    val pinned = Dedup.embeddingNearDupPairs(mixed, "vec_id", "embedding", threshold = 0.9,
      lshBits = 4, lshTables = 4, dim0 = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pinned === Set((1L, 2L)))
  }

  test("connectedComponents rejects non-integral id pairs instead of silently grouping nothing") {
    val pairs = Seq(("u-1", "u-2")).toDF("id_a", "id_b")
    val e = intercept[IllegalArgumentException](Dedup.connectedComponents(pairs))
    assert(e.getMessage.contains("connectedComponents"), s"unexpected: ${e.getMessage}")
  }

  test("shingles: distinct word n-grams") {
    val got = Seq("a b c d a b c d").toDF("t")
      .select(Dedup.shingles(col("t"), 3)).head().getSeq[String](0)
    assert(got.toSet === Set("a b c", "b c d", "c d a", "d a b"))
  }

  test("minhash-LSH finds every exact-Jaccard pair on the sf0.001 corpus (recall) with no false positives") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, numHashes = 32, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // verification step kills false positives ⇒ lsh ⊆ exact
    assert(lsh.subsetOf(exact))
    // banding at 16 bands × 2 rows catches all J≥0.5 pairs on this corpus
    assert(lsh === exact)
  }

  test("maxBucket star edges (r17): a giant near-dup group yields the SAME connected " +
    "components as the exact all-pairs graph at Θ(m) candidate cost") {
    // 60 near-identical docs (one varying token) + the normal corpus: at
    // maxBucket 16 the group's buckets go star while every healthy
    // bucket keeps the exact self-join
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val giant = (1000L until 1060L).map(i => (i, s"$base tail$i"))
    val mixed = docs.select(col("doc_id"), col("text"))
      .unionByName(giant.toDF("doc_id", "text"))
    def groupsOf(maxBucket: Int): Map[Long, Long] =
      Dedup.connectedComponents(
        Dedup.minhashLshPairs(mixed, "doc_id", "text",
          n = 3, numHashes = 64, bands = 32, threshold = 0.5, maxBucket = maxBucket))
        .as[(Long, Long)].collect().toMap
    val exact = groupsOf(0)
    val starred = groupsOf(16)
    assert(starred === exact,
      "star candidates must resolve to the identical component labeling")
    // and the giant group really is one 60-member component
    assert(exact.collect { case (id, g) if g == 1000L => id }.toSet ===
      (1000L until 1060L).toSet)
    // the star arm's raw pair list is LINEAR in the group (hub pairs
    // only inside oversized buckets), not quadratic
    val starPairs = Dedup.minhashLshPairs(mixed, "doc_id", "text",
      n = 3, numHashes = 64, bands = 32, threshold = 0.5, maxBucket = 16)
      .filter(col("id_a") >= 1000L).count()
    val exactPairs = 60L * 59 / 2
    assert(starPairs < exactPairs / 10,
      s"expected Θ(m) star pairs for the group, got $starPairs (exact would be $exactPairs)")
  }

  test("pair-listing guardrail (r18): the opt-in hard cap fails fast with the projected " +
    "pair count BEFORE the quadratic candidate join launches; unset keeps the exact contract") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    // 300 members: the 1/16 hash-sampled preflight sees E≈19 of them —
    // detection is certain, and the estimate (~2048·s·(s−1) projected
    // pairs) is far over any small cap
    val giant = (1000L until 1300L).map(i => (i, s"$base tail$i")).toDF("doc_id", "text")
    def listPairs(maxBucket: Int = 0) =
      Dedup.minhashLshPairs(giant, "doc_id", "text",
        n = 3, numHashes = 32, bands = 16, threshold = 0.5, maxBucket = maxBucket)
    spark.conf.set(Dedup.MaxPairEstimateKey, "100")
    try {
      val e = intercept[IllegalStateException](listPairs().count())
      assert(e.getMessage.contains(Dedup.MaxPairEstimateKey), s"unexpected: ${e.getMessage}")
      assert(e.getMessage.contains("dedupNearGroups"),
        "the failure must point the caller at the bounded groups chain")
      // the cap governs pair LISTING only: the group-shaped arm bounds the
      // giant bucket with star edges, so it proceeds under the same conf
      assert(listPairs(maxBucket = 16).count() > 0)
    } finally spark.conf.unset(Dedup.MaxPairEstimateKey)
    // default (no cap): the exact all-pairs contract stands — every
    // near-identical pair of the 300-member clique is listed
    assert(listPairs().count() === 300L * 299 / 2)
  }

  test("simhash pairs: every reported pair is within the Hamming bound, none missed") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3)
      .select("id_a", "id_b", "hamming").collect()
    assert(pairs.forall(_.getInt(2) <= 3))
    // pigeonhole banding is exact for Hamming ≤ maxDist: cross-check by brute force
    val sigs = docs.select(col("doc_id"),
      graft.functions.TextHashes.simhash64(col("text")).as("sig"))
      .as[(Long, Long)].collect()
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === brute)
  }

  test("embedding near-dup with hyperplane LSH is a subset of brute pairs") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val brute = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.45, lshBits = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(brute))
  }

  test("multi-table hyperplane LSH with AUTO-SIZED bits AND tables reaches recall 1 vs brute") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val brute = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // the production auto path: bits sized from the corpus count (5 at
    // this size), tables sized from the threshold at those bits (41)
    val lsh = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.45,
      lshBits = Dedup.AutoSize, lshTables = Dedup.AutoSize)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh === brute) // exact-cosine verify ⇒ no false positives; tables ⇒ recall
    assert(brute.nonEmpty)
  }

  test("sized-bits rule: bits grow with log2(n), floor 5") {
    assert(Dedup.sizedLshBits(500, targetBucketSize = 16) === 5)
    assert(Dedup.sizedLshBits(2000, targetBucketSize = 16) === 7)
    assert(Dedup.sizedLshBits(10, targetBucketSize = 16) === 5)
    // 100 TB-ish corpus: 1e9 docs → 26 bits, expected bucket ~16 rows
    assert(Dedup.sizedLshBits(1000000000L, targetBucketSize = 16) === 26)
  }

  test("sized-tables rule: ln(1/miss)/p^bits, capped at maxTables") {
    assert(Dedup.sizedLshTables(0.45, 5) === 41)
    assert(Dedup.sizedLshTables(0.9, 10) === 22)
    // exponential requirement hits the cap: 7 bits at 0.45 wants 96
    assert(Dedup.sizedLshTables(0.45, 7) === 64)
    // 1e9-doc bit counts would want ~10^5 tables — the cap keeps the
    // explode feasible (the guarantee regime is documented on the method)
    assert(Dedup.sizedLshTables(0.45, 26) === 64)
    assert(Dedup.sizedLshTables(0.45, 7, maxTables = 128) === 96)
  }

  test("auto-sized bits keep the LSH candidate-pair count ~linear from sf0.01 to sf0.1") {
    def candidates(sf: String): Long = {
      val emb = spark.read.parquet(s"/root/testdata/sf$sf/embeddings.parquet")
      Dedup.embeddingLshCandidates(emb, "vec_id", "embedding",
        lshBits = -1, lshTables = 32).count()
    }
    def rows(sf: String): Long =
      spark.read.parquet(s"/root/testdata/sf$sf/embeddings.parquet").count()
    val (c1, c2) = (candidates("0.01"), candidates("0.1"))
    val growth = c2.toDouble / c1
    val dataGrowth = rows("0.1").toDouble / rows("0.01") // 4x
    // linear would be ~dataGrowth; quadratic (fixed bits) would be ~dataGrowth²
    // (16x). Allow 2x slack over linear for bucket-skew and ceil granularity.
    assert(growth <= 2.0 * dataGrowth,
      s"candidate growth $growth (c1=$c1, c2=$c2) exceeds ~linear bound ${2.0 * dataGrowth}")
    assert(c1 > 0 && c2 > 0)
  }

  test("fully-auto LSH matches brute exactly at sf0.1 (recall-feasible bits bound)") {
    // volume-sized bits (9) made the 64-table cap bind and silently
    // missed 7 of 144 near-threshold pairs; the auto path now caps bits
    // at the recall-feasible bound (6 at threshold 0.45) so the sized
    // table count delivers its miss guarantee
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val brute = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.45,
      lshBits = Dedup.AutoSize, lshTables = Dedup.AutoSize)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh === brute, s"auto LSH missed ${(brute -- lsh).size} pairs")
  }

  test("recall-feasible bits rule: largest bits whose table need fits the cap") {
    // threshold 0.45: p=0.6486, ln(100)/64 budget → bits 6 (needs 62 ≤ 64)
    assert(Dedup.recallFeasibleBits(0.45) === 6)
    assert(Dedup.sizedLshTables(0.45, 6) <= 64)
    // one more bit would overflow the cap
    assert(math.ceil(math.log(100.0) / math.pow(1.0 - math.acos(0.45) / math.Pi, 7)) > 64)
    // tighter thresholds afford far more selective signatures
    assert(Dedup.recallFeasibleBits(0.9) > Dedup.recallFeasibleBits(0.45))
    // threshold 1.0: identical vectors collide at ANY bit count — the
    // bound must be unbounded, NOT the conservative 1-bit floor (which
    // would force two buckets and an ~n²/4 candidate blowup)
    assert(Dedup.recallFeasibleBits(1.0) === Int.MaxValue)
  }

  test("minhash: sub-n-token docs neither blow up candidates nor change reported pairs") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // exact dup of 1
      (3L, "completely different words here entirely")
    ) ++ (100L to 160L).map(i => (i, "hi")) // 61 docs below n=3 tokens
    val df = docs.toDF("doc_id", "text")
    val got = Dedup.minhashLshPairs(df, "doc_id", "text", n = 3,
      numHashes = 32, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // the 61 short docs previously all collided in EVERY band (all-null
    // signatures hash identically) — ~1.8k discarded candidate pairs for
    // this corpus, quadratic at web scale; they are unindexable and must
    // neither pair with each other nor suppress the real pair
    assert(got === Set((1L, 2L)))
  }

  test("knn/ivf hygiene: a NaN corpus vector never outranks real neighbors") {
    val dim = 8
    def unit(i: Int): Array[Float] = {
      val a = Array.fill(dim)(0.0f); a(i % dim) = 1.0f; a
    }
    val corpus = ((0L until 16L).map(i => (i, unit(i.toInt))) :+
      (99L, Array.fill(dim)(Float.NaN))).toDF("vec_id", "embedding")
    val queries = Seq((0L, unit(0))).toDF("vec_id", "embedding")
    // NaN sorts above every real double in a desc sort — pre-fix, id 99
    // was the rank-1 neighbor of every query with cosine = NaN
    val brute = Similarity.bruteForceKnn(corpus, queries, "vec_id", "embedding", 3)
      .select("n_id").as[Long].collect().toSet
    assert(!brute.contains(99L), s"NaN vector ranked in brute knn: $brute")
    val ivf = Similarity.ivfKnn(corpus, queries, "vec_id", "embedding", k = 3,
      nCells = 4, nProbe = 4)
      .select("n_id").as[Long].collect().toSet
    assert(!ivf.contains(99L), s"NaN vector ranked in ivf knn: $ivf")
    assert(ivf.nonEmpty)
  }

  test("connectedComponents labels every node with its component min (vs union-find reference)") {
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { trial =>
      val n = 30 + trial * 10
      val edges = Seq.fill(2 * n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2).distinct
      // union-find with union-by-min: find() yields the component minimum
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(id => id -> find(id.toInt).toLong).toMap
      // both strategies must agree with the reference
      val dist = Dedup.connectedComponents(edges.toDF("id_a", "id_b"), driverEdgeThreshold = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val drv = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(dist === expected, s"trial $trial distributed mismatch")
      assert(drv === expected, s"trial $trial driver mismatch")
    }
  }

  test("connectedComponents converges across a long chain (multi-round propagation)") {
    val chain = (0L until 8L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(chain, driverEdgeThreshold = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(labels.length === 9 && labels.forall(_._2 == 0L))
  }

  test("connectedComponents matches union-find on a 500-node random graph") {
    val rnd = new scala.util.Random(11)
    val n = 500
    val edges = Seq.fill(700)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(e => e._1 != e._2).distinct
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(id => id -> find(id.toInt).toLong).toMap
    val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"), driverEdgeThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("connectedComponents fails loudly when the round bound truncates the fixpoint") {
    val chain = (0L until 10L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIters = 3, driverEdgeThreshold = 0)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("star contraction: O(log n) rounds on a 10^4-node chain (diameter-proof CC)") {
    // a 10^4-hop path is the adversarial shape for label propagation
    // (needs ~10^4 rounds = diameter); star contraction must finish in a
    // logarithmic number of contraction rounds and still label every node
    // with the component minimum
    val n = 10000L
    val chain = spark.range(0, n - 1).selectExpr("id AS u", "id + 1 AS v")
    val (labels, rounds) = Dedup.starContractionComponents(chain, maxIters = 40)
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === n)
    assert(got.forall(_._2 == 0L), "every chain node must collapse to min id 0")
    assert(rounds <= 30, s"star contraction took $rounds rounds — not logarithmic")
  }

  test("dedupSpans removes repeated n-token spans everywhere but their first occurrence") {
    // d1 shares the spans "a b c" and "b c d" with d0; d0 holds the
    // canonical (first) occurrences, so only d1's tokens 2..5 are removed.
    // d2 is untouched; d3 duplicates d0's span a third time and also loses it.
    val docs = Seq(
      (0L, "a b c d e x"),
      (1L, "z a b c d q"),
      (2L, "unique words only here"),
      (3L, "a b c tail")
    ).toDF("doc_id", "text")
    val got = Dedup.dedupSpans(docs, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(got(0) === ((0L, "a b c d e x", 0L)))
    assert(got(1) === ((1L, "z q", 4L)))
    assert(got(2) === ((2L, "unique words only here", 0L)))
    assert(got(3) === ((3L, "tail", 3L)))
    // a fully-duplicated doc comes back empty, not absent
    val dup = Seq((0L, "p q r"), (5L, "p q r")).toDF("doc_id", "text")
    val got2 = Dedup.dedupSpans(dup, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(got2.toSeq === Seq((0L, "p q r", 0L), (5L, "", 3L)))
    // docs SHORTER than the span length (incl. empty) pass through
    // untouched — they can emit no occurrence (regression: sequence(1,0)
    // is [1,0] descending, not empty)
    val short = Seq((0L, "a b"), (1L, ""), (2L, "a b c d"), (3L, "a b c d"), (4L, null))
      .toDF("doc_id", "text")
    val got3 = Dedup.dedupSpans(short, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(got3.toSeq === Seq((0L, "a b", 0L), (1L, "", 0L), (2L, "a b c d", 0L),
      (3L, "", 4L), (4L, "", 0L)))
  }

  test("dedupLines removes corpus-wide duplicated lines except the first occurrence") {
    // the C4 boilerplate rule: the shared header/footer lines survive only
    // in d0 (first occurrence); blank lines are structure and never dedup
    val docs = Seq(
      (0L, "SITE HEADER\nreal content zero\n\nSITE FOOTER"),
      (1L, "SITE HEADER\nreal content one\nSITE FOOTER"),
      (2L, "all original\n\nlines here")
    ).toDF("doc_id", "text")
    val got = Dedup.dedupLines(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(got(0) === ((0L, "SITE HEADER\nreal content zero\n\nSITE FOOTER", 0L)))
    assert(got(1) === ((1L, "real content one", 2L)))
    assert(got(2) === ((2L, "all original\n\nlines here", 0L)))
    // a doc that is ONLY boilerplate comes back empty, not absent
    val all = Seq((0L, "x\ny"), (9L, "x\ny")).toDF("doc_id", "text")
    val got2 = Dedup.dedupLines(all, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(got2.toSeq === Seq((0L, "x\ny", 0L), (9L, "", 2L)))
    // CRLF lines match their LF twins; tab-only lines are structure (never
    // dedup'd); null text = empty doc with n_removed 0, never -1
    val mixed = Seq(
      (0L, Some("HEAD\nbody zero\n\t")),
      (1L, Some("HEAD\r\nbody one\r\n\t")),
      (2L, None)
    ).toDF("doc_id", "text")
    val got3 = Dedup.dedupLines(mixed, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(got3.toSeq === Seq(
      (0L, "HEAD\nbody zero\n\t", 0L),
      (1L, "body one\n\t", 1L),
      (2L, "", 0L)))
  }

  test("index family rejects non-integral id columns loudly (no silent null-cast no-op)") {
    val stringIds = Seq(("u-1", "alpha beta gamma delta"), ("u-2", "alpha beta gamma delta"))
      .toDF("uid", "text")
    val e = intercept[IllegalArgumentException](
      LshIndex.build(stringIds, "uid", "text", TestSpark.freshDir("lsh-strid")))
    assert(e.getMessage.contains("cast") && e.getMessage.contains("uid"))
    val stringVecIds = Seq(("u-1", Array.fill(4)(0.5f))).toDF("uid", "embedding")
    intercept[IllegalArgumentException](
      EmbIndex.build(stringVecIds, "uid", "embedding", TestSpark.freshDir("emb-strid"), 0.9))
    intercept[IllegalArgumentException](
      IvfIndex.build(stringVecIds, "uid", "embedding", TestSpark.freshDir("ivf-strid")))
    // integral widths narrower than long stay accepted
    val intIds = Seq((1, "alpha beta gamma delta"), (2, "alpha beta gamma delta x"))
      .toDF("doc_id", "text")
    assert(LshIndex.build(intIds, "doc_id", "text", TestSpark.freshDir("lsh-intid")) === 2L)
  }

  test("persisted LSH index: incremental batch query matches the in-session cross pairs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    val dir = TestSpark.freshDir("lsh-index")
    val indexed = LshIndex.build(corpus, "doc_id", "text", dir,
      n = 3, numHashes = 64, bands = 32)
    assert(indexed === corpus.count())
    val got = LshIndex.queryBatch(spark, dir, batch, "doc_id", "text", threshold = 0.5)
      .select("id_new", "id_indexed").as[(Long, Long)].collect().toSet
    // same params/seed as the in-session search ⇒ identical buckets ⇒ the
    // batch query returns exactly the union's verified pairs that cross
    // the batch/corpus boundary (within-batch pairs are out of scope)
    val batchIds = batch.select(col("doc_id")).as[Long].collect().toSet
    val expect = Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, numHashes = 64, bands = 32, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect()
      .flatMap { case (a, b) =>
        if (batchIds(a) && !batchIds(b)) Some((a, b))
        else if (batchIds(b) && !batchIds(a)) Some((b, a))
        else None
      }.toSet
    assert(got === expect, s"cross-pair mismatch: got ${got.size}, expected ${expect.size}")
  }

  test("LSH index append folds a batch in; the next query dedups against it") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docs.filter(pmod(col("doc_id"), lit(10)).isin(1, 2, 3, 4))
      .select("doc_id", "text") // align columns with the synthetic-row union below
    // plant a guaranteed cross-wave near-dup: a wave1 doc carrying the
    // text of a wave2 doc, so "appended docs are live index entries" is
    // falsifiable regardless of the corpus' organic near-dups
    val firstWave2 = docs.filter(pmod(col("doc_id"), lit(10)).isin(7, 8))
      .orderBy("doc_id").select("doc_id", "text")
      .as[(Long, String)].head()
    val wave1 = docs.filter(pmod(col("doc_id"), lit(10)).isin(5, 6))
      .select("doc_id", "text")
      .union(Seq((999995L, firstWave2._2)).toDF("doc_id", "text"))
    val wave2 = docs.filter(pmod(col("doc_id"), lit(10)).isin(7, 8))
    val dir = TestSpark.freshDir("lsh-index-append")
    LshIndex.build(corpus, "doc_id", "text", dir, n = 3, numHashes = 64, bands = 32)
    assert(LshIndex.append(spark, dir, wave1, "doc_id", "text") === wave1.count())
    // wave2 queried against corpus + wave1 must equal a fresh index over
    // the union (identical deterministic signatures/buckets)
    val got = LshIndex.queryBatch(spark, dir, wave2, "doc_id", "text", threshold = 0.5)
      .select("id_new", "id_indexed").as[(Long, Long)].collect().toSet
    val freshDir = TestSpark.freshDir("lsh-index-union")
    LshIndex.build(corpus.union(wave1), "doc_id", "text", freshDir,
      n = 3, numHashes = 64, bands = 32)
    val expect = LshIndex.queryBatch(spark, freshDir, wave2, "doc_id", "text", threshold = 0.5)
      .select("id_new", "id_indexed").as[(Long, Long)].collect().toSet
    assert(got === expect)
    // the planted twin proves appended rows are live: identical text ⇒
    // Jaccard 1 ⇒ the pair MUST surface through the appended entries
    assert(got.contains((firstWave2._1, 999995L)),
      s"planted wave1 twin not found via the appended index: $got")
  }

  test("appendBatch is idempotent: replaying a micro-batch never duplicates pairs") {
    val corpus = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val wave = Seq((10L, "alpha beta gamma delta zeta")).toDF("doc_id", "text")
    val probe = Seq((20L, "alpha beta gamma delta eta")).toDF("doc_id", "text")
    val dir = TestSpark.freshDir("lsh-index-replay")
    LshIndex.build(corpus, "doc_id", "text", dir, n = 3, numHashes = 64, bands = 32)
    // the same batch lands twice (Spark replays micro-batches on failure)
    assert(LshIndex.appendBatch(spark, dir, wave, "doc_id", "text", batchId = 5L) === 1L)
    assert(LshIndex.appendBatch(spark, dir, wave, "doc_id", "text", batchId = 5L) === 1L)
    val got = LshIndex.queryBatch(spark, dir, probe, "doc_id", "text", threshold = 0.4)
      .select("id_new", "id_indexed").as[(Long, Long)].collect().toSeq
    // ONE row per (probe, indexed) pair — a duplicated shingle partition
    // would emit (20,10) twice
    assert(got.sorted === Seq((20L, 1L), (20L, 10L)), s"got $got")
  }

  test("a replayed batch neither self-matches its prior partition nor keeps stale rows") {
    val corpus = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val batch = Seq((10L, "totally fresh words nobody wrote before")).toDF("doc_id", "text")
    val dir = TestSpark.freshDir("lsh-index-selfmatch")
    LshIndex.build(corpus, "doc_id", "text", dir, n = 3, numHashes = 64, bands = 32)
    // first attempt appended the survivors, then the sink died pre-commit
    assert(LshIndex.appendBatch(spark, dir, batch, "doc_id", "text", batchId = 3L) === 1L)
    // the replay's probe must EXCLUDE batch 3: without the exclusion the
    // survivor self-matches at Jaccard 1 and the replay sinks nothing
    assert(LshIndex.queryBatch(spark, dir, batch, "doc_id", "text", 0.5).count() === 1L)
    assert(LshIndex.queryBatch(spark, dir, batch, "doc_id", "text", 0.5,
      excludeBatch = Some(3L)).count() === 0L)
    // and a replay that computes FEWER rows truly replaces the partition
    // (dynamic partition overwrite would have left the stale row alive)
    assert(LshIndex.appendBatch(spark, dir, batch.limit(0), "doc_id", "text", batchId = 3L) === 0L)
    val left = spark.read.parquet(s"${LshIndex.dataDir(spark, dir)}/shingles.parquet")
      .filter(col("batch") === 3L).count()
    assert(left === 0L, s"stale rows survived the shrinking replay: $left")
  }

  test("LSH index skips sub-n-token docs (empty shingle sets) on both sides") {
    // empty shingle sets share one signature: without the filter every
    // short doc collides with every other in all bands (quadratic
    // candidates that the 0/0-Jaccard verify then throws away)
    val corpus = Seq((1L, "too short"), (2L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val batch = Seq((10L, "tiny"), (20L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val dir = TestSpark.freshDir("lsh-index-short")
    assert(LshIndex.build(corpus, "doc_id", "text", dir, n = 3) === 1L) // doc 1 unindexable
    val got = LshIndex.queryBatch(spark, dir, batch, "doc_id", "text", threshold = 0.5)
      .select("id_new", "id_indexed").as[(Long, Long)].collect().toSet
    assert(got === Set((20L, 2L))) // the real near-dup; no short-doc pair, no crash
  }

  test("positional dedup fails loudly when ids overflow the packed (id,pos) key") {
    // xxhash64-derived ids span the full signed 64-bit range; silently
    // overflowing id*2^20+pos would corrupt canonical-occurrence selection
    val docs = Seq(
      (1L << 43, "dup line\nbody a"),
      (7L, "dup line\nbody b")
    ).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.dedupLines(docs, "doc_id", "text").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("packed-key contract")), s"unexpected error: $e")
    // negative ids within range stay legal (canonical = min packed key)
    val neg = Seq((-5L, "x\nsame"), (3L, "y\nsame")).toDF("doc_id", "text")
    val got = Dedup.dedupLines(neg, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq === Seq((-5L, "x\nsame"), (3L, "y")))
  }

  test("LSH index compaction folds aged batches: probes bit-identical, replay stays safe") {
    val dir = TestSpark.freshDir("lsh-index-compact")
    LshIndex.build(Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text"),
      "doc_id", "text", dir, n = 3, numHashes = 64, bands = 32)
    LshIndex.appendBatch(spark, dir,
      Seq((10L, "red green blue yellow purple")).toDF("doc_id", "text"),
      "doc_id", "text", batchId = 0L)
    LshIndex.appendBatch(spark, dir,
      Seq((11L, "one two three four five")).toDF("doc_id", "text"),
      "doc_id", "text", batchId = 1L)
    LshIndex.appendBatch(spark, dir,
      Seq((12L, "cat dog bird fish mouse")).toDF("doc_id", "text"),
      "doc_id", "text", batchId = 2L)
    // probes near-duplicating each indexed doc: every pair crosses one batch
    val probe = Seq(
      (20L, "alpha beta gamma delta zeta"),
      (21L, "red green blue yellow pink"),
      (22L, "one two three four six"),
      (23L, "cat dog bird fish gerbil")).toDF("doc_id", "text")
    def pairs(exclude: Option[Long] = None): Set[(Long, Long)] =
      LshIndex.queryBatch(spark, dir, probe, "doc_id", "text", threshold = 0.5,
        excludeBatch = exclude)
        .select("id_new", "id_indexed").as[(Long, Long)].collect().toSet
    val before = pairs()
    assert(before === Set((20L, 1L), (21L, 10L), (22L, 11L), (23L, 12L)))
    LshIndex.compact(spark, dir, upToBatch = 1L)
    val batches = spark.read.parquet(s"${LshIndex.dataDir(spark, dir)}/shingles.parquet")
      .select("batch").distinct().as[Long].collect().toSet
    assert(batches === Set(-1L, 2L), s"unexpected partitions after compact: $batches")
    // probe results bit-identical across the fold
    assert(pairs() === before)
    // a (contract-violating) replay of a folded batch: appendBatch no-ops
    // instead of duplicating, and excludeBatch still hides the folded
    // rows via their src_batch — no self-match, no data loss
    assert(LshIndex.appendBatch(spark, dir,
      Seq((11L, "one two three four five")).toDF("doc_id", "text"),
      "doc_id", "text", batchId = 1L) === 0L)
    assert(pairs() === before, "replay after compaction duplicated index rows")
    assert(pairs(exclude = Some(1L)) === before - ((22L, 11L)),
      "excludeBatch lost track of a compacted batch's rows")
    // idempotent re-compaction folding the rest
    LshIndex.compact(spark, dir, upToBatch = 2L)
    assert(pairs() === before)
    assert(spark.read.parquet(s"${LshIndex.dataDir(spark, dir)}/shingles.parquet")
      .select("batch").distinct().as[Long].collect().toSet === Set(-1L))
  }

  test("probe broadcast hints are size-gated: an over-limit batch falls back to shuffle joins") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    val dir = TestSpark.freshDir("lsh-index-gate")
    LshIndex.build(corpus, "doc_id", "text", dir, n = 3, numHashes = 64, bands = 32)
    val hinted = LshIndex.queryBatch(spark, dir, batch, "doc_id", "text", threshold = 0.5)
    // broadcastRowLimit = 0 models a corpus-sized backfill batch: the
    // hints must disappear from the plan (AQE then decides), because an
    // unconditional broadcast of a corpus-sized side is a driver OOM
    val gated = LshIndex.queryBatch(spark, dir, batch, "doc_id", "text", threshold = 0.5,
      broadcastRowLimit = 0L)
    assert(hinted.queryExecution.optimizedPlan.toString.contains("strategy=broadcast"),
      "expected the small-batch path to carry broadcast hints")
    assert(!gated.queryExecution.optimizedPlan.toString.contains("strategy=broadcast"),
      "over-limit batch still carries broadcast hints")
    // and with auto-broadcast off, the gated plan really is shuffle joins
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = LshIndex.queryBatch(spark, dir, batch, "doc_id", "text", threshold = 0.5,
        broadcastRowLimit = 0L).queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), s"gated probe still broadcasts:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"gated probe shows no shuffle join:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    // identical pairs either way
    val a = hinted.select("id_new", "id_indexed").as[(Long, Long)].collect().toSet
    val b = gated.select("id_new", "id_indexed").as[(Long, Long)].collect().toSet
    assert(a === b)
  }

  test("LshIndex rebuild is crash-atomic: probes answer from the old generation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    val dir = TestSpark.freshDir("lsh-crash")
    LshIndex.build(corpus, "doc_id", "text", dir, n = 3, numHashes = 64, bands = 32)
    val before = LshIndex.queryBatch(spark, dir, batch, "doc_id", "text", threshold = 0.5)
      .select("id_new", "id_indexed").as[(Long, Long)].collect().toSet
    // simulate a crash ANYWHERE mid-rebuild (both table writes included):
    // rebuild with DIFFERENT params over a different corpus, then undo
    // the rebuild's meta-pointer publish — exactly the state a crash
    // before the pointer commit leaves. The old generation's
    // meta+tables must still be fully paired.
    LshIndex.build(corpus.limit(3), "doc_id", "text", dir, n = 2, numHashes = 32, bands = 16)
    IndexTestHooks.undoLastMetaPublish(dir)
    val after = LshIndex.queryBatch(spark, dir, batch, "doc_id", "text", threshold = 0.5)
      .select("id_new", "id_indexed").as[(Long, Long)].collect().toSet
    assert(after === before, "probe after a crashed rebuild must answer from the old generation")
  }

  test("EmbIndex rebuild is crash-atomic: probes answer from the old generation") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    val batch = emb.filter(col("vec_id") % 10 === 0)
    val dir = TestSpark.freshDir("emb-crash")
    EmbIndex.build(corpus, "vec_id", "embedding", dir, threshold = 0.45)
    val before = EmbIndex.queryBatch(spark, dir, batch, "vec_id", "embedding", 0.45)
      .select("id_new", "id_indexed").as[(Long, Long)].collect().toSet
    // crashed rebuild: different params, pointer publish undone — the
    // crash-before-pointer state
    EmbIndex.build(corpus.limit(3), "vec_id", "embedding", dir, threshold = 0.9,
      bits = 4, tables = 2)
    IndexTestHooks.undoLastMetaPublish(dir)
    val after = EmbIndex.queryBatch(spark, dir, batch, "vec_id", "embedding", 0.45)
      .select("id_new", "id_indexed").as[(Long, Long)].collect().toSet
    assert(after === before, "probe after a crashed rebuild must answer from the old generation")
  }

  test("LshIndex control plane (gen publish/sweep, batch drops, compaction) runs on a registered Hadoop scheme") {
    // same graftfs: proof as the IvfIndex test: java.nio cannot resolve
    // these paths, so green here means the generation sweep, the
    // appendBatch partition delete-then-write, and the two-phase
    // compaction fold all go through Path.getFileSystem
    lshControlPlaneOn("graftfs", classOf[graft.GraftTestFs].getName, "lsh-hadoopfs")
  }

  test("LshIndex control plane runs on the pure Hadoop branch (non-raw-local scheme)") {
    // graftfs: is a RawLocalFileSystem, so ControlFs routes its byte I/O
    // through the local nio fast path; clusterfs: wraps it in a
    // FilterFileSystem, defeating the fast-path match — this run takes
    // the same ControlFs branch a real hdfs://s3a:// deployment does
    // (fs.create claims, fs.open reads, listStatus listings)
    lshControlPlaneOn("clusterfs", classOf[graft.ClusterTestFs].getName, "lsh-clusterfs")
  }

  private def lshControlPlaneOn(scheme: String, fsImpl: String, prefix: String): Unit = {
    spark.sparkContext.hadoopConfiguration.set(s"fs.$scheme.impl", fsImpl)
    val local = TestSpark.freshDir(prefix)
    val dir = s"$scheme:$local"
    val corpus = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    LshIndex.build(corpus, "doc_id", "text", dir, n = 3, numHashes = 64, bands = 32)
    val gen1 = LshIndex.dataDir(spark, dir)
    assert(gen1.startsWith(s"$scheme:"), s"dataDir left the index scheme: $gen1")
    // replayable appends + a probe against appended rows, all through the scheme
    assert(LshIndex.appendBatch(spark, dir,
      Seq((10L, "completely novel text about spark and catalyst engines")).toDF("doc_id", "text"),
      "doc_id", "text", batchId = 0L) === 1L)
    assert(LshIndex.appendBatch(spark, dir,
      Seq((20L, "an entirely different sentence mentioning warehouses and lakes")).toDF("doc_id", "text"),
      "doc_id", "text", batchId = 1L) === 1L)
    val got = LshIndex.queryBatch(spark, dir,
      Seq((30L, "completely novel text about spark and catalyst motors")).toDF("doc_id", "text"),
      "doc_id", "text", threshold = 0.5)
      .select("id_new", "id_indexed").as[(Long, Long)].collect().toSet
    assert(got === Set((30L, 10L)), s"probe through the scheme: $got")
    // two-phase compaction fold (staging + plan marker + moves) on the scheme
    LshIndex.compact(spark, dir, upToBatch = 0L)
    val parts = new java.io.File(s"${local}${gen1.stripPrefix(s"$scheme:$local")}/shingles.parquet")
      .list().filter(_.startsWith("batch=")).sorted.toSeq
    assert(parts === Seq("batch=-1", "batch=1"),
      s"compaction through the scheme left an unexpected layout: $parts")
    // rebuild publishes a fresh generation and sweeps the old one
    LshIndex.build(corpus, "doc_id", "text", dir, n = 3, numHashes = 64, bands = 32)
    val gen2 = LshIndex.dataDir(spark, dir)
    assert(gen2 !== gen1, "rebuild must publish a new generation")
    // probe still answers (from the new generation)
    assert(LshIndex.queryBatch(spark, dir,
      Seq((40L, "the quick brown fox jumps over the lazy cat")).toDF("doc_id", "text"),
      "doc_id", "text", threshold = 0.5).count() === 1L)
  }

  test("EmbIndex excludes width-mismatched batch vectors instead of wedging replays") {
    val dir = TestSpark.freshDir("emb-width")
    val corpus = Seq((1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)), (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    EmbIndex.build(corpus, "vec_id", "embedding", dir, threshold = 0.9)
    // a batch carrying one WIDTH-MISMATCHED embedding (a 2-dim row in a
    // 4-dim index) must neither crash the probe nor the replayable
    // append — pre-fix the signature kernel's loud dim guard threw inside
    // the micro-batch on every replay, permanently wedging EmbDedupStream
    val bad = Seq((10L, Seq(1.0f, 0.0f, 0.0f, 0.0f)), (11L, Seq(1.0f, 0.5f)))
      .toDF("vec_id", "embedding")
    val got = EmbIndex.queryBatch(spark, dir, bad, "vec_id", "embedding", 0.9)
      .select("id_new", "id_indexed").as[(Long, Long)].collect().toSet
    assert(got === Set((10L, 1L)), s"clean row must match, mismatched row must drop: $got")
    assert(EmbIndex.appendBatch(spark, dir, bad, "vec_id", "embedding", 7L) === 1L)
    // the replay (Spark re-runs failed micro-batches) survives too
    assert(EmbIndex.appendBatch(spark, dir, bad, "vec_id", "embedding", 7L) === 1L)
    // a width-clean mixed BUILD also signs only the pinned width
    val mixDir = TestSpark.freshDir("emb-width-build")
    val mixed = corpus.union(Seq((3L, Seq(1.0f, 0.5f))).toDF("vec_id", "embedding"))
    assert(EmbIndex.build(mixed, "vec_id", "embedding", mixDir, threshold = 0.9) === 2L)
  }

  test("star contraction agrees with union-find on a 500-node random graph") {
    val rnd = new scala.util.Random(11)
    val n = 500
    val edges = Seq.fill(700)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(e => e._1 != e._2).distinct
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(id => id -> find(id.toInt).toLong).toMap
    // through the public API: starContraction opts the distributed path in
    val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"),
        driverEdgeThreshold = 0, starContraction = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("fused HyperplaneSignatures matches the per-table reference formulation bit-for-bit") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), Similarity.normalize(col("embedding")).as("v"))
      .limit(50)
    val bits = 7
    val tables = 3
    val fused = emb.select(col("vec_id"),
      graft.functions.VectorOps.hyperplane_signatures(col("v"), bits, tables).as("sigs"))
    val reference = emb.select(col("vec_id") +:
      (0 until tables).map(t =>
        Similarity.hyperplaneSignature(col("v"), bits, seed = 7 + t).as(s"s$t")): _*)
    val f = fused.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    reference.collect().foreach { r =>
      val sigs = f(r.getLong(0))
      (0 until tables).foreach(t => assert(sigs(t) === r.getLong(1 + t)))
    }
  }
}

class TextOpsSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import graft.operators.Sampling

  test("stopwordCount matches symbol-edged custom words (\\b could never match them)") {
    // \b needs a word/non-word TRANSITION at both edges: quoted "c++"
    // followed by a space has none after '+', so the old \b-anchored
    // pattern silently counted 0 for every normal occurrence
    val df = Seq("c++ rocks and c++ rolls", "the c+++x", "net vs .net here").toDF("text")
    val cpp = df.select(TextAnalysis.stopwordCount(col("text"), Seq("c++")).as("n"))
      .as[Long].collect().toSeq
    // "c+++x" counts: the char after the matched "c++" is '+', a
    // non-word char, so the trailing lookahead passes (symbol-edged
    // words have no crisper boundary notion than "not glued to \\w")
    assert(cpp === Seq(2L, 1L, 0L))
    val dotnet = df.select(TextAnalysis.stopwordCount(col("text"), Seq(".net")).as("n"))
      .as[Long].collect().toSeq
    assert(dotnet === Seq(0L, 0L, 1L))
    // default all-letter lists are \b-equivalent (oracle portability)
    val en = Seq("the cat in the hat").toDF("text")
      .select(TextAnalysis.stopwordCount(col("text")).as("n")).as[Long].head()
    assert(en === 3L) // the, in, the
  }

  test("hyperplane_signatures rejects bits outside [1, 64] (1L << b wraps mod 64)") {
    // bits 64+ would silently ALIAS onto bits 0+ — wrong LSH buckets,
    // no error anywhere; explicit bits bypass the auto-sizing caps so
    // the expression itself must validate
    val e = intercept[IllegalArgumentException] {
      Seq(Seq(1.0, 0.0)).toDF("v")
        .select(graft.functions.VectorOps.hyperplane_signatures(col("v"), 70, 1, 2)).collect()
    }
    assert(e.getMessage.contains("bits"), s"unexpected: ${e.getMessage}")
  }

  test("hash sampling is deterministic and matches the portable arithmetic") {
    val df = spark.range(10000).toDF("id")
    val s1 = Sampling.hashSample(df, "id", 0.1).select("id").as[Long].collect().toSet
    val s2 = Sampling.hashSample(df, "id", 0.1).select("id").as[Long].collect().toSet
    assert(s1 === s2) // reproducible split
    val expect = (0L until 10000L)
      .filter(id => ((id % Sampling.P) * Sampling.A + Sampling.B) % Sampling.P
        < (0.1 * Sampling.P).toLong)
      .toSet
    assert(s1 === expect) // engine-portable formula
    assert(math.abs(s1.size - 1000) < 200, s"sample size ${s1.size} far from rate")
  }

  test("hashBucket: nonzero seed + full-range keys stay overflow-free and in [0, P)") {
    import graft.operators.Sampling.{A, B, P}
    val keys = Seq(Long.MaxValue, Long.MaxValue - 17L, Long.MinValue + 3L, 0L, 12345L)
    val df = keys.toDF("k")
    for (seed <- Seq(0L, 1000L, -77L, Long.MaxValue)) {
      val got = df.select(graft.operators.Sampling.hashBucket(col("k"), seed).as("b"))
        .as[Long].collect()
      // BigInt reference of the same formula — no 64-bit wrap anywhere
      val expect = keys.map { k =>
        val kp = ((BigInt(k) mod P) + P) mod P
        val sp = ((BigInt(seed) mod P) + P) mod P
        (((kp + sp) mod P) * A + B).mod(P).toLong
      }
      assert(got.toSeq === expect, s"seed=$seed")
      assert(got.forall(b => b >= 0 && b < P))
    }
  }

  test("splitByHash/interleaveByWeight refuse to overwrite a caller's output column") {
    val df = Seq((1L, "train")).toDF("id", "split")
    val e = intercept[IllegalArgumentException](
      Sampling.splitByHash(df, "id", Seq("a" -> 0.5, "b" -> 0.5)))
    assert(e.getMessage.contains("'split'"))
    val df2 = Seq((1L, "en", 0.5)).toDF("id", "lang", "mix_pos")
    intercept[IllegalArgumentException](
      Sampling.interleaveByWeight(df2, "id", "lang", Map("en" -> 2.0)))
  }

  test("splitByHash partitions every row; train band equals hashSample at the same rate") {
    val df = spark.range(10000).toDF("id")
    val split = Sampling.splitByHash(df, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("id", "split").as[(Long, String)].collect()
    assert(split.length === 10000) // a partition, not a sample: nothing dropped
    val byName = split.groupBy(_._2).view.mapValues(_.length).toMap
    assert(math.abs(byName("train") - 8000) < 300, s"train share off: $byName")
    assert(math.abs(byName("val") - 1000) < 200 && math.abs(byName("test") - 1000) < 200, byName.toString)
    // band consistency: the train split IS hashSample(0.8)'s keep set
    val sampled = Sampling.hashSample(df, "id", 0.8).select("id").as[Long].collect().toSet
    assert(split.filter(_._2 == "train").map(_._1).toSet === sampled)
    // invalid shares fail loudly
    intercept[IllegalArgumentException] {
      Sampling.splitByHash(df, "id", Seq("a" -> 0.8, "b" -> 0.4))
    }
  }

  test("vertical tab is a WORD character, matching the RE2 oracles") {
    // Java \\s includes \\x0B, RE2 \\s (DuckDB) does not -- the engine
    // standardizes on the RE2 set, so "a<VT>b" is ONE token everywhere
    val vt = "\u000B"
    val docs = Seq((1L, s"a${vt}b c d")).toDF("doc_id", "text")
    val toks = docs.select(TextAnalysis.tokens(col("text"))).head().getSeq[String](0)
    assert(toks === Seq(s"a${vt}b", "c", "d"))
    val sh = docs.select(Dedup.shingles(col("text"), 3)).head().getSeq[String](0)
    assert(sh === Seq(s"a${vt}b c d")) // 3 tokens -> exactly one trigram
    // \\x0B counts as a mark, not whitespace, in the punct class too
    assert(docs.select(TextAnalysis.punctCount(col("text"))).head().getInt(0) === 1)
    // and a VT-only line is CONTENT for line dedup (RE2 \\S matches it)
    val lines = Seq((1L, s"$vt\nx"), (2L, s"$vt\ny")).toDF("doc_id", "text")
    val got = Dedup.dedupLines(lines, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got === Seq((1L, s"$vt\nx"), (2L, "y"))) // dup VT line removed from doc 2
  }

  test("chunking matches the sliding-window model on 60 random documents") {
    val rnd = new scala.util.Random(13)
    val docs = (0 until 60).map { i =>
      val n = rnd.nextInt(50) // 0..49 tokens
      (i.toLong, (0 until n).map(j => s"w$j").mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    for ((size, stride) <- Seq((4, 3), (7, 7), (5, 2))) {
      val got = TextAnalysis.chunk(df, "doc_id", "text", size, stride)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
      docs.foreach { case (id, text) =>
        val toks = text.split(" ").filter(_.nonEmpty)
        val expect = (0 until toks.length by stride).zipWithIndex.map { case (st, ci) =>
          val slice = toks.slice(st, st + size)
          (id, ci.toLong, slice.mkString(" "), slice.length.toLong)
        }
        assert(got.getOrElse(id, Seq.empty) === expect,
          s"doc $id (${toks.length} tokens, size=$size stride=$stride)")
      }
    }
  }

  test("int8 quantization model-checks on 60 random vectors") {
    val rnd = new scala.util.Random(17)
    val vecs = (0 until 60).map { i =>
      val dim = 1 + rnd.nextInt(8)
      (i.toLong, Seq.fill(dim)((rnd.nextFloat() - 0.5f) * rnd.nextInt(100)))
    }
    val got = Embeddings.quantizeInt8(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    vecs.foreach { case (id, v) =>
      val amax = v.map(x => math.abs(x.toDouble)).max
      val scale = amax / 127.0
      val expect = v.zipWithIndex.map { case (x, pos) =>
        val q = if (amax == 0.0) 0L else math.floor(x.toDouble / scale + 0.5).toLong
        (id, pos.toLong, q, math.floor(scale * 1e6 + 0.5).toLong)
      }
      assert(got(id) === expect, s"vec $id: $v")
      assert(got(id).forall(c => math.abs(c._3) <= 127L), s"q out of int8 range for $id")
    }
  }

  test("ngramRarity sums corpus document frequencies per doc, exactly") {
    val docs = Seq(
      (1L, "a b c d"), // shingles: "a b c"(df2), "b c d"(df2)
      (2L, "a b c d e"), // "a b c"(2), "b c d"(2), "c d e"(1)
      (3L, "x y"), // too short: no shingles
      (4L, "p q r") // "p q r"(1)
    ).toDF("doc_id", "text")
    val got = TextAnalysis.ngramRarity(docs, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got === Seq((1L, 2L, 4L), (2L, 3L, 5L), (3L, 0L, 0L), (4L, 1L, 1L)))
  }

  test("topKPerGroup keeps the best k per group and pre-prunes map-side") {
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 30L), (3L, "a", 20L), (4L, "a", 30L),
      (5L, "b", 5L)
    ).toDF("id", "grp", "score")
    val got = Sampling.topKPerGroup(df, "grp", Seq(col("score").desc, col("id")), k = 2)
      .select("id", "grp", "rk").as[(Long, String, Long)].collect().toSet
    // score ties (ids 2 and 4 at 30) break on the lower id
    assert(got === Set((2L, "a", 1L), (4L, "a", 2L), (5L, "b", 1L)))
    // the rank filter must trigger the map-side group-limit prune — at
    // scale this is what keeps the window shuffle k-bounded per partition
    val plan = Sampling.topKPerGroup(df, "grp", Seq(col("score").desc, col("id")), k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no map-side group limit in plan:\n$plan")
  }

  test("semantic dedup reports only exact pairs and finds most of brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val sem = Dedup.semanticNearDupPairs(emb, "vec_id", "embedding", 0.45, k = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val brute = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sem.subsetOf(brute), s"false positives: ${sem -- brute}")
    // near-dup pairs (cosine >= 0.45) mostly co-cluster at k=8; the
    // boundary-straddling remainder is SemDeDup's documented recall loss
    assert(brute.nonEmpty)
    val recall = (sem & brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"semantic recall too low: $recall ($sem of $brute)")
  }

  test("semantic dedup auto-k: two-level assignment arm stays exact-verified and finds twins") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // plant exact twins: identical vectors take identical argmaxes at
    // BOTH levels, so they always co-cluster — the pair is guaranteed
    // regardless of where the approximate assignment draws boundaries
    val twins = emb.orderBy("vec_id").limit(5)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val corpus = emb.select("vec_id", "embedding").union(twins)
    // targetClusterRows = 2 drives k = ceil(n/2) far past the 256-cluster
    // gate → the two-level arm runs on this operation-sized corpus
    val sem = Dedup.semanticNearDupPairs(corpus, "vec_id", "embedding", 0.45,
      targetClusterRows = 2L)
      .select("id_a", "id_b", "cosine")
      .as[(Long, Long, Double)].collect()
    val pairs = sem.map(p => (p._1, p._2)).toSet
    val brute = Dedup.embeddingNearDupPairs(corpus, "vec_id", "embedding", 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.subsetOf(brute), s"false positives: ${pairs -- brute}")
    val twinIds = twins.select("vec_id").as[Long].collect().toSet
    twinIds.foreach { t =>
      assert(pairs.contains((t - 1000000L, t)),
        s"planted twin ($t) not paired by the two-level arm: $pairs")
    }
    // every emitted cosine is the exact verify (twins at exactly 1.0)
    sem.filter(p => twinIds(p._2) && p._1 == p._2 - 1000000L)
      .foreach(p => assert(math.abs(p._3 - 1.0) < 1e-9))
  }

  test("chunking covers every token with the configured overlap") {
    val docs = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), // 10 tokens
      (2L, "a b"), // shorter than one chunk
      (3L, ""), // empty: no chunks
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunk(docs, "doc_id", "text", chunkSize = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(got === Seq(
      (1L, 0L, "t0 t1 t2 t3", 4L),
      (1L, 1L, "t3 t4 t5 t6", 4L), // one-token overlap (stride 3 of 4)
      (1L, 2L, "t6 t7 t8 t9", 4L),
      (1L, 3L, "t9", 1L), // tail chunk, clamped
      (2L, 0L, "a b", 2L)))
  }

  test("simhashPairs(maxDist=0) finds exact-signature pairs without degenerating") {
    // chunks=1 means one 64-bit chunk: (1L << 64) folds to 1 on the JVM,
    // which zeroed the chunk mask and bucketed EVERY row together (the
    // all-pairs join the banding exists to avoid) — regression test
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"), // identical text = identical simhash
      (3L, "completely different words entirely here")
    ).toDF("doc_id", "text")
    val got = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)))
  }

  test("sampling fails loudly on null / non-numeric keys instead of emptying the sample") {
    // cast-to-null keys previously made `bucket < threshold` null and the
    // filter silently dropped every row — an empty "sample" with no error
    val bad = Seq(("url-a", "en"), ("url-b", "de")).toDF("doc_key", "lang")
    val e = intercept[Exception] {
      Sampling.hashSample(bad, "doc_key", 0.5).collect()
    }
    assert(e.getMessage.contains("non-numeric"), s"unexpected error: ${e.getMessage}")
    // numeric strings still hash fine (stable portable key)
    val ok = Seq(("123", "en"), ("456", "de")).toDF("doc_key", "lang")
    Sampling.hashSample(ok, "doc_key", 1.0).collect() // must not throw
  }

  test("weighted sampling keeps each row at its own clamped probability") {
    // prob 0 never keeps, prob >= 1 always keeps, nulls drop; mid-range
    // reproduces the portable arithmetic exactly
    val df = spark.range(10000).select(col("id"),
      (col("id") % 4).cast("double").as("quarter"))
    val out = Sampling.weightedHashSample(df, "id", col("quarter") / 2.0)
      .select("id").as[Long].collect().toSet
    val expect = (0L until 10000L).filter { id =>
      val p = math.min(1.0, math.max(0.0, (id % 4).toDouble / 2.0))
      ((id % Sampling.P) * Sampling.A + Sampling.B) % Sampling.P <
        math.floor(p * Sampling.P.toDouble).toLong
    }.toSet
    assert(out === expect)
    assert((0L until 10000L).filter(_ % 4 == 0).forall(id => !out.contains(id)), "p=0 kept a row")
    assert((0L until 10000L).filter(_ % 4 >= 2).forall(out.contains), "p>=1 dropped a row")
    // null and NaN probabilities drop the row rather than keeping it
    // unscored (Spark orders NaN above 1.0, so a naive clamp keeps it)
    val withNull = Seq((1L, Some(1.0)), (2L, None), (3L, Some(Double.NaN))).toDF("id", "p")
    assert(Sampling.weightedHashSample(withNull, "id", col("p"))
      .select("id").as[Long].collect().toSeq === Seq(1L))
  }

  test("stratified sampling applies per-stratum rates") {
    val df = spark.range(20000)
      .select(col("id"), (col("id") % 2 === 0).cast("string").as("stratum"))
    val out = Sampling.stratifiedHashSample(df, "id", "stratum",
      Map("true" -> 0.5, "false" -> 0.05)).groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(out("true") - 5000L) < 400, s"stratum rate off: $out")
    assert(math.abs(out("false") - 500L) < 150, s"stratum rate off: $out")
  }

  test("normalize_text: trim, whitespace collapse, lowercase, Unicode NFC") {
    val decomposed = "  Café   NOISY\tText \n" // 'e' + combining acute (NFD)
    val out = Seq(decomposed).toDF("t")
      .select(graft.functions.TextNormalize.normalize_text(col("t"))).head().getString(0)
    assert(out === "café noisy text") // composed é: NFD input folds to NFC
    // `\s`-strip only (unlike String.trim, which also eats control chars —
    // the SQL-regex formulation of this pipeline must agree exactly)
    val ctl = Seq("x").toDF("t")
      .select(graft.functions.TextNormalize.normalize_text(col("t"))).head().getString(0)
    assert(ctl === "x")
  }

  test("redactPii masks emails, IPv4s and phone-like runs") {
    val s = "mail a.b+c@x-y.org or 10.1.2.3 or +1 (555) 010-1234 end"
    val out = Seq(s).toDF("t")
      .select(TextAnalysis.redactPii(col("t"))).head().getString(0)
    assert(out === "mail [EMAIL] or [IP] or [PHONE] end")
  }

  test("interleaveByWeight: a position-ordered prefix carries strata at weight ratios") {
    val df = spark.range(3000)
      .select(col("id"), (col("id") % 3).cast("string").as("s"))
    val out = Sampling.interleaveByWeight(df, "id", "s", Map("0" -> 2.0, "1" -> 1.0),
      defaultWeight = 0.5)
    // first 700 positions: stratum 0 at 2/s, 1 at 1/s, 2 at 0.5/s
    val prefix = out.orderBy("mix_pos", "s", "id").limit(700)
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(prefix("0") - 2.0 * prefix("1")) <= 2, s"mix off: $prefix")
    assert(math.abs(prefix("1") - 2.0 * prefix("2")) <= 2, s"mix off: $prefix")
    // deterministic: same input → same positions
    val again = Sampling.interleaveByWeight(df, "id", "s", Map("0" -> 2.0, "1" -> 1.0),
      defaultWeight = 0.5)
    assert(out.orderBy("mix_pos", "s", "id").limit(50).collect().toSeq ===
      again.orderBy("mix_pos", "s", "id").limit(50).collect().toSeq)
  }

  test("repetitionSignals: repeated words raise the ratio") {
    val df = Seq((1L, "a b c d"), (2L, "a a a b")).toDF("id", "text")
    val out = TextAnalysis.repetitionSignals(df, "text")
      .select("id", "repetition_ratio").as[(Long, Double)].collect().toMap
    assert(out(1L) === 0.0)
    assert(math.abs(out(2L) - 0.5) < 1e-12)
  }
}

class SimilaritySuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))).toDF("a", "b", "c")
    val r = df.select(
      Similarity.cosine(col("a"), col("b")),
      Similarity.cosine(col("a"), col("c"))).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("IVF ANN achieves high recall vs brute force at nProbe=8/16 cells") {
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceKnn(emb, queries, "vec_id", "embedding", 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfKnn(emb, queries, "vec_id", "embedding", 5,
      nCells = 16, nProbe = 8, kmeansIters = 0)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.6, s"IVF recall too low: $recall")
    // Lloyd-refined centroids must not lose recall vs the raw seed
    val refined = Similarity.ivfKnn(emb, queries, "vec_id", "embedding", 5,
      nCells = 16, nProbe = 8, kmeansIters = 2)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall2 = (brute & refined).size.toDouble / brute.size
    assert(recall2 >= recall - 0.05, s"refined recall regressed: $recall2 vs $recall")
  }

  test("IVF recall@5 >= 0.9 at sf0.1 with sampled seeding + 2 Lloyd iterations") {
    // the synthetic embeddings are near-uniform on the sphere (no real
    // cluster structure), so IVF recall is bounded by the probed fraction
    // of cells regardless of centroid quality — nProbe=10/16 is the
    // smallest probe count that clears 0.9 on this data (clustered real
    // corpora reach it at far smaller fractions)
    val emb01 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val queries = emb01.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceKnn(emb01, queries, "vec_id", "embedding", 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfKnn(emb01, queries, "vec_id", "embedding", 5,
      nCells = 16, nProbe = 10, kmeansIters = 2)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.9, s"IVF recall@5 too low at sf0.1: $recall")
  }

  test("IVF on an empty corpus degrades gracefully to empty output") {
    val empty = emb.filter(col("vec_id") < 0)
    val got = Similarity.ivfKnn(empty, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", 5, nCells = 4, nProbe = 2, kmeansIters = 2)
    assert(got.count() === 0)
  }

  test("persisted IVF index reproduces the in-session index exactly and prunes cells") {
    val dir = graft.TestSpark.freshDir("ivf-index")
    val written = IvfIndex.build(emb, "vec_id", "embedding", dir, nCells = 16, kmeansIters = 2)
    assert(written === 16)
    val queries = emb.filter(col("vec_id") < 8)
    // identical deterministic training (same seeds, same Lloyd) ⇒ the
    // persisted index answers EXACTLY like the in-session one, partial
    // probe included
    val fromIndex = IvfIndex.query(spark, dir, queries, "vec_id", "embedding", k = 5, nProbe = 4)
      .select("q_id", "rank", "n_id").as[(Long, Int, Long)].collect().sorted.toSeq
    val inSession = Similarity.ivfKnn(emb, queries, "vec_id", "embedding", 5,
      nCells = 16, nProbe = 4, kmeansIters = 2)
      .select("q_id", "rank", "n_id").as[(Long, Int, Long)].collect().sorted.toSeq
    assert(fromIndex === inSession)
    // full probe ≡ brute force, through the persisted path
    val full = IvfIndex.query(spark, dir, queries, "vec_id", "embedding", k = 5, nProbe = 16)
      .select("q_id", "rank", "n_id").as[(Long, Int, Long)].collect().sorted.toSeq
    val brute = Similarity.bruteForceKnn(emb, queries, "vec_id", "embedding", 5)
      .select("q_id", "rank", "n_id").as[(Long, Int, Long)].collect().sorted.toSeq
    assert(full === brute)
    // the probed scan must carry a c_id partition filter — only probed
    // cells' files are opened (the I/O point of the IVF layout)
    val plan = IvfIndex.query(spark, dir, queries, "vec_id", "embedding", k = 5, nProbe = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("c_id"),
      s"assignment scan does not prune cells:\n$plan")
  }

  test("IVF append assigns new vectors to existing cells; full probe stays exact") {
    val base = emb.filter(col("vec_id") % 10 =!= 0)
    val extra = emb.filter(col("vec_id") % 10 === 0)
    val dir = graft.TestSpark.freshDir("ivf-index-append")
    IvfIndex.build(base, "vec_id", "embedding", dir, nCells = 16, kmeansIters = 2)
    assert(IvfIndex.append(spark, dir, extra, "vec_id", "embedding") === extra.count())
    val queries = emb.filter(col("vec_id") < 8)
    // nProbe == nCells scans every cell, so the machinery over
    // base + appended must reproduce brute force over the UNION exactly —
    // appended vectors are live, routed, and ranked like built ones
    val full = IvfIndex.query(spark, dir, queries, "vec_id", "embedding", k = 5, nProbe = 16)
      .select("q_id", "rank", "n_id").as[(Long, Int, Long)].collect().sorted.toSeq
    val brute = Similarity.bruteForceKnn(emb, queries, "vec_id", "embedding", 5)
      .select("q_id", "rank", "n_id").as[(Long, Int, Long)].collect().sorted.toSeq
    assert(full === brute)
    // partial probe still prunes partitions (appended files joined their
    // cells' partitions, no stray layout)
    val plan = IvfIndex.query(spark, dir, queries, "vec_id", "embedding", k = 5, nProbe = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("c_id"),
      s"assignment scan does not prune cells after append:\n$plan")
    // appending to an untrained index fails loudly (no centroids to route)
    val emptyDir = graft.TestSpark.freshDir("ivf-index-append-empty")
    IvfIndex.build(emb.filter(col("vec_id") < 0), "vec_id", "embedding", emptyDir)
    val e = intercept[IllegalArgumentException] {
      IvfIndex.append(spark, emptyDir, extra, "vec_id", "embedding")
    }
    assert(e.getMessage.contains("centroids"))
  }

  test("IVF rebalance re-shards overgrown cells, stays exact, no-ops within target") {
    val dir = graft.TestSpark.freshDir("ivf-index-rebal")
    IvfIndex.build(emb, "vec_id", "embedding", dir, nCells = 4, kmeansIters = 2)
    val total = spark.read.parquet(s"${IvfIndex.activeDir(dir)}/assignments.parquet").count()
    val target = 50L
    assert(total / 4 > target, "fixture must start overgrown")
    val newCells = IvfIndex.rebalance(spark, dir, targetCellRows = target)
    val ceilCells = ((total + target - 1) / target).toInt
    // Lloyd may drop dead cells, so <= the requested count but clearly
    // re-sharded past the original 4
    assert(newCells > 4 && newCells <= ceilCells, s"newCells=$newCells ceil=$ceilCells")
    // the rewrite published atomically: a versioned dir + pointer swap,
    // base layout untouched (old-geometry readers were never exposed to
    // half-written state)
    val adir = IvfIndex.activeDir(dir)
    assert(adir !== dir, "rebalance must publish via the CURRENT pointer")
    assert(spark.read.parquet(s"$adir/centroids.parquet").count() === newCells.toLong)
    // no vectors lost or duplicated by the rewrite
    assert(spark.read.parquet(s"$adir/assignments.parquet").count() === total)
    // full probe ≡ brute force through the re-sharded layout
    val queries = emb.filter(col("vec_id") < 8)
    val full = IvfIndex.query(spark, dir, queries, "vec_id", "embedding", k = 5, nProbe = newCells)
      .select("q_id", "rank", "n_id").as[(Long, Int, Long)].collect().sorted.toSeq
    val brute = Similarity.bruteForceKnn(emb, queries, "vec_id", "embedding", 5)
      .select("q_id", "rank", "n_id").as[(Long, Int, Long)].collect().sorted.toSeq
    assert(full === brute)
    // partial probes still prune partitions on the new layout
    val plan = IvfIndex.query(spark, dir, queries, "vec_id", "embedding", k = 5, nProbe = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("c_id"))
    // within-target index is untouched (mean occupancy <= target)
    assert(IvfIndex.rebalance(spark, dir, targetCellRows = total) === newCells)
  }

  test("empty persisted IVF index answers empty, not crashing") {
    val dir = graft.TestSpark.freshDir("ivf-index-empty")
    val written = IvfIndex.build(emb.filter(col("vec_id") < 0), "vec_id", "embedding", dir)
    assert(written === 0)
    assert(IvfIndex.query(spark, dir, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 5, nProbe = 4).count() === 0)
  }

  test("two-level IVF geometry: full probe stays exact, routing never collects cells") {
    // force the two-level path at test scale by dropping the gate under
    // nCells: 16 cells over ceil(sqrt(16))=4 supers
    val dir = graft.TestSpark.freshDir("ivf-two-level")
    val written = IvfIndex.build(emb, "vec_id", "embedding", dir,
      nCells = 16, kmeansIters = 2, twoLevelGate = 4)
    assert(written > 4 && written <= 16, s"written=$written")
    val adir = IvfIndex.activeDir(dir)
    assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(adir, "supers.parquet")),
      "two-level build must persist the super table")
    // every vector is assigned exactly once (the boundary-row join cannot
    // drop or duplicate rows)
    val assigned = spark.read.parquet(s"$adir/assignments.parquet")
    assert(assigned.count() === emb.count())
    assert(assigned.select("n_id").distinct().count() === emb.count())
    // cells carry their super id and ids are unique
    val cells = spark.read.parquet(s"$adir/centroids.parquet")
    assert(cells.columns.toSet === Set("c_id", "c_vec", "s_id"))
    assert(cells.select("c_id").distinct().count() === written.toLong)
    // full probe (all cells via all supers) ≡ brute force: assignment
    // APPROXIMATION cannot lose a vector when every cell is scanned
    val queries = emb.filter(col("vec_id") < 8)
    val full = IvfIndex.query(spark, dir, queries, "vec_id", "embedding",
      k = 5, nProbe = written, wProbe = 4)
      .select("q_id", "rank", "n_id").as[(Long, Int, Long)].collect().sorted.toSeq
    val brute = Similarity.bruteForceKnn(emb, queries, "vec_id", "embedding", 5)
      .select("q_id", "rank", "n_id").as[(Long, Int, Long)].collect().sorted.toSeq
    assert(full === brute)
    // partial two-level probes still prune assignment partitions
    val plan = IvfIndex.query(spark, dir, queries, "vec_id", "embedding",
      k = 5, nProbe = 4, wProbe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("c_id"),
      s"two-level assignment scan does not prune cells:\n$plan")
    // append routes through the same two-level geometry; full probe over
    // base+appended reproduces brute force over the union
    val dir2 = graft.TestSpark.freshDir("ivf-two-level-append")
    val base = emb.filter(col("vec_id") % 10 =!= 0)
    val extra = emb.filter(col("vec_id") % 10 === 0)
    val w2 = IvfIndex.build(base, "vec_id", "embedding", dir2,
      nCells = 16, kmeansIters = 2, twoLevelGate = 4)
    assert(IvfIndex.append(spark, dir2, extra, "vec_id", "embedding") === extra.count())
    val full2 = IvfIndex.query(spark, dir2, queries, "vec_id", "embedding",
      k = 5, nProbe = w2, wProbe = 4)
      .select("q_id", "rank", "n_id").as[(Long, Int, Long)].collect().sorted.toSeq
    assert(full2 === brute)
  }

  test("IVF version protocol: orphan sweep reconciles then deletes; build keeps one generation") {
    val dir = graft.TestSpark.freshDir("ivf-protocol")
    IvfIndex.build(emb, "vec_id", "embedding", dir, nCells = 4, kmeansIters = 2)
    val v1 = IvfIndex.activeDir(dir)
    assert(v1 !== dir, "build must publish via the CURRENT pointer")
    // simulate an append that raced a rebalance: a row that exists ONLY in
    // a superseded/orphan generation (id far outside the corpus id space)
    val strayId = 999999L
    val strayVec = emb.orderBy("vec_id").limit(1)
      .select(Similarity.normalize(col("embedding"))).as[Seq[Double]].head()
    val orphan = s"$dir/v99"
    Seq((strayId, strayVec, 0L)).toDF("n_id", "n_vec", "c_id")
      .write.partitionBy("c_id").parquet(s"$orphan/assignments.parquet")
    spark.read.parquet(s"$v1/centroids.parquet").limit(1)
      .write.parquet(s"$orphan/centroids.parquet")
    // fresh orphan + default grace: the sweep must NOT touch it
    IvfIndex.rebalance(spark, dir, targetCellRows = Long.MaxValue)
    assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(orphan)),
      "orphan inside the grace window must survive")
    // grace 0: the sweep reconciles the stray row into the active
    // geometry, then deletes the orphan
    IvfIndex.rebalance(spark, dir, targetCellRows = Long.MaxValue, orphanGraceMs = 0L)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(orphan)),
      "grace-expired orphan must be swept")
    val ids = spark.read.parquet(s"${IvfIndex.activeDir(dir)}/assignments.parquet")
      .filter(col("n_id") === strayId).count()
    assert(ids === 1L, "sweep must re-route the orphan-only row before deleting")
    // a stray row is queryable after recovery (full probe)
    val hits = IvfIndex.query(spark, dir, emb.filter(col("vec_id") < 2),
      "vec_id", "embedding", k = 1000, nProbe = 4)
      .filter(col("n_id") === strayId).count()
    assert(hits > 0L)
    // rebuild: publishes a NEW version, keeps the just-replaced generation
    // for in-flight readers, prunes nothing else young... and the
    // previous generation is still on disk
    val before = IvfIndex.activeDir(dir)
    IvfIndex.build(emb, "vec_id", "embedding", dir, nCells = 4, kmeansIters = 2)
    val after = IvfIndex.activeDir(dir)
    assert(after !== before)
    assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(before)),
      "build must keep the replaced generation one cycle for in-flight readers")
  }

  test("sweep refuses to destroy a data-bearing generation when the active one cannot accept rows") {
    // empty rebuild supersedes a data-bearing v1; the sweep's reconcile
    // target (empty v2, no assignment table) cannot accept rows, so even
    // at grace 0 the victim must survive — and rebalance on the empty
    // geometry must no-op, not crash
    val dir = graft.TestSpark.freshDir("ivf-empty-rebuild")
    IvfIndex.build(emb, "vec_id", "embedding", dir, nCells = 4, kmeansIters = 2)
    val v1 = IvfIndex.activeDir(dir)
    IvfIndex.build(emb.filter(col("vec_id") < 0), "vec_id", "embedding", dir)
    assert(IvfIndex.activeDir(dir) !== v1)
    assert(IvfIndex.rebalance(spark, dir, targetCellRows = 1L, orphanGraceMs = 0L) === 0)
    assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(v1)),
      "data-bearing generation destroyed although the active geometry could not accept its rows")
  }

  test("IVF control plane runs on a registered Hadoop filesystem scheme") {
    // graftfs: is local disk behind a non-default Hadoop scheme — any
    // pointer/probe/stamp/sweep op still on java.nio cannot resolve these
    // paths and fails loudly, so green here proves the whole protocol
    // goes through Path.getFileSystem (the hdfs://s3a:// deployment shape)
    ivfControlPlaneOn("graftfs", classOf[graft.GraftTestFs].getName, "ivf-hadoopfs")
  }

  test("IVF control plane runs on the pure Hadoop branch (non-raw-local scheme)") {
    // clusterfs: defeats ControlFs's raw-local fast-path match, so the
    // pointer/stamp/sweep protocol runs the exact branch hdfs://s3a://
    // executes (fs.create claims, fs.open reads, listStatus listings)
    ivfControlPlaneOn("clusterfs", classOf[graft.ClusterTestFs].getName, "ivf-clusterfs")
  }

  private def ivfControlPlaneOn(scheme: String, fsImpl: String, prefix: String): Unit = {
    spark.sparkContext.hadoopConfiguration.set(s"fs.$scheme.impl", fsImpl)
    val local = graft.TestSpark.freshDir(prefix)
    val dir = s"$scheme:$local"
    // two-level geometry (gate forced low) so the supers.parquet probe
    // and the grouped routing path also run through the scheme
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val extra = emb.filter(col("vec_id") % 5 === 0)
    val written = IvfIndex.build(base, "vec_id", "embedding", dir, nCells = 4,
      kmeansIters = 1, twoLevelGate = 2)
    assert(written > 0)
    val v1 = IvfIndex.activeDir(dir)
    assert(v1.startsWith(s"$scheme:"), s"activeDir left the index scheme: $v1")
    assert(v1 !== dir, "build must publish a versioned generation")
    // publish protocol: a numbered pointer file, never a mutable CURRENT
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(local, "ptr-v1")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(local, "CURRENT")))
    // append re-resolves the pointer and routes through the scheme
    assert(IvfIndex.append(spark, dir, extra, "vec_id", "embedding") === extra.count())
    val queries = emb.filter(col("vec_id") < 3)
    val brute = Similarity.bruteForceKnn(emb, queries, "vec_id", "embedding", 3)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val full = IvfIndex.query(spark, dir, queries, "vec_id", "embedding", k = 3,
      nProbe = written, wProbe = written)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    assert(full === brute, "full-probe query through the scheme must equal brute force")
    // rebalance: new generation published, old one stamped (an explicit
    // SUPERSEDED file — dir mtimes don't exist on object stores) and kept
    val total = spark.read.parquet(s"$v1/assignments.parquet").count()
    IvfIndex.rebalance(spark, dir, targetCellRows = math.max(1L, total / 16))
    val v2 = IvfIndex.activeDir(dir)
    assert(v2 !== v1, "rebalance must publish a new generation")
    val v1Local = java.nio.file.Paths.get(local, "v1")
    assert(java.nio.file.Files.exists(v1Local.resolve("SUPERSEDED")),
      "superseded generation must carry a stamp file")
    assert(java.nio.file.Files.isDirectory(v1Local),
      "replaced generation must be kept one cycle")
    // grace-0 entry sweep reconciles + deletes the superseded gen through the scheme
    IvfIndex.rebalance(spark, dir, targetCellRows = Long.MaxValue, orphanGraceMs = 0L)
    assert(!java.nio.file.Files.exists(v1Local), "grace-expired generation must be swept")
    val kept = spark.read.parquet(s"${IvfIndex.activeDir(dir)}/assignments.parquet").count()
    assert(kept === emb.count(), "no rows may be lost across publish/sweep cycles")
  }

  test("persisted embedding index: batch query equals brute cross pairs; append folds in") {
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    val batch = emb.filter(col("vec_id") % 10 === 0)
    val dir = graft.TestSpark.freshDir("emb-index")
    val indexed = EmbIndex.build(corpus, "vec_id", "embedding", dir, threshold = 0.45)
    assert(indexed === corpus.count())
    val got = EmbIndex.queryBatch(spark, dir, batch, "vec_id", "embedding", 0.45)
      .select("id_new", "id_indexed").as[(Long, Long)].collect().toSet
    // auto-sized bits/tables reach recall 1 on this data (the in-session
    // LSH path proves the same bound), and the exact-cosine verify kills
    // false positives — so the result IS the brute cross-pair set
    val cb = corpus.select(col("vec_id").as("id_c"), Similarity.normalize(col("embedding")).as("vc"))
    val bb = batch.select(col("vec_id").as("id_b"), Similarity.normalize(col("embedding")).as("vb"))
    val brute = bb.crossJoin(cb)
      .filter(Similarity.dot(col("vb"), col("vc")) >= 0.45)
      .select("id_b", "id_c").as[(Long, Long)].collect().toSet
    assert(got === brute, s"got ${got.size} pairs, brute ${brute.size}")
    // plant a twin of a batch vector, append it, and the pair must appear
    val twin = batch.orderBy("vec_id").limit(1)
      .select(lit(999997L).as("vec_id"), col("embedding"))
    assert(EmbIndex.append(spark, dir, twin, "vec_id", "embedding") === 1L)
    val got2 = EmbIndex.queryBatch(spark, dir, batch, "vec_id", "embedding", 0.45)
      .select("id_new", "id_indexed").as[(Long, Long)].collect().toSet
    val firstBatchId = batch.orderBy("vec_id").select("vec_id").as[Long].head()
    assert(got2.contains((firstBatchId, 999997L)), s"appended twin not live: $got2")
    assert(brute.subsetOf(got2))
  }

  test("embedding index skips degenerate vectors and answers empty on an empty index") {
    val dir = graft.TestSpark.freshDir("emb-index-edge")
    // zero/empty vectors are unindexable (their cosine can never verify)
    val weird = Seq(
      (1L, Seq.fill(4)(0.0f)), // zero
      (2L, Seq.empty[Float]), // empty
      (3L, Seq(1.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    assert(EmbIndex.build(weird, "vec_id", "embedding", dir, threshold = 0.9) === 1L)
    val batch = Seq((10L, Seq(1.0f, 0.01f, 0.0f, 0.0f)), (11L, Seq.fill(4)(0.0f)))
      .toDF("vec_id", "embedding")
    val got = EmbIndex.queryBatch(spark, dir, batch, "vec_id", "embedding", 0.9)
      .select("id_new", "id_indexed").as[(Long, Long)].collect().toSet
    assert(got === Set((10L, 3L))) // the real neighbor; no zero-vector pairs
    // an index over nothing answers empty rather than crashing
    val emptyDir = graft.TestSpark.freshDir("emb-index-empty")
    assert(EmbIndex.build(weird.filter(col("vec_id") < 0), "vec_id", "embedding",
      emptyDir, threshold = 0.9) === 0L)
    assert(EmbIndex.queryBatch(spark, emptyDir, batch, "vec_id", "embedding", 0.9).count() === 0L)
    // an empty build stores dim 0 ("undetermined") — inventing a width
    // would crash the signature kernel's mismatch guard on the first
    // real 4-dim batch; the first non-empty append pins the real width
    assert(EmbIndex.params(spark, emptyDir)._3 === 0)
    assert(EmbIndex.append(spark, emptyDir, batch, "vec_id", "embedding") === 1L)
    assert(EmbIndex.params(spark, emptyDir)._3 === 4)
    val after = EmbIndex.queryBatch(spark, emptyDir,
      Seq((20L, Seq(1.0f, 0.02f, 0.0f, 0.0f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", 0.9)
      .select("id_new", "id_indexed").as[(Long, Long)].collect().toSet
    assert(after === Set((20L, 10L)))
  }

  test("kmeans reaches the Lloyd fixed point and the report proves it") {
    val res = Similarity.kmeans(emb, "vec_id", "embedding", k = 8, maxIters = 60)
    assert(res.converged, s"did not converge in ${res.iterations} iterations")
    assert(res.centroids.length <= 8 && res.centroids.nonEmpty)
    assert(res.assignments.count() === 500)
    val rep = Similarity.kmeansReport(emb, "vec_id", "embedding", k = 8, maxIters = 60).head()
    assert(rep.getLong(rep.fieldIndex("n_assigned")) === 500L)
    assert(rep.getBoolean(rep.fieldIndex("one_cluster_per_vec")))
    assert(rep.getBoolean(rep.fieldIndex("clusters_le_k")))
    assert(rep.getBoolean(rep.fieldIndex("fixed_point_ok")))
    assert(rep.getBoolean(rep.fieldIndex("converged")))
  }

  test("IVF seeding survives zero vectors in the sampled candidates") {
    // a zero vector normalizes to all-NULL elements (SQL x/0 is NULL, not
    // NaN) — unfiltered, it crashed the seed sample's non-nullable
    // Seq[Double] collect before candidate selection even ran
    val withZero = emb.union(
      Seq((9999L, Seq.fill(64)(0.0f), 0)).toDF("vec_id", "embedding", "label"))
    val got = Similarity.ivfKnn(withZero, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", 5, nCells = 4, nProbe = 4, kmeansIters = 1)
    assert(got.groupBy("q_id").count().collect().forall(_.getLong(1) === 5L))
  }

  test("kmeans excludes unclusterable (zero/empty/null) vectors instead of crashing") {
    // a zero vector normalizes to all-NaN; left in, it poisoned its
    // cluster's mean every iteration (one cluster died per pass, then an
    // empty-centroid index crash) — regression test
    val df = Seq(
      (0L, Some(Seq(0.0f, 0.0f, 0.0f, 0.0f))), // zero: no direction
      (1L, Some(Seq.empty[Float])), // empty
      (2L, None), // null
      (3L, Some(Seq(1.0f, 0.0f, 0.0f, 0.1f))),
      (4L, Some(Seq(0.9f, 0.1f, 0.0f, 0.0f))),
      (5L, Some(Seq(0.0f, 0.0f, 1.0f, 0.0f))),
      (6L, Some(Seq(0.1f, 0.0f, 0.9f, 0.0f)))
    ).toDF("vec_id", "embedding")
    val res = Similarity.kmeans(df, "vec_id", "embedding", k = 2, maxIters = 20)
    assert(res.converged, s"did not converge in ${res.iterations} iterations")
    val got = res.assignments.as[(Long, Long)].collect().toMap
    assert(got.keySet === Set(3L, 4L, 5L, 6L)) // unclusterable rows absent
    assert(got(3L) === got(4L) && got(5L) === got(6L) && got(3L) != got(5L))
    // and the report's invariants hold on the same data
    val rep = Similarity.kmeansReport(df, "vec_id", "embedding", k = 2, maxIters = 20).head()
    assert(rep.getLong(rep.fieldIndex("n_assigned")) === 4L)
    assert(rep.getBoolean(rep.fieldIndex("fixed_point_ok")))
  }

  test("width-mismatched vectors are excluded from kmeans; IVF append rejects them loudly") {
    // mixed embedding versions: with the dot kernels now nulling on
    // length mismatch, an unguarded argmax would tie-break every
    // mismatched row into the LOWEST-id cell (silent mis-clustering)
    val mixed = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.1f)), (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 0.0f, 1.0f, 0.0f)), (4L, Seq(0.1f, 0.0f, 0.9f, 0.0f)),
      (5L, Seq(1.0f, 0.5f)) // stale 2-dim embedding
    ).toDF("vec_id", "embedding")
    val res = Similarity.kmeans(mixed, "vec_id", "embedding", k = 2, maxIters = 20)
    assert(res.assignments.as[(Long, Long)].collect().toMap.keySet === Set(1L, 2L, 3L, 4L))
    // the persisted index refuses a mismatched APPEND outright — silent
    // exclusion there would be index data loss
    val dir = graft.TestSpark.freshDir("ivf-dim-guard")
    IvfIndex.build(mixed.filter(col("vec_id") < 5), "vec_id", "embedding", dir, nCells = 2)
    val e = intercept[IllegalArgumentException] {
      IvfIndex.append(spark, dir, Seq((9L, Seq(1.0f, 0.5f))).toDF("vec_id", "embedding"),
        "vec_id", "embedding")
    }
    assert(e.getMessage.contains("different width"), s"unexpected: ${e.getMessage}")
    assert(IvfIndex.append(spark, dir,
      Seq((9L, Seq(0.5f, 0.5f, 0.0f, 0.0f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding") === 1L)
  }

  test("kmeans recovers well-separated synthetic clusters exactly") {
    // three orthogonal directions with small deterministic jitter: every
    // point's nearest true center is its own, so a correct spherical
    // k-means must separate them perfectly
    val pts = (0 until 90).map { i =>
      val g = i % 3
      val base = Array.fill(4)(0.0f)
      base(g) = 1.0f
      base((g + 1) % 4) = 0.01f * (i / 3 % 7) // jitter, deterministic
      (i.toLong, base.toSeq)
    }
    val df = pts.toDF("vec_id", "embedding")
    val res = Similarity.kmeans(df, "vec_id", "embedding", k = 3, maxIters = 30)
    assert(res.converged)
    val byCluster = res.assignments.as[(Long, Long)].collect()
      .groupBy(_._2).values.map(_.map(_._1 % 3).toSet).toSeq
    assert(byCluster.size === 3, s"expected 3 clusters: $byCluster")
    assert(byCluster.forall(_.size === 1), s"clusters mix ground-truth groups: $byCluster")
  }

  test("kmeans distributed path converges on assignment equality, not centroid float bits") {
    // driverPointThreshold = 0 forces the distributed Lloyd loop, which
    // must reach (and REPORT) the fixed point via the integer membership
    // signatures — float centroid-bit comparison could spin to maxIters
    // at a true fixed point because partial-avg merge order varies. The
    // report then proves the genuine fixed point from the emitted
    // assignments, the invariant the cluster_kmeans oracle hard-codes.
    val rep = Similarity.kmeansReport(emb, "vec_id", "embedding", k = 8, maxIters = 60,
      driverPointThreshold = 0L).head()
    assert(rep.getBoolean(rep.fieldIndex("converged")),
      "distributed Lloyd loop did not report convergence within maxIters")
    assert(rep.getBoolean(rep.fieldIndex("fixed_point_ok")))
    assert(rep.getLong(rep.fieldIndex("n_assigned")) === 500L)
  }

  test("EmbIndex appendBatch replays idempotently; excludeBatch prevents self-match") {
    val corpus = Seq((1L, Seq(1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val batch = Seq((10L, Seq(0.0f, 1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val dir = graft.TestSpark.freshDir("emb-index-replay")
    EmbIndex.build(corpus, "vec_id", "embedding", dir, threshold = 0.9)
    // the same micro-batch lands twice (Spark replays after failures)
    assert(EmbIndex.appendBatch(spark, dir, batch, "vec_id", "embedding", 5L) === 1L)
    assert(EmbIndex.appendBatch(spark, dir, batch, "vec_id", "embedding", 5L) === 1L)
    val probe = Seq((20L, Seq(0.0f, 1.0f, 0.01f, 0.0f))).toDF("vec_id", "embedding")
    val got = EmbIndex.queryBatch(spark, dir, probe, "vec_id", "embedding", 0.9)
      .select("id_new", "id_indexed").as[(Long, Long)].collect().toSeq
    // ONE row — a duplicated vector partition would emit (20,10) twice
    assert(got === Seq((20L, 10L)), s"got $got")
    // a replay's probe must be able to EXCLUDE its own prior partition
    assert(EmbIndex.queryBatch(spark, dir, batch, "vec_id", "embedding", 0.9).count() === 1L)
    assert(EmbIndex.queryBatch(spark, dir, batch, "vec_id", "embedding", 0.9,
      excludeBatch = Some(5L)).count() === 0L)
    // and a shrinking replay truly replaces the partition
    assert(EmbIndex.appendBatch(spark, dir, batch.limit(0), "vec_id", "embedding", 5L) === 0L)
    assert(spark.read.parquet(s"${EmbIndex.dataDir(spark, dir)}/vectors.parquet")
      .filter(col("batch") === 5L).count() === 0L)
  }

  test("EmbIndex compaction folds aged batches: probes bit-identical, replay stays safe") {
    def vec(axis: Int, jitter: Float = 0.0f): Seq[Float] = {
      val a = Array.fill(4)(0.0f); a(axis) = 1.0f; a((axis + 1) % 4) = jitter; a.toSeq
    }
    val dir = graft.TestSpark.freshDir("emb-index-compact")
    EmbIndex.build(Seq((1L, vec(0))).toDF("vec_id", "embedding"), "vec_id", "embedding",
      dir, threshold = 0.9)
    EmbIndex.appendBatch(spark, dir,
      Seq((10L, vec(1))).toDF("vec_id", "embedding"), "vec_id", "embedding", 0L)
    EmbIndex.appendBatch(spark, dir,
      Seq((11L, vec(2))).toDF("vec_id", "embedding"), "vec_id", "embedding", 1L)
    EmbIndex.appendBatch(spark, dir,
      Seq((12L, vec(3))).toDF("vec_id", "embedding"), "vec_id", "embedding", 2L)
    // probes near each indexed direction: every pair crosses one batch
    val probe = Seq((20L, vec(0, 0.01f)), (21L, vec(1, 0.01f)),
      (22L, vec(2, 0.01f)), (23L, vec(3, 0.01f))).toDF("vec_id", "embedding")
    def pairs(exclude: Option[Long] = None): Set[(Long, Long)] =
      EmbIndex.queryBatch(spark, dir, probe, "vec_id", "embedding", 0.9,
        excludeBatch = exclude)
        .select("id_new", "id_indexed").as[(Long, Long)].collect().toSet
    val before = pairs()
    assert(before === Set((20L, 1L), (21L, 10L), (22L, 11L), (23L, 12L)))
    EmbIndex.compact(spark, dir, upToBatch = 1L)
    // aged partitions folded into base; the live one untouched
    val batches = spark.read.parquet(s"${EmbIndex.dataDir(spark, dir)}/vectors.parquet")
      .select("batch").distinct().as[Long].collect().toSet
    assert(batches === Set(-1L, 2L), s"unexpected partitions: $batches")
    // probe results bit-identical across the fold
    assert(pairs() === before)
    // a (contract-violating) replay of a folded batch neither duplicates
    // rows nor matches itself: appendBatch no-ops, excludeBatch still
    // hides the folded rows via src_batch
    assert(EmbIndex.appendBatch(spark, dir,
      Seq((11L, vec(2))).toDF("vec_id", "embedding"), "vec_id", "embedding", 1L) === 0L)
    assert(pairs() === before, "replay after compaction duplicated index rows")
    assert(pairs(exclude = Some(1L)) === before - ((22L, 11L)),
      "excludeBatch lost track of a compacted batch's rows")
    // compacting further is idempotent and folds the remaining batch
    EmbIndex.compact(spark, dir, upToBatch = 2L)
    assert(pairs() === before)
    assert(spark.read.parquet(s"${EmbIndex.dataDir(spark, dir)}/vectors.parquet")
      .select("batch").distinct().as[Long].collect().toSet === Set(-1L))
  }

  test("EmbIndex auto bits honor the per-pair miss guarantee under explicit table counts") {
    val dir = graft.TestSpark.freshDir("emb-index-cap")
    EmbIndex.build(emb, "vec_id", "embedding", dir, threshold = 0.45, tables = 4)
    val (bits, tables, _) = EmbIndex.params(spark, dir)
    assert(tables === 4)
    assert(bits <= Dedup.recallFeasibleBits(0.45, maxTables = 4),
      s"auto bits $bits exceed the recall-feasible bound at 4 tables — the " +
        "miss guarantee the scaladoc promises would silently degrade")
  }
}

class EmbeddingsSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("int8 quantization stays in [-127,127] and reconstructs within half a step") {
    val q = Embeddings.quantizeInt8(emb, "vec_id", "embedding")
    val joined = q.join(
      emb.select(col("vec_id"),
        posexplode(transform(col("embedding"), x => x.cast("double")))
          .as(Seq("pos", "x"))),
      Seq("vec_id", "pos"))
      .withColumn("scale", col("scale_micros").cast("double") / 1e6)
      .agg(
        max(abs(col("q"))).as("qmax"),
        // |q*scale - x| <= scale/2 + micros-rounding slack on scale (127 steps)
        max(abs(col("q") * col("scale") - col("x")) - col("scale") * 0.5 - lit(127 * 5e-7))
          .as("worst"))
      .head()
    assert(joined.getLong(0) <= 127L)
    assert(joined.getDouble(1) <= 0.0, s"reconstruction error over bound by ${joined.getDouble(1)}")
  }

  test("zero vectors quantize to all-zero with scale 0; empty vectors emit nothing") {
    val df = Seq(
      (1L, Seq(0.0f, 0.0f, 0.0f)),
      (2L, Seq.empty[Float]),
      (3L, Seq(1.0f, -2.0f))
    ).toDF("vec_id", "embedding")
    val got = Embeddings.quantizeInt8(df, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(x => (x._1, x._2))
    assert(got.filter(_._1 == 1L).toSeq === Seq((1L, 0L, 0L, 0L), (1L, 1L, 0L, 0L), (1L, 2L, 0L, 0L)))
    assert(!got.exists(_._1 == 2L)) // empty vector: no cells
    val v3 = got.filter(_._1 == 3L)
    assert(v3.map(_._3).toSeq === Seq(64L, -127L)) // 1/ (2/127) = 63.5 → 64; -2 → -127
  }

  test("group centroids match a hand-computed elementwise mean") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f), "a"),
      (2L, Seq(3.0f, 6.0f), "a"),
      (3L, Seq(10.0f, 0.0f), "b")
    ).toDF("vec_id", "embedding", "label")
    val got = Embeddings.groupCentroids(df, "label", "embedding")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(got === Seq(
      ("a", 0L, 2000000L, 2L), ("a", 1L, 4000000L, 2L),
      ("b", 0L, 10000000L, 1L), ("b", 1L, 0L, 1L)))
  }
}

class MultimodalSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("real PNG/BMP encode → ImageIO decode roundtrip: features match pixel formulas exactly") {
    val ids = (0L to 8L).toSeq
    val df = ids.toDF("id")
    val media = Multimodal.synthesizeImages(df, "id").collect().map(r =>
      (r.getLong(0), r.getAs[Array[Byte]](1), r.getStruct(2))).sortBy(_._1)
    // even ids PNG (magic \x89PNG), odd ids BMP ("BM") — both real codecs
    assert(media(0)._2.take(4).toSeq === Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    assert(media(1)._2.take(2).toSeq === Seq('B'.toByte, 'M'.toByte))
    assert(media(0)._3.getString(1) === "image/png")
    assert(media(1)._3.getString(1) === "image/bmp")

    val feats = Multimodal.extractImageFeatures(
      Multimodal.synthesizeImages(df, "id"), "id", "media").orderBy("id").collect()
    for (r <- feats) {
      val id = r.getLong(0)
      val (w, h) = Multimodal.synthDims(id)
      assert(r.getLong(1) === w.toLong, s"width id=$id")
      assert(r.getLong(2) === h.toLong, s"height id=$id")
      // recompute expected sums + aHash straight from the integer formulas
      var rs = 0L; var gs = 0L; var bs = 0L
      val cellSum = new Array[Long](64); val cellCnt = new Array[Long](64)
      for (y <- 0 until h; x <- 0 until w) {
        val rr = Multimodal.synthR(id, x, y); val gg = Multimodal.synthG(id, x, y)
        val bb = Multimodal.synthB(id, x, y)
        rs += rr; gs += gg; bs += bb
        val idx = (y * 8 / h) * 8 + (x * 8 / w)
        cellSum(idx) += (rr + gg + bb) / 3; cellCnt(idx) += 1
      }
      val avg = (0 until 64).map(i => if (cellCnt(i) == 0) 0L else cellSum(i) / cellCnt(i))
      val mean = avg.sum / 64
      var hi = 0L; var lo = 0L
      for (i <- 0 until 64 if avg(i) > mean)
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      assert((r.getLong(3), r.getLong(4), r.getLong(5)) === ((rs, gs, bs)), s"sums id=$id")
      assert((r.getLong(6), r.getLong(7)) === ((hi, lo)), s"ahash id=$id")
    }
  }

  test("bilinear resize: exact 2x downscale is the rounding 2x2 box average; 1x is identity") {
    val img = new java.awt.image.BufferedImage(6, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rnd = new scala.util.Random(7)
    for (y <- 0 until 4; x <- 0 until 6) img.setRGB(x, y, rnd.nextInt(1 << 24))
    val half = Multimodal.bilinearResize(img, 3, 2)
    assert(half.getWidth === 3 && half.getHeight === 2)
    for (oy <- 0 until 2; ox <- 0 until 3; shift <- Seq(16, 8, 0)) {
      def ch(x: Int, y: Int) = (img.getRGB(x, y) >> shift) & 0xff
      val exp = (ch(2 * ox, 2 * oy) + ch(2 * ox + 1, 2 * oy) +
        ch(2 * ox, 2 * oy + 1) + ch(2 * ox + 1, 2 * oy + 1) + 2) / 4
      assert(((half.getRGB(ox, oy) >> shift) & 0xff) === exp, s"($ox,$oy) shift=$shift")
    }
    val same = Multimodal.bilinearResize(img, 6, 4)
    for (y <- 0 until 4; x <- 0 until 6) assert(same.getRGB(x, y) === img.getRGB(x, y))
  }

  test("resizeBilinear op: PNG re-encode roundtrips, metadata updated, corrupt media → null") {
    val df = (0L to 3L).toDF("id")
    val resized = Multimodal.resizeBilinear(
      Multimodal.synthesizeImages(df, "id"), "id", "media", 1, 2).orderBy("id").collect()
    for (r <- resized) {
      val id = r.getLong(0)
      val (w, h) = Multimodal.synthDims(id)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
      assert(img.getWidth === w / 2 && img.getHeight === h / 2, s"dims id=$id")
      assert(r.getStruct(2).getString(1) === "image/png")
      assert(r.getStruct(2).getLong(2) === r.getAs[Array[Byte]](1).length.toLong)
    }
    // corrupt payloads survive as null media / null features, id kept
    val junk = Seq((9L, Array[Byte](1, 2, 3))).toDF("id", "media")
      .withColumn("media_meta", org.apache.spark.sql.functions.struct(
        org.apache.spark.sql.functions.lit("image").as("kind"),
        org.apache.spark.sql.functions.lit("image/png").as("mime"),
        org.apache.spark.sql.functions.lit(3L).as("byte_len")))
    val rj = Multimodal.resizeBilinear(junk, "id", "media", 1, 2).collect()
    assert(rj.length === 1 && rj(0).isNullAt(1))
    val fj = Multimodal.extractImageFeatures(junk, "id", "media").collect()
    assert(fj.length === 1 && fj(0).getLong(0) === 9L && fj(0).isNullAt(1))
  }

  test("decode fuzz: every byte-flip and truncation of real PNG/BMP yields a row, never a crash") {
    // the dead-letter contract for pixels: ANY malformed payload maps to
    // null features with the id kept — the JDK decoders throw
    // RuntimeExceptions (not just IOException) on some malformed headers,
    // so this battery walks the whole corruption space of two real
    // encodings: flip each byte (XOR 0xFF) and truncate at each length
    val base = Multimodal.synthesizeImages(Seq(0L, 1L).toDF("id"), "id").collect()
      .map(r => r.getAs[Array[Byte]](1)) // id 0 = PNG, id 1 = BMP
    val corrupted = base.zipWithIndex.flatMap { case (bytes, src) =>
      val flips = bytes.indices.map { i =>
        val b = bytes.clone(); b(i) = (b(i) ^ 0xff).toByte
        (src.toLong * 1000000 + i, b)
      }
      val truncs = (0 until bytes.length).map(n => (src.toLong * 1000000 + 500000 + n, bytes.take(n)))
      flips ++ truncs
    }.toSeq
    val out = Multimodal.extractImageFeatures(
      corrupted.toDF("id", "media"), "id", "media").collect()
    assert(out.length === corrupted.size) // every id survives, decoded or not
    // and plenty of them genuinely fail decode (null features), so the
    // battery exercised the failure path, not just lucky decodes
    assert(out.count(_.isNullAt(1)) > corrupted.size / 4)
  }

  test("decode pixel cap is per-call configurable and refuses over-cap headers undecoded") {
    val media = Multimodal.synthesizeImages(Seq(0L).toDF("id"), "id")
    // a real, small image decodes under the default cap…
    val ok = Multimodal.extractImageFeatures(media, "id", "media").collect()
    assert(ok.length === 1 && !ok(0).isNullAt(1))
    // …and maps to null features (id kept) when the deployment cap is
    // tighter than its declared raster — refused from the HEADER, so the
    // pixel buffer is never allocated
    val refused = Multimodal.extractImageFeatures(media, "id", "media",
      maxDecodePixels = 1L).collect()
    assert(refused.length === 1 && refused(0).getLong(0) === 0L && refused(0).isNullAt(1))
    val refusedResize = Multimodal.resizeBilinear(media, "id", "media", 1, 2,
      maxDecodePixels = 1L).collect()
    assert(refusedResize.length === 1 && refusedResize(0).isNullAt(1))
    // the OUTPUT raster is capped too: a huge upscale of a legitimately
    // decodable image maps to null media instead of allocating the target
    val up = Multimodal.resizeBilinear(media, "id", "media", 1000000, 1).collect()
    assert(up.length === 1 && up(0).isNullAt(1),
      "over-cap upscale target must dead-letter, not allocate")
    // a sane upscale still works
    val ok2 = Multimodal.resizeBilinear(media, "id", "media", 2, 1).collect()
    assert(ok2.length === 1 && !ok2(0).isNullAt(1))
  }

  test("frame sampling keeps byte-exact plumbing (payload slicing; no JDK video codec)") {
    val df = Seq((1L, "abcd" * 50), (2L, "xy")).toDF("id", "payload")
    val media = Multimodal.asMedia(df, "payload", "image", "image/fake")
    assert(media.select("media_meta.byte_len").as[Long].collect().sorted.toSeq === Seq(2L, 200L))
    val frames = Multimodal.sampleFrames(media, "id", "media", frameBytes = 64, everyN = 2)
      .groupBy("id").count().orderBy("id").collect()
    // 200 bytes → 4 frames → keep idx 0,2 → 2 ; 2 bytes → 1 frame → keep idx 0 → 1
    assert(frames(0).getLong(1) === 2L)
    assert(frames(1).getLong(1) === 1L)
  }

  test("multimodal ops fail loudly on null ids (no silent attribution to id 0)") {
    val df = Seq((Some(1L), "abcd"), (None, "efgh")).toDF("id", "payload")
    val media = Multimodal.asMedia(df, "payload", "image", "image/fake")
    val e = intercept[Exception] {
      Multimodal.extractImageFeatures(media, "id", "media").collect()
    }
    assert(e.getMessage.contains("null or non-numeric id"), s"unexpected: ${e.getMessage}")
    val e2 = intercept[Exception] {
      Multimodal.sampleFrames(media, "id", "media").collect()
    }
    assert(e2.getMessage.contains("null or non-numeric id"), s"unexpected: ${e2.getMessage}")
  }

}

class IndexPointerSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("meta-pointer publish is crash-atomic for all four indexes, on a registered Hadoop scheme") {
    metaPointerCrashAtomicOn("graftfs", classOf[graft.GraftTestFs].getName)
  }

  test("meta-pointer publish is crash-atomic for all four indexes on the pure Hadoop branch") {
    // clusterfs: is not a RawLocalFileSystem, so every pointer/stamp op
    // below runs ControlFs's cluster branch, not the local nio fast path
    metaPointerCrashAtomicOn("clusterfs", classOf[graft.ClusterTestFs].getName)
  }

  private def metaPointerCrashAtomicOn(scheme: String, fsImpl: String): Unit = {
    // the r15 ptr-vN protocol (IndexLayout.publishMeta), proven where
    // java.nio cannot follow: for each index family member, (1) a crash
    // BEFORE the pointer commit leaves probes answering from the old
    // generation bit-for-bit, and (2) a crash IN THE MIDDLE of the
    // pointer create (name present, content torn) still resolves — the
    // pointer's name is the commit
    spark.sparkContext.hadoopConfiguration.set(s"fs.$scheme.impl", fsImpl)
    def g(prefix: String): String = s"$scheme:${TestSpark.freshDir(s"$scheme-$prefix")}"
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "an entirely different sentence about warehouses and lakes"),
      (3L, "spark catalyst engines optimize declarative query plans")
    ).toDF("doc_id", "text")

    // LshIndex
    locally {
      val dir = g("ptr-lsh")
      val probe = Seq((30L, "the quick brown fox jumps over the lazy cat")).toDF("doc_id", "text")
      def answer() = LshIndex.queryBatch(spark, dir, probe, "doc_id", "text", threshold = 0.5)
        .select("id_new", "id_indexed").as[(Long, Long)].collect().toSet
      LshIndex.build(docs, "doc_id", "text", dir, n = 3, numHashes = 64, bands = 32)
      val before = answer()
      LshIndex.build(docs.limit(1), "doc_id", "text", dir, n = 2, numHashes = 32, bands = 16)
      IndexTestHooks.undoLastMetaPublish(dir)
      assert(answer() === before, "Lsh: crash-before-pointer must answer from the old generation")
      LshIndex.build(docs, "doc_id", "text", dir, n = 3, numHashes = 64, bands = 32)
      IndexTestHooks.tearLastPointerContent(dir)
      assert(answer() === before, "Lsh: a name-only (torn-content) pointer must resolve")
    }

    // EmbIndex
    locally {
      val dir = g("ptr-emb")
      val corpus = Seq((1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)), (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)))
        .toDF("vec_id", "embedding")
      val probe = Seq((10L, Seq(0.99f, 0.05f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
      def answer() = EmbIndex.queryBatch(spark, dir, probe, "vec_id", "embedding", 0.9)
        .select("id_new", "id_indexed").as[(Long, Long)].collect().toSet
      EmbIndex.build(corpus, "vec_id", "embedding", dir, threshold = 0.9)
      val before = answer()
      EmbIndex.build(corpus.limit(1), "vec_id", "embedding", dir, threshold = 0.5,
        bits = 4, tables = 2)
      IndexTestHooks.undoLastMetaPublish(dir)
      assert(answer() === before, "Emb: crash-before-pointer must answer from the old generation")
      EmbIndex.build(corpus, "vec_id", "embedding", dir, threshold = 0.9)
      IndexTestHooks.tearLastPointerContent(dir)
      assert(answer() === before, "Emb: a name-only (torn-content) pointer must resolve")
    }

    // Search (BM25)
    locally {
      val dir = g("ptr-search")
      def answer() = Search.topKIndexed(spark, dir, Seq("spark"), k = 5)
        .select("id").as[Long].collect().toSet
      Search.buildIndex(docs, "doc_id", "text", dir, termBuckets = 4)
      val before = answer()
      Search.buildIndex(docs.limit(1), "doc_id", "text", dir, termBuckets = 7)
      IndexTestHooks.undoLastMetaPublish(dir)
      assert(answer() === before, "Search: crash-before-pointer must answer from the old generation")
      Search.buildIndex(docs, "doc_id", "text", dir, termBuckets = 4)
      IndexTestHooks.tearLastPointerContent(dir)
      assert(answer() === before, "Search: a name-only (torn-content) pointer must resolve")
    }

    // Decontaminate
    locally {
      val dir = g("ptr-decon")
      val bench = Seq((100L, "secret eval answer text here")).toDF("doc_id", "text")
      val corpus = Seq((1L, "the secret eval answer text here leaked"),
        (2L, "a clean document")).toDF("doc_id", "text")
      def answer() = Decontaminate.overlapReportIndexed(spark, dir, corpus, "doc_id", "text")
        .select("id").as[Long].collect().toSet
      Decontaminate.buildIndex(bench, "doc_id", "text", n = 3, dir = dir)
      val before = answer()
      assert(before === Set(1L))
      Decontaminate.buildIndex(bench.limit(0), "doc_id", "text", n = 2, dir = dir)
      IndexTestHooks.undoLastMetaPublish(dir)
      assert(answer() === before, "Decon: crash-before-pointer must answer from the old generation")
      Decontaminate.buildIndex(bench, "doc_id", "text", n = 3, dir = dir)
      IndexTestHooks.tearLastPointerContent(dir)
      assert(answer() === before, "Decon: a name-only (torn-content) pointer must resolve")
    }
  }

  test("a post-publish retirement failure never fails a build; leftovers stay for the next sweep") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.idxfailx.impl", classOf[graft.IndexCleanupFailTestFs].getName)
    val dir = s"idxfailx:${TestSpark.freshDir("ptr-cleanup-fail")}"
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark catalyst engines optimize declarative query plans")
    ).toDF("doc_id", "text")
    // three rebuilds: every retirement step the guard covers fires and
    // FAILS on this FS — the legacy meta.parquet delete (build 1), the
    // superseded-generation sweep (build 2+), and the pointer/stage
    // prune below the keep-2 window (build 3). Each build must still
    // report success and the index must answer from its newest
    // generation.
    (1 to 3).foreach { _ =>
      LshIndex.build(docs, "doc_id", "text", dir, n = 3, numHashes = 64, bands = 32)
    }
    assert(IndexLayout.currentMetaVersion(dir).contains(3L),
      "three publishes must have landed despite failing retirements")
    val hit = LshIndex.queryBatch(spark, dir,
      Seq((9L, "the quick brown fox jumps over the lazy cat")).toDF("doc_id", "text"),
      "doc_id", "text", threshold = 0.5)
      .select("id_indexed").as[Long].collect().toSet
    assert(hit === Set(1L), s"index must answer from the newest generation: $hit")
    // the injection genuinely hit: superseded generations and old
    // pointers survived their failed sweeps
    val names = graft.fs.ControlFs.listNames(dir)
    assert(names.count(_.startsWith("gen-")) === 3,
      s"failed generation sweeps must leave all generations: $names")
    assert(names.count(_.matches("ptr-v\\d+")) === 3,
      s"failed pointer prunes must leave all pointers: $names")
  }

  test("a foreign stage stamp makes publishMeta skip that version number untouched") {
    import graft.fs.ControlFs
    val dir = TestSpark.freshDir("ptr-stamp")
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    LshIndex.build(docs, "doc_id", "text", dir, n = 3, numHashes = 32, bands = 16)
    assert(IndexLayout.currentMetaVersion(dir).contains(1L))
    // a concurrent publisher (or a crashed one) holds v2: its stamp is
    // there, its meta table is not — the next publish must NOT stage
    // into meta-v2.parquet (the r15 clobber fix), it takes v3
    ControlFs.createExclusive(s"$dir/stg-v2", "someone-else's nonce")
    LshIndex.build(docs, "doc_id", "text", dir, n = 3, numHashes = 32, bands = 16)
    assert(IndexLayout.currentMetaVersion(dir).contains(3L),
      "publisher must skip a stamped version number")
    assert(!ControlFs.exists(s"$dir/meta-v2.parquet"),
      "the stamped (foreign) version's staging dir must never be written")
    // and the index still answers — the committed pointer chain is intact
    val hit = LshIndex.queryBatch(spark, dir,
      Seq((9L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text"),
      "doc_id", "text", threshold = 0.5).count()
    assert(hit === 1L)
  }
}
