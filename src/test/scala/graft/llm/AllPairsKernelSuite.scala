package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** r16: the blocked all-pairs kernel ([[Similarity.allPairsAtLeast]]) —
  * introduced after the sf1 bench sweep measured the row-pair join shape
  * at exponent ~2.1 wall (via degenerate LSH) on the embedding-dedup
  * family. The kernel must be BIT-IDENTICAL to the join arm (same
  * normalize, same dotDD accumulation order), tile correctly across
  * block and group boundaries, and the degenerate-LSH auto-switch must
  * fire exactly when sizing says bucketing cannot prune.
  */
class AllPairsKernelSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Seeded corpus with near-dup structure plus every degenerate shape
    * the join arm tolerates: a zero vector, an empty one, a NaN carrier,
    * and a width-mismatched row.
    */
  private def corpus(n: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    val base = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val rows = (0 until n).map { i =>
      val b = base(rnd.nextInt(base.length))
      val v = b.map(x => x + (rnd.nextGaussian() * 0.35).toFloat)
      (i.toLong, v.toSeq)
    } ++ Seq(
      (n + 1L, Array.fill(dim)(0f).toSeq),      // zero vector
      (n + 2L, Seq.empty[Float]),               // empty
      (n + 3L, Seq.fill(dim)(Float.NaN)),       // NaN
      (n + 4L, Seq.fill(dim / 2)(1f))           // width mismatch
    )
    rows.toDF("vec_id", "embedding")
  }

  /** The join formulation over clusterable vectors — the reference
    * semantics all brute/LSH/kernel arms share since r16 (the pre-r16
    * UNfiltered join also emitted NaN-cosine "pairs" for NaN vectors,
    * because Spark's `>=` ranks NaN greatest — pinned below).
    */
  private def joinPairs(df: org.apache.spark.sql.DataFrame, threshold: Double) = {
    val v = df.select(col("vec_id").as("id"), Similarity.normalize(col("embedding")).as("v"))
      .filter(Similarity.clusterable(col("v")))
    v.alias("a").join(v.alias("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        Similarity.dot(col("a.v"), col("b.v")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  test("kernel output is bit-identical to the pair join, across block boundaries") {
    val df = corpus(700, 16, seed = 7)
    val expected = joinPairs(df, 0.7).as[(Long, Long, Double)].collect().toSet
    assert(expected.nonEmpty, "fixture must produce pairs")
    val vv = df.select(col("vec_id").as("id"), Similarity.normalize(col("embedding")).as("v"))
      .filter(Similarity.clusterable(col("v")))
    // blockRows 128 << 704 rows: tiles genuinely cross block boundaries
    val got = Similarity.allPairsAtLeast(vv, 0.7, blockRows = 128).get
      .as[(Long, Long, Double)].collect().toSet
    assert(got === expected, "kernel must reproduce the join arm exactly (ids AND cosines)")
  }

  test("grouped kernel equals the within-group join; tiles never cross groups") {
    val df = corpus(600, 16, seed = 11)
      .withColumn("cluster", pmod(col("vec_id"), lit(5)).cast("long"))
    val v = df.select(col("cluster"), col("vec_id").as("id"),
      Similarity.normalize(col("embedding")).as("v"))
      .filter(Similarity.clusterable(col("v")))
    val expected = v.alias("a")
      .join(v.alias("b"), col("a.cluster") === col("b.cluster") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        Similarity.dot(col("a.v"), col("b.v")).as("cosine"))
      .filter(col("cosine") >= 0.7)
      .as[(Long, Long, Double)].collect().toSet
    assert(expected.nonEmpty)
    val got = Similarity.allPairsAtLeast(v, 0.7, blockRows = 64, groupCol = Some("cluster"))
      .get.as[(Long, Long, Double)].collect().toSet
    assert(got === expected)
  }

  test("degenerate-LSH auto-switch: un-prunable sizing takes the brute kernel, " +
    "prunable sizing and explicit bits keep the LSH plan") {
    val df = corpus(300, 16, seed = 13)
    // threshold 0.45 auto: recall-feasible bits 6, tables 62 — coverage
    // 62/64 ≈ 0.97 of ALL pairs ⇒ switch. The output stays the exact set.
    val auto = Dedup.embeddingNearDupPairs(df, "vec_id", "embedding", 0.45,
      lshBits = Dedup.AutoSize, lshTables = Dedup.AutoSize)
    assert(!auto.queryExecution.analyzed.toString.toLowerCase.contains("hyperplane"),
      "un-prunable auto sizing must take the brute arm")
    val expected = joinPairs(df, 0.45).select("id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    assert(auto.select("id_a", "id_b").as[(Long, Long)].collect().toSet === expected)
    // explicit bits: the caller owns the trade — LSH plan stays
    val explicit = Dedup.embeddingNearDupPairs(df, "vec_id", "embedding", 0.45,
      lshBits = 8, lshTables = 16)
    assert(explicit.queryExecution.analyzed.toString.toLowerCase.contains("hyperplane"),
      "explicit bits must keep the LSH plan")
  }

  test("auto sizing KEEPS genuine LSH at a realistic threshold once the corpus " +
    "is large enough to prune (the switch's other side)") {
    // at 0.85 and 10k rows: volume bits 10, feasible ~15, tables 33 —
    // coverage 33/1024 ≈ 0.03, well under the switch: the LSH plan must
    // stand. (Small corpora legitimately switch even at 0.85: 5 volume
    // bits put coverage at ~0.4 — LSH on a few hundred rows never made
    // sense, and the output is identical either way.)
    val rnd = new scala.util.Random(17)
    val rows = (0 until 10000).map(i => (i.toLong, Seq.fill(16)(rnd.nextGaussian().toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val auto = Dedup.embeddingNearDupPairs(df, "vec_id", "embedding", 0.85,
      lshBits = Dedup.AutoSize, lshTables = Dedup.AutoSize)
    assert(auto.queryExecution.analyzed.toString.toLowerCase.contains("hyperplane"),
      "a prunable auto sizing must keep the LSH plan")
  }

  test("random-pair coverage is the exact table union, and explicit degenerate " +
    "sizing WARNs with it (r17)") {
    // exact 1-(1-2^-bits)^tables, not the r16 linear tables·2^-bits: at
    // bits 6 / tables 62 the linear estimate said 0.97; the true union is
    // ≈0.62 — still past the 0.25 break-even, so the auto switch stands
    val c = Similarity.lshRandomPairCoverage(6, 62)
    assert(math.abs(c - (1.0 - math.pow(63.0 / 64.0, 62))) < 1e-12)
    assert(c > 0.6 && c < 0.65)
    // single table degenerates to 2^-bits exactly; more tables only add
    assert(Similarity.lshRandomPairCoverage(10, 1) === math.pow(2.0, -10))
    assert(Similarity.lshRandomPairCoverage(10, 64) <= 64 * math.pow(2.0, -10))
    // explicit degenerate sizing: the caller keeps the plan but gets told
    val warned = Dedup.degenerateLshWarning(bits = 6, tables = 62, threshold = 0.45)
    assert(warned.exists(m => m.contains("coverage") && m.contains("brute")),
      s"degenerate explicit sizing must WARN, got $warned")
    // healthy explicit sizing (coverage ≈0.06): silence
    assert(Dedup.degenerateLshWarning(bits = 8, tables = 16, threshold = 0.45).isEmpty)
  }

  test("a NaN vector is a near-dup of NOTHING on every arm (r16 semantics pin)") {
    // pre-r16, the unfiltered brute join emitted (x, nanId, NaN) pairs —
    // Spark's `>=` ranks NaN above every threshold; the LSH arm never
    // did. All arms now agree on the clusterable contract.
    val df = corpus(50, 8, seed = 5)
    val nanId = 53L // corpus() appends the NaN carrier at id n + 3
    val brute = Dedup.embeddingNearDupPairs(df, "vec_id", "embedding", 0.3)
    assert(brute.filter(col("id_a") === nanId || col("id_b") === nanId).count() === 0)
    val lsh = Dedup.embeddingNearDupPairs(df, "vec_id", "embedding", 0.3, lshBits = 6)
    assert(lsh.filter(col("id_a") === nanId || col("id_b") === nanId).count() === 0)
  }

  test("the byte gate falls back to the join plan (None) past the broadcast cap") {
    // 2 rows but a dim large enough to exceed a tiny synthetic reading of
    // the REAL gate is impractical — instead pin the arithmetic: the gate
    // is n * dim * 8 bytes against AllPairsKernelBytes
    assert(Similarity.AllPairsKernelBytes === (64L << 20))
    // and the public behavior: a frame comfortably under the gate returns Some
    val small = corpus(50, 8, seed = 3)
      .select(col("vec_id").as("id"), Similarity.normalize(col("embedding")).as("v"))
      .filter(Similarity.clusterable(col("v")))
    assert(Similarity.allPairsAtLeast(small, 0.5).isDefined)
  }
}
