package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns
  * (`Array[Float]`), all in double precision for cross-engine
  * determinism.
  *
  * Scale design: the brute-force path broadcasts the (small) query set so
  * the corpus is scanned exactly once with no shuffle; the IVF path
  * shrinks the scanned corpus to the probed cells (classic
  * inverted-file/coarse-quantizer layout); hyperplane LSH turns the
  * all-pairs problem into bucket-equality joins.
  */
/** Result of [[Similarity.kmeans]]: per-vector assignments
  * (id, cluster), the final centroid set, whether the Lloyd fixed point
  * was reached, and how many iterations ran. Unclusterable vectors
  * (null/empty/zero — no direction on the unit sphere) are excluded
  * from the assignments.
  */
final case class KmeansResult(
    assignments: DataFrame,
    centroids: Array[(Long, Array[Double])],
    converged: Boolean,
    iterations: Int
)

object Similarity {

  /** dot(a,b) with double accumulation — a fused codegen'd kernel (see
    * [[graft.functions.ArrayDot]]); bit-identical to the sequential
    * aggregate-HOF formulation but allocation-free per pair.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorOps.array_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** L2-normalize — fused kernel ([[graft.functions.ArrayNormalize]]).
    * The HOF `transform(a, x => x / sqrt(dot(a,a)))` form re-evaluated
    * the dot inside the per-element lambda (subexpression elimination
    * does not reach lambda bodies): O(d²) per row, corpus-wide, in every
    * embedding operator. The kernel computes the norm once and is
    * bit-identical (same accumulation order, same SQL null/zero-norm
    * semantics).
    */
  def normalize(a: Column): Column = graft.functions.VectorOps.array_normalize(a)

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** True iff a NORMALIZED vector is a usable unit direction: non-null,
    * non-empty, EVERY element non-NULL and non-NaN, and at least one
    * element non-zero. Degeneracy is per-element, not just whole-vector:
    * a zero vector normalizes to all-NULL (SQL x/0); a single NULL input
    * element nulls only its own slot; an Infinity ELEMENT turns into NaN
    * while finite siblings become 0; and an all-FINITE vector whose
    * squared norm overflows to +Inf normalizes to all-zeros (finite/Inf)
    * with no NULL or NaN anywhere — the nonzero clause catches that last
    * case (a true unit vector always has a nonzero element).
    */
  private[llm] def clusterable(nVec: Column): Column =
    nVec.isNotNull && size(nVec) > 0 &&
      size(filter(nVec, x => x.isNull || isnan(x))) === 0 &&
      size(filter(nVec, x => x =!= 0.0)) > 0

  /** Byte cap for [[allPairsAtLeast]]'s driver collect+broadcast of the
    * normalized vector set (n × dim × 8 B): 64 MB ≈ 128k 64-dim vectors.
    * Past it the caller keeps the distributed pair-join plan — at that
    * scale an exact all-pairs pass is the wrong tool anyway (CAPS table;
    * the scale paths are high-threshold LSH, SemDeDup clusters, and the
    * persisted indexes).
    */
  private[llm] val AllPairsKernelBytes: Long = 64L << 20

  /** Expected fraction of ALL pairs that become LSH candidates purely by
    * chance: each of `tables` independent tables buckets a random pair
    * together with probability `2^-bits` (sign agreement on independent
    * hyperplanes), so coverage is `1 − (1 − 2^-bits)^tables` — the exact
    * union over tables, not the r16 linear estimate `tables · 2^-bits`,
    * which overstates coverage well above the 0.25 break-even (bits 6 /
    * tables 62: linear "0.97" vs true ≈0.62). At ≥0.25 the bucket join
    * stops pruning relative to brute volume and LSH's per-candidate
    * machinery (explode + join + distinct) costs more than it saves.
    */
  private[llm] def lshRandomPairCoverage(bits: Int, tables: Int): Double =
    1.0 - math.pow(1.0 - math.pow(2.0, -bits.toDouble), tables.toDouble)

  /** Break-even random-pair coverage for the degenerate-LSH switches —
    * shared by [[graft.llm.Dedup.embeddingNearDupPairs]] (auto-sized arm
    * switches to brute) and [[graft.llm.EmbIndex]] (probe cross-verifies).
    */
  private[llm] val LshDegenerateCoverage: Double = 0.25

  /** Exact all-pairs `cosine >= threshold` over a NORMALIZED,
    * [[clusterable]]-filtered (id, v) frame — optionally within groups
    * (`groupCol`: the SemDeDup within-cluster verify) — as a BLOCKED
    * kernel instead of a row-pair join: rows are collected sorted by
    * (group, id) behind a byte gate (the broadcast-KNN discipline),
    * broadcast once, the driver derives the (block_i, block_j) tile list
    * per group, and each task computes one tile with a tight double-FMA
    * loop. The arithmetic is the join arm's exactly
    * ([[graft.functions.VectorOps.dotDD]]: sequential index-order double
    * accumulation over [[normalize]]d doubles), so the output is
    * bit-identical — at matrix-multiply cost instead of per-pair join
    * machinery (measured at sf1, 20k × 64f: 76 s join → ~2 s kernel,
    * SCALE.md r16). Returns None past [[AllPairsKernelBytes]];
    * width-mismatched pairs are skipped (the join arm's NULL-dot drop),
    * equal-id pairs excluded like `a.id < b.id`.
    */
  private[llm] def allPairsAtLeast(
      vv: DataFrame,
      threshold: Double,
      blockRows: Int = 2048,
      groupCol: Option[String] = None): Option[DataFrame] = {
    val spark = vv.sparkSession
    import spark.implicits._
    // LongType ids only: the kernel keys its collected rows by a long, so
    // any other id type (string/uuid, or even int — whose output schema
    // would silently widen) keeps the join arm, which orders and returns
    // the ORIGINAL id type for free. Behavior must not depend on corpus
    // size for ids the kernel cannot represent.
    if (vv.schema("id").dataType != org.apache.spark.sql.types.LongType) return None
    // gate measured BEFORE collecting: one small agg over the (typically
    // checkpointed) frame
    val head = vv.agg(count(lit(1)), max(size(col("v")))).head()
    val n = head.getLong(0)
    val dim = if (head.isNullAt(1)) 1 else math.max(1, head.getInt(1))
    if (n * dim * 8L > AllPairsKernelBytes) return None
    val g = groupCol.map(c => col(c).cast("long")).getOrElse(lit(0L))
    val data = vv.select(g.as("g"), col("id").cast("long"), col("v").cast("array<double>"))
      .as[(Long, Long, Array[Double])].collect().sortBy(r => (r._1, r._2))
    val bc = spark.sparkContext.broadcast(data)
    // tile list: per group segment, the upper triangle of its blocks —
    // (aStart, bStart, end-of-b-block); the diagonal tile is aStart ==
    // bStart and the inner loop starts past x there
    val tiles = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var s = 0
    while (s < data.length) {
      var e = s
      while (e < data.length && data(e)._1 == data(s)._1) e += 1
      val nB = (e - s + blockRows - 1) / blockRows
      var i = 0
      while (i < nB) {
        var j = i
        while (j < nB) {
          tiles += ((s + i * blockRows, s + j * blockRows,
            math.min(e, s + (j + 1) * blockRows)))
          j += 1
        }
        i += 1
      }
      s = e
    }
    val tileArr = tiles.toArray
    val bl = blockRows
    val thr = threshold
    val out = spark
      .range(0L, tileArr.length.toLong, 1L,
        math.max(1, math.min(tileArr.length, spark.sparkContext.defaultParallelism * 2)))
      .mapPartitions { it =>
        val rows = bc.value
        it.flatMap { tIdx =>
          val (aStart, bStart, bEnd) = tileArr(tIdx.toInt)
          val aEnd = math.min(bEnd, aStart + bl) // a-block never crosses its group end
          // pairs are emitted LAZILY, one at a time, instead of buffering a
          // per-tile ArrayBuffer: at a low threshold on near-dup-heavy data
          // a tile can match up to blockRows² pairs (~4.2M boxed tuples,
          // hundreds of MB) — a per-task memory spike the streamed join arm
          // never has. Same (x, y) traversal order, same arithmetic →
          // bit-identical output (AllPairsKernelSuite).
          new scala.collection.AbstractIterator[(Long, Long, Double)] {
            private var x = aStart
            private var y = if (aStart == bStart) aStart + 1 else bStart
            private var va: Array[Double] = if (x < aEnd) rows(x)._3 else null
            private var ida: Long = if (x < aEnd) rows(x)._2 else 0L
            private var nxt: (Long, Long, Double) = _
            private var has = false
            private def advance(): Unit = {
              has = false
              while (!has && x < aEnd) {
                if (y >= bEnd) {
                  x += 1
                  y = if (aStart == bStart) x + 1 else bStart
                  if (x < aEnd) { va = rows(x)._3; ida = rows(x)._2 }
                } else {
                  val ry = rows(y)
                  val vb = ry._3
                  if (va.length == vb.length && ida != ry._2) {
                    var acc = 0.0
                    var d = 0
                    val len = va.length
                    while (d < len) { acc += va(d) * vb(d); d += 1 }
                    if (acc >= thr) { nxt = ((ida, ry._2, acc)); has = true }
                  }
                  y += 1
                }
              }
            }
            advance()
            def hasNext: Boolean = has
            def next(): (Long, Long, Double) = { val r = nxt; advance(); r }
          }
        }
      }
      .toDF("id_a", "id_b", "cosine")
    Some(out)
  }

  /** Sign-bit signature against `bits` deterministic pseudo-random
    * hyperplanes (seeded per index): bucket key for cosine LSH. `seed`
    * varies the plane set — multi-table LSH uses one seed per table.
    * Retained as the parity oracle for the fused
    * [[graft.functions.HyperplaneSignatures]] kernel (LlmSuite asserts
    * bit-equality) — production index builds use the fused expression.
    */
  def hyperplaneSignature(v: Column, bits: Int, dim: Int = 64, seed: Long = 7): Column = {
    val rnd = new scala.util.Random(seed)
    val planes = Seq.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
    val vd = transform(v, _.cast("double"))
    val bitsCols: Seq[Column] = planes.zipWithIndex.map { case (p, i) =>
      when(graft.functions.VectorOps.array_dot(vd, lit(p)) >= 0, lit(1L << i))
        .otherwise(lit(0L))
    }
    bitsCols.reduce(_ + _)
  }

  /** Exact top-k cosine neighbors for each query vector (brute force —
    * the verification baseline). Queries are broadcast; the corpus is
    * scanned once. Deterministic tie-break on neighbor id.
    */
  def bruteForceKnn(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    // degenerate corpus vectors (null/empty/zero/NaN) normalize to
    // NULL/NaN cosines, and Spark orders NaN ABOVE every real double in a
    // desc sort — one corrupt row would otherwise become the rank-1
    // "neighbor" of every query. Queries stay unfiltered: a degenerate
    // QUERY returns visibly-NaN cosines the caller can see, rather than
    // silently vanishing from the output.
    val c = corpus.select(col(idCol).as("n_id"), normalize(col(vecCol)).as("n_vec"))
      .filter(clusterable(col("n_vec")))
    val q = queries.select(col(idCol).as("q_id"), normalize(col(vecCol)).as("q_vec"))
    val scored = c
      .crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cosine", dot(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "cosine")
  }

  /** Deterministic spread seeding for the coarse quantizer: rank the
    * corpus by a fixed-seed hash of the id (a deterministic pseudo-random
    * sample — adjacent-id runs no longer collapse into one cell), take an
    * oversampled candidate set, then greedy farthest-point selection
    * (k-means++-style, deterministic): each next seed is the candidate
    * with the largest cosine distance to its nearest already-chosen seed,
    * ties broken by id. The candidate pull is one tiny job (4·nCells
    * rows); selection is O(candidates · nCells) on the driver — index
    * build cost, not per-query.
    */
  private def seedCentroids(c: DataFrame, nCells: Int): Array[(Long, Array[Double])] = {
    val spark = c.sparkSession
    import spark.implicits._
    val cands: Array[(Long, Array[Double])] = c
      // degenerate vectors (zero → all-NULL elements under SQL division,
      // NaN input → all-NaN) can never be useful centroids, and a NULL
      // element would even fail the non-nullable Seq[Double] collect —
      // drop them BEFORE sampling
      .filter(clusterable(col("n_vec")))
      .orderBy(xxhash64(col("n_id")), col("n_id"))
      .limit(4 * nCells)
      .select(col("n_id"), col("n_vec"))
      .as[(Long, Seq[Double])].collect().map { case (id, v) => (id, v.toArray) }
      .filter(!_._2.exists(_.isNaN))
    if (cands.isEmpty) // empty/degenerate corpus: queries degrade to empty output
      return Array.empty
    farthestPoint(cands, nCells)
  }

  /** Greedy farthest-point selection (k-means++-style, fully
    * deterministic): starting from the first candidate, each next seed is
    * the candidate with the smallest max-dot to the already-chosen set,
    * ties to the lowest id. Shared by the driver-side [[seedCentroids]]
    * and the per-super local trainer of two-level index builds
    * ([[IvfIndex]]).
    */
  private[llm] def farthestPoint(
      cands: Array[(Long, Array[Double])],
      k: Int
  ): Array[(Long, Array[Double])] = {
    if (cands.isEmpty) return Array.empty
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val chosen = scala.collection.mutable.ArrayBuffer(cands.head)
    val taken = Array.fill(cands.length)(false) // O(1) check, not a chosen-list scan
    taken(0) = true
    // bestSim(i) = max dot(cands(i), chosen) so far; vectors are normalized
    val bestSim = Array.fill(cands.length)(Double.NegativeInfinity)
    var exhausted = false
    while (!exhausted && chosen.size < math.min(k, cands.length)) {
      val last = chosen.last._2
      var argmin = -1; var minSim = Double.PositiveInfinity
      var i = 0
      while (i < cands.length) {
        val s = math.max(bestSim(i), dot(cands(i)._2, last))
        bestSim(i) = s
        if (!taken(i) && (s < minSim || (s == minSim && argmin >= 0 && cands(i)._1 < cands(argmin)._1))) {
          minSim = s; argmin = i
        }
        i += 1
      }
      // argmin stays -1 when every untaken candidate compares as NaN
      // (zero vectors normalize to NaN): stop with the cells selected so
      // far instead of indexing at -1
      if (argmin < 0) exhausted = true
      else {
        chosen += cands(argmin)
        taken(argmin) = true
      }
    }
    chosen.toArray
  }

  /** Per-row nearest centroid over a driver-held (index-build-sized)
    * centroid set as ONE codegen'd expression: `array_max` over
    * `(c_sim, -c_id)` structs = highest similarity, ties to the lowest id.
    * Replaces the crossJoin + per-row window formulation, which shuffled
    * the whole corpus by row id just to rank ≤ nCells candidates — this
    * form is shuffle-free and stays inside whole-stage codegen.
    */
  private[llm] def nearestCentroid(vec: Column, cents: Array[(Long, Array[Double])]): Column = {
    val entries = cents.map { case (id, v) =>
      struct(graft.functions.VectorOps.array_dot(vec, lit(v)).as("c_sim"),
        lit(-id).as("negc"))
    }
    val best = array_max(array(entries.toIndexedSeq: _*))
    struct((-best.getField("negc")).as("c_id"), best.getField("c_sim").as("c_sim"))
  }

  /** IVF (inverted-file) ANN: assign vectors to the nearest of `nCells`
    * centroids, then answer queries by probing the `nProbe` closest cells
    * only. Returns the same shape as [[bruteForceKnn]]; recall depends on
    * nProbe/nCells and centroid quality.
    *
    * The coarse quantizer seeds via [[seedCentroids]] (deterministic
    * hash-sampled candidates + farthest-point selection) and is refined
    * with `kmeansIters` Lloyd iterations — assignment is the shuffle-free
    * [[nearestCentroid]] argmax expression, so each iteration costs ONE
    * shuffle (the partial-aggregated per-cell mean) and nothing else.
    * Refinement happens once per index build; at cluster scale the
    * assignment table would be the persisted IVF index.
    *
    * SCALE BOUNDARY: this in-session form collects the centroid table
    * to the driver and routes through an nCells-branch argmax — right
    * for operation-scoped cell counts (≲ tens of thousands: 10k cells ×
    * 64 dims ≈ 5 MB, and the expression still codegens). Past that —
    * the rebalance arithmetic yields ~1.6 M cells at 10^10 vectors —
    * use the persisted [[IvfIndex]], whose two-level geometry collects
    * only the √nCells super table and routes supercell→cell with
    * bounded joins (measured flat in nCells; SCALE.md "IVF routing
    * shape").
    */
  /** Train the coarse quantizer: [[seedCentroids]] then `kmeansIters`
    * Lloyd refinements — assignment is the shuffle-free
    * [[nearestCentroid]] argmax, so each iteration costs ONE shuffle (the
    * partial-aggregated per-cell mean). `c` must carry (n_id, n_vec) with
    * n_vec normalized, materialized by the caller (it is scanned by
    * seeding plus each iteration).
    *
    * Determinism: seeding is fully deterministic (hash-ordered sample +
    * farthest-point, ties by id). The Lloyd means use floating `avg`,
    * which is exact-deterministic for a FIXED partition layout (what the
    * persisted-vs-in-session equality test pins) but may differ at the
    * ulp level across different partitionings — acceptable for a coarse
    * quantizer, whose cell boundaries are heuristic; the driver-facing
    * knn_ivf correctness exchange is invariant-based for this reason.
    */
  /** One Lloyd step: assign every vector to its nearest centroid
    * (shuffle-free [[nearestCentroid]] argmax), then take the per-cell
    * spherical mean (dim column averages, normalized) — ONE shuffle.
    * `dropNaN` discards degenerate cells whose mean normalizes to NaN (a
    * zero-mean cell): Spark orders NaN as the LARGEST double, so a NaN
    * centroid would win every subsequent argmax.
    */
  private def lloydStep(
      c: DataFrame,
      cents: Array[(Long, Array[Double])],
      dim: Int,
      dropNaN: Boolean
  ): Array[(Long, Array[Double])] = lloydStepSig(c, cents, dim, dropNaN)._1

  /** [[lloydStep]] plus a per-cell MEMBERSHIP signature computed in the
    * same aggregation pass: (c_id, member count, XOR of xxhash64(id)).
    * Two iterations with identical signatures assigned identical member
    * sets to identical cells — the integer-exact convergence witness the
    * distributed loop compares (the float centroid bits are NOT a safe
    * witness: partial-avg merge order varies across shuffles, so a true
    * fixed point can re-derive ulp-different means forever). XOR over
    * the per-cell ids (distinct within a cell) is order-independent and
    * cannot overflow, so the comparison is deterministic.
    */
  private def lloydStepSig(
      c: DataFrame,
      cents: Array[(Long, Array[Double])],
      dim: Int,
      dropNaN: Boolean
  ): (Array[(Long, Array[Double])], Array[(Long, Long, Long)]) = {
    val spark = c.sparkSession
    import spark.implicits._
    val rows = c
      .withColumn("c_id", nearestCentroid(col("n_vec"), cents).getField("c_id"))
      .groupBy("c_id")
      .agg(
        array((0 until dim).map(i => avg(col("n_vec").getItem(i))): _*).as("m"),
        count(lit(1)).as("n_members"),
        bit_xor(xxhash64(col("n_id"))).as("member_sig"))
      .select(col("c_id"), normalize(col("m")).as("c_vec"),
        col("n_members"), col("member_sig"))
      .as[(Long, Seq[Double], Long, Long)].collect()
      .sortBy(_._1)
    val next = rows.map { case (id, v, _, _) => (id, v.toArray) }
    val sig = rows.map { case (id, _, n, s) => (id, n, s) }
    (if (dropNaN) next.filter(!_._2.exists(_.isNaN)) else next, sig)
  }

  private[llm] def trainCentroids(
      c: DataFrame,
      nCells: Int,
      kmeansIters: Int,
      dim: Int
  ): Array[(Long, Array[Double])] = {
    var cents = seedCentroids(c, nCells)
    if (cents.isEmpty) return cents
    // dropNaN: a degenerate cell mean (opposing members cancel to the
    // zero vector, which normalizes to NaN) must NOT survive as a
    // centroid — Spark orders NaN as the largest double, so a NaN
    // centroid wins every later argmax and collapses the quantizer to
    // one cell. Losing the dead cell (fewer centroids) is the benign
    // outcome.
    for (_ <- 0 until kmeansIters) cents = lloydStep(c, cents, dim, dropNaN = true)
    cents
  }

  /** Spherical k-means (cosine Lloyd) run to EXACT convergence: iterate
    * until the ASSIGNMENTS stop changing (the Lloyd fixed point — an
    * integer-exact test on both the driver and the distributed path) or
    * `maxIters`. Returns the per-vector assignments, the final centroids,
    * and whether the fixed point was reached.
    *
    * Determinism & cost: seeding is deterministic ([[seedCentroids]]);
    * each iteration costs one shuffle over the (materialized) normalized
    * corpus. The fixed point makes the result EXACTLY verifiable: with
    * assignments A and centroids C(A) recomputed from them, every
    * vector's assigned cluster is the argmax-cosine cluster under C(A) —
    * a property an independent engine can check from (assignments ∪ base
    * table) alone, no float-sum ordering in the exchange.
    *
    * 100 TB: cap `maxIters` (each pass is a full-corpus job); an
    * unconverged run still returns useful clusters, with
    * `converged = false` so callers relying on the fixed-point invariant
    * can fail loudly.
    */
  def kmeans(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      maxIters: Int = 40,
      /** corpora at or below this many rows run the Lloyd loop on the
        * driver over the collected (normalized) vectors — the iteration
        * is pure arithmetic, so paying one Spark job of scheduling
        * overhead PER ITERATION for index-build-sized data is pure waste
        * (the same size gate [[Dedup.connectedComponents]] applies to
        * union-find). Above the gate the loop runs distributed: one
        * shuffle per iteration, centroids on the driver. 2^17 rows × 64
        * dims ≈ 64 MB of doubles — comfortably driver-sized. */
      driverPointThreshold: Long = 1L << 17
  ): KmeansResult = {
    val spark = corpus.sparkSession
    import spark.implicits._
    IntegralId.require(corpus, idCol, "kmeans")
    val c0 = corpus
      .select(col(idCol).cast("long").as("id"), normalize(col(vecCol)).as("n_vec"))
      // a null/empty/zero vector has no direction: it normalizes to
      // null / empty / all-NULL (SQL x/0 is NULL, not NaN; a NaN INPUT
      // element yields all-NaN) and CANNOT be clustered — left in, it
      // poisons its cluster's mean each iteration (one cluster dies per
      // pass and convergence never fires). Excluded rows are absent from
      // the assignments, by contract.
      .filter(clusterable(col("n_vec")))
    // width-mismatched vectors (mixed embedding versions) are excluded
    // like other unclusterables: their dot against every centroid is
    // NULL (fused-kernel HOF parity), so the argmax would tie-break them
    // into the LOWEST-id cell — silently mis-clustered, and their
    // trailing elements would NULL that cell's Lloyd mean. Absent from
    // the assignments, by the same contract as degenerate vectors.
    val dim = detectDim(c0)
    val c = c0.filter(size(col("n_vec")) === dim)
      .localCheckpoint() // scanned by seeding + every Lloyd pass + final assignment
    var cents = seedCentroids(c.select(col("id").as("n_id"), col("n_vec")), k)
      .filter(!_._2.exists(_.isNaN))
    var converged = cents.isEmpty
    var it = 0
    if (!converged && c.count() <= driverPointThreshold) {
      // driver path: one collect, then in-memory Lloyd to ASSIGNMENT
      // convergence (integer comparison — no float-equality subtleties)
      val pts = c.as[(Long, Seq[Double])].collect().map { case (id, v) => (id, v.toArray) }
        .sortBy(_._1)
      // cents.nonEmpty guard: antipodal degenerate data can kill EVERY
      // cell in one pass (all means zero → NaN → dropped) — iterate on,
      // and the next argmax would index an empty centroid array
      var prev: Array[Long] = null
      while (!converged && it < maxIters && cents.nonEmpty) {
        val assign = pts.map { case (_, v) => nearestCentroidLocal(v, cents) }
        converged = prev != null && java.util.Arrays.equals(assign, prev)
        prev = assign
        if (!converged) {
          cents = localMeans(pts, assign, dim)
          it += 1
        }
      }
    } else {
      // distributed path: converge on ASSIGNMENT equality (the integer
      // comparison the driver path uses), witnessed by per-cell membership
      // signatures computed inside the Lloyd aggregation itself — no extra
      // job. Centroid float bits are deliberately not compared: Spark's
      // partial-avg merge order is not deterministic across iterations, so
      // a bit-equality test can spin at a true fixed point until maxIters
      // and report converged = false.
      var prevSig: Array[(Long, Long, Long)] = null
      while (!converged && it < maxIters && cents.nonEmpty) {
        val (next, sig) =
          lloydStepSig(c.select(col("id").as("n_id"), col("n_vec")), cents, dim, dropNaN = true)
        converged = prevSig != null && sig.sameElements(prevSig)
        prevSig = sig
        if (!converged) {
          // on convergence cents stay as-is: they are the means of exactly
          // these (unchanged) assignments, so the fixed-point invariant
          // argmax(C(A)) = A holds for the final assignment pass below
          cents = next
          it += 1
        }
      }
    }
    val assigned =
      if (cents.isEmpty)
        Seq.empty[(Long, Long)].toDF("id", "cluster")
      else
        c.withColumn("cluster", nearestCentroid(col("n_vec"), cents).getField("c_id"))
          .select(col("id"), col("cluster"))
    KmeansResult(assigned, cents, converged, it)
  }

  /** Driver twin of [[nearestCentroid]]: argmax dot, ties to the LOWEST
    * centroid id (identical semantics to the codegen'd expression, which
    * maxes over (sim, -id) structs).
    */
  private[llm] def nearestCentroidLocal(v: Array[Double], cents: Array[(Long, Array[Double])]): Long = {
    var best = 0
    var bestSim = Double.NegativeInfinity
    var i = 0
    while (i < cents.length) {
      val cv = cents(i)._2
      var s = 0.0; var j = 0
      while (j < v.length) { s += v(j) * cv(j); j += 1 }
      if (s > bestSim || (s == bestSim && cents(i)._1 < cents(best)._1)) { best = i; bestSim = s }
      i += 1
    }
    cents(best)._1
  }

  /** Driver twin of the Lloyd mean step: per-cluster elementwise mean
    * (members in ascending-id order), normalized; NaN cells dropped.
    */
  private[llm] def localMeans(
      pts: Array[(Long, Array[Double])],
      assign: Array[Long],
      dim: Int
  ): Array[(Long, Array[Double])] = {
    val sums = scala.collection.mutable.LinkedHashMap[Long, (Array[Double], Long)]()
    var i = 0
    while (i < pts.length) {
      val (s, n) = sums.getOrElseUpdate(assign(i), (Array.fill(dim)(0.0), 0L))
      val v = pts(i)._2
      var j = 0
      while (j < dim && j < v.length) { s(j) += v(j); j += 1 }
      sums(assign(i)) = (s, n + 1)
      i += 1
    }
    sums.toArray.sortBy(_._1).map { case (cid, (s, n)) =>
      val m = s.map(_ / n)
      val norm = math.sqrt(m.map(x => x * x).sum)
      (cid, m.map(_ / norm))
    }.filter(!_._2.exists(_.isNaN))
  }

  /** One-row invariant summary of a converged [[kmeans]] run, each value
    * computed GENUINELY from the assignments joined back to the corpus
    * (the exchange pattern approximate/float-centroid ops use — see the
    * knn_ivf scaladoc in SparkEntry):
    * (n_assigned, one_cluster_per_vec, clusters_le_k, fixed_point_ok,
    * converged). `fixed_point_ok` RECOMPUTES centroids from the final
    * assignments and re-derives every vector's argmax-cosine cluster —
    * true iff the assignment is the Lloyd fixed point of itself.
    */
  def kmeansReport(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      maxIters: Int = 40,
      driverPointThreshold: Long = 1L << 17
  ): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val res = kmeans(corpus, idCol, vecCol, k, maxIters, driverPointThreshold)
    val c = corpus
      .select(col(idCol).cast("long").as("id"), normalize(col(vecCol)).as("n_vec"))
    // inner join: unclusterable rows (absent from the assignments) drop
    // out here too. No broadcast hint — assignments are corpus-sized, so
    // the join must stay a shuffle join at scale (AQE will still
    // broadcast when the plan proves it small).
    val withVec = c.join(res.assignments, "id").localCheckpoint()
    val dim = detectDim(withVec.select(col("n_vec")))
    // centroids recomputed FROM the emitted assignments (not from the
    // training loop's state) — the quantity the fixed point is defined on
    val cents2 = withVec
      .groupBy(col("cluster").as("c_id"))
      .agg(array((0 until dim).map(i => avg(col("n_vec").getItem(i))): _*).as("m"))
      .select(col("c_id"), normalize(col("m")).as("c_vec"))
      .as[(Long, Seq[Double])].collect().map { case (id, v) => (id, v.toArray) }
      .sortBy(_._1)
      .filter(!_._2.exists(_.isNaN))
    withVec
      .withColumn("c2", nearestCentroid(col("n_vec"), cents2).getField("c_id"))
      .agg(
        count(lit(1)).as("n_assigned"),
        (count(lit(1)) === count_distinct(col("id"))).as("one_cluster_per_vec"),
        (count_distinct(col("cluster")) <= k).as("clusters_le_k"),
        bool_and(col("cluster") === col("c2")).as("fixed_point_ok"))
      .withColumn("converged", lit(res.converged))
  }

  /** Embedding width of (n_id, n_vec)-shaped `c`; 64 on an empty corpus. */
  private[llm] def detectDim(c: DataFrame): Int =
    // first NON-DEGENERATE row, not just the first row: a null/empty
    // leading vector in an unfiltered frame would otherwise collapse the
    // detected width to the 64 fallback and silently truncate every
    // signature/mean computed from it
    c.select(size(col("n_vec")).as("__s")).filter(col("__s") > 0).take(1) match {
      case Array(r) if !r.isNullAt(0) => math.max(1, r.getInt(0))
      case _                          => 64
    }

  /** Route each query to its `nProbe` nearest cells (query side is tiny;
    * centroids broadcast). Returns (q_id, q_vec, c_id).
    */
  private[llm] def probeCells(
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Array[(Long, Array[Double])],
      nProbe: Int
  ): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cb = broadcast(cents.toSeq.map { case (id, v) => (id, v.toSeq) }.toDF("c_id", "c_vec"))
    val q = queries.select(col(idCol).as("q_id"), normalize(col(vecCol)).as("q_vec"))
    val probeW = Window.partitionBy("q_id").orderBy(col("c_sim").desc, col("c_id"))
    q.crossJoin(cb)
      .withColumn("c_sim", dot(col("q_vec"), col("c_vec")))
      .withColumn("c_rank", row_number().over(probeW))
      .filter(col("c_rank") <= nProbe)
      .select("q_id", "q_vec", "c_id")
  }

  /** Top-k scan over the probed cells of an assigned corpus
    * (n_id, n_vec, c_id). Same output shape as [[bruteForceKnn]].
    */
  private[llm] def scanProbed(assigned: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))
    assigned
      .join(broadcast(probes), "c_id")
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cosine", dot(col("q_vec"), col("n_vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "cosine")
  }

  def ivfKnn(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4,
      kmeansIters: Int = 2,
      /** embedding width; 0 (default) = detect from the corpus — a fixed
        * width would silently truncate the Lloyd means for wider vectors */
      dim0: Int = 0
  ): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // unclusterable vectors are excluded up front (same rule as kmeans
    // and the persisted IvfIndex): left in, a NaN vector poisons its
    // cell's Lloyd mean every iteration, and a null/empty FIRST row
    // would mis-detect the embedding width below
    val c0 = corpus.select(col(idCol).as("n_id"), normalize(col(vecCol)).as("n_vec"))
      .filter(clusterable(col("n_vec")))
    val dim = if (dim0 > 0) dim0 else detectDim(c0)
    // width-mismatched corpus vectors are excluded (same rule and
    // rationale as kmeans): NULL dots would tie-break them into the
    // lowest-id cell and skew its Lloyd mean
    val c = c0.filter(size(col("n_vec")) === dim)
      .localCheckpoint() // scanned by seeding, each Lloyd pass, and assignment
    val cents = trainCentroids(c, nCells, kmeansIters, dim)
    if (cents.isEmpty)
      return Seq.empty[(Long, Int, Long, Double)].toDF("q_id", "rank", "n_id", "cosine")

    // final corpus assignment — shuffle-free, whole-stage codegen
    val assigned = c
      .withColumn("c_id", nearestCentroid(col("n_vec"), cents).getField("c_id"))
      .select("n_id", "n_vec", "c_id")

    scanProbed(assigned, probeCells(queries, idCol, vecCol, cents, nProbe), k)
  }
}
