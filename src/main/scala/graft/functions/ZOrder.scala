package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order (Morton) curve values for multi-dimensional file clustering.
  *
  * Rows sorted by z-value land in files whose per-column min/max bounds
  * are tight in EVERY participating dimension, so a 2-D/3-D box predicate
  * prunes files on all dimensions at once — the locality property behind
  * Iceberg/Delta's `rewrite ... zorder by` maintenance action. A plain
  * 1-D sort gives perfect bounds on the sort column and useless bounds on
  * every other.
  *
  * Built entirely from codegen'd built-ins (`shiftleft`/`bitwiseAND`/
  * `bitwiseOR` folds of the classic bit-spreading magic constants) — no
  * UDF, no custom expression, whole-stage codegen spans stay intact.
  * Values must be normalized to non-negative ints first ([[normalize]]):
  * ≤31 bits/dim for 2 dims, ≤21 bits/dim for 3.
  */
object ZOrder {

  /** Spread the low 32 bits of `c` so consecutive input bits occupy
    * every SECOND output bit (Morton-2 spreading).
    */
  private def spread2(c: Column): Column = {
    var x = c.cast(LongType).bitwiseAND(lit(0xffffffffL))
    x = (x.bitwiseOR(shiftleft(x, 16))).bitwiseAND(lit(0x0000ffff0000ffffL))
    x = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00ff00ff00ff00ffL))
    x = (x.bitwiseOR(shiftleft(x, 4))).bitwiseAND(lit(0x0f0f0f0f0f0f0f0fL))
    x = (x.bitwiseOR(shiftleft(x, 2))).bitwiseAND(lit(0x3333333333333333L))
    x = (x.bitwiseOR(shiftleft(x, 1))).bitwiseAND(lit(0x5555555555555555L))
    x
  }

  /** Spread the low 21 bits of `c` to every THIRD output bit (Morton-3). */
  private def spread3(c: Column): Column = {
    var x = c.cast(LongType).bitwiseAND(lit(0x1fffffL))
    x = (x.bitwiseOR(shiftleft(x, 32))).bitwiseAND(lit(0x001f00000000ffffL))
    x = (x.bitwiseOR(shiftleft(x, 16))).bitwiseAND(lit(0x001f0000ff0000ffL))
    x = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x100f00f00f00f00fL))
    x = (x.bitwiseOR(shiftleft(x, 4))).bitwiseAND(lit(0x10c30c30c30c30c3L))
    x = (x.bitwiseOR(shiftleft(x, 2))).bitwiseAND(lit(0x1249249249249249L))
    x
  }

  /** Interleave 2 or 3 normalized non-negative int columns into one
    * z-value long (dimension 0 owns the least-significant bit).
    */
  def interleave(cols: Seq[Column]): Column = cols match {
    case Seq(a, b)    => spread2(a).bitwiseOR(shiftleft(spread2(b), 1))
    case Seq(a, b, c) =>
      spread3(a).bitwiseOR(shiftleft(spread3(b), 1)).bitwiseOR(shiftleft(spread3(c), 2))
    case _ => throw new IllegalArgumentException(
      s"z-order interleave supports 2 or 3 dimensions, got ${cols.size}")
  }

  /** Min-max scale a numeric column to [0, 2^bits): the rank-free
    * normalization a rewrite job can compute with one tiny agg. Constant
    * columns (min == max) map to 0. Values OUTSIDE [min, max] (stale
    * bounds, rows arriving after the agg) CLAMP to the edge buckets —
    * unclamped they would go negative / overflow the bit budget, and the
    * interleave of a negative long scrambles the curve (bit 31 of a
    * 2-dim spread lands on the sign bit, sorting those rows before
    * everything); clamped rows merely cluster at the boundary.
    */
  def normalize(c: Column, min: Double, max: Double, bits: Int): Column = {
    // the interleave budget is HARD: bits=32 in 2-D puts bit 31 at
    // output bit 62 and the dimension shifted by 1 lands it on the SIGN
    // bit — negative z-values sorting the top bucket first, silently
    // destroying the clustering the rewrite ran for. 21 is the 3-D bound
    // (3·21 = 63); per-call-site requires (compactZOrder) cannot protect
    // direct users of this function.
    require(bits >= 1 && bits <= 31,
      s"z-order normalize bits must be in [1, 31] (and <= 21 for 3-D), got $bits")
    // NaN BOUNDS (a max() computed over a column containing NaN, which
    // Spark orders above every double) would make span/scale NaN and
    // floor(NaN).cast(long) silently bucket EVERY row to 0 — destroying
    // the clustering the rewrite ran for with no error anywhere. Loud
    // here; compactZOrder computes its bounds NaN-exclusively.
    require(!min.isNaN && !max.isNaN,
      s"z-order normalize bounds must not be NaN (min=$min, max=$max) — " +
        "compute bounds over nanvl(col, null) to exclude NaN values")
    val span = max - min
    if (span <= 0) lit(0L)
    else {
      val hi = (1L << bits) - 1
      val scale = hi.toDouble / span
      // NaN VALUES clamp to the TOP bucket (Spark sorts NaN above all
      // doubles, so this matches where a sort would put the row);
      // unhandled, floor(NaN) casts to 0 silently
      val cd = nanvl(c.cast("double"), lit(max))
      least(greatest(floor((cd - lit(min)) * lit(scale)).cast(LongType),
        lit(0L)), lit(hi))
    }
  }

  /** Reference JVM implementation of 2-way interleave, for tests. */
  private[graft] def interleaveRef2(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 31) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Reference JVM implementation of 3-way interleave, for tests. */
  private[graft] def interleaveRef3(a: Long, b: Long, c: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 21) {
      z |= ((a >> i) & 1L) << (3 * i)
      z |= ((b >> i) & 1L) << (3 * i + 1)
      z |= ((c >> i) & 1L) << (3 * i + 2)
      i += 1
    }
    z
  }
}
