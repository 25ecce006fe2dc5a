package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** Murmur3 x86 32-bit (seed 0) over Iceberg's specified byte layouts, per
  * the published Iceberg table spec ("Appendix B: 32-bit Hash
  * Requirements", iceberg.apache.org/spec). This gives exact partition
  * parity with the reference's `bucket(n, col)` partition transform
  * (`data/SchemaUtils.createPartitionSpec:150-199` builds specs whose
  * bucket values Iceberg computes with this hash).
  *
  * Static-forwarder friendly: methods here are called directly from
  * generated code in [[IcebergBucket]].
  */
object IcebergHashing {

  /** murmur3_x86_32(bytes, seed=0) — public domain algorithm (Appleby). */
  def murmur3(data: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    val len = data.length
    var h1 = 0 // seed
    val nblocks = len / 4
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < nblocks) {
      var k1 = buf.getInt(i * 4)
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    // tail
    var k1 = 0
    val tail = nblocks * 4
    (len & 3) match {
      case 3 =>
        k1 ^= (data(tail + 2) & 0xff) << 16
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= (data(tail) & 0xff)
      case 2 =>
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= (data(tail) & 0xff)
      case 1 =>
        k1 ^= (data(tail) & 0xff)
      case _ =>
    }
    if ((len & 3) != 0) {
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
    }
    // finalization
    h1 ^= len
    h1 ^= (h1 >>> 16)
    h1 *= 0x85ebca6b
    h1 ^= (h1 >>> 13)
    h1 *= 0xc2b2ae35
    h1 ^= (h1 >>> 16)
    h1
  }

  /** ints and longs hash identically: 8-byte little-endian (spec). */
  def hashLong(v: Long): Int = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    b.putLong(v)
    murmur3(b.array())
  }

  def hashBytes(v: Array[Byte]): Int = murmur3(v)

  /** decimal: minimal two's-complement big-endian of the unscaled value. */
  def hashDecimal(v: java.math.BigDecimal): Int = murmur3(v.unscaledValue().toByteArray)

  def bucketOf(hash: Int, n: Int): Int = (hash & Integer.MAX_VALUE) % n

  // entry points used by codegen / eval -------------------------------

  def bucketLong(v: Long, n: Int): Int = bucketOf(hashLong(v), n)

  def bucketUTF8(v: org.apache.spark.unsafe.types.UTF8String, n: Int): Int =
    bucketOf(hashBytes(v.getBytes), n)

  def bucketBytes(v: Array[Byte], n: Int): Int = bucketOf(hashBytes(v), n)

  def bucketDecimal(v: org.apache.spark.sql.types.Decimal, n: Int): Int =
    bucketOf(hashDecimal(v.toJavaBigDecimal), n)
}
