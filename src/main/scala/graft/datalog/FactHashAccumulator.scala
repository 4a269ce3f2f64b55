package graft.datalog

import java.io.{ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import org.apache.spark.util.AccumulatorV2
import org.apache.spark.util.sketch.BloomFilter

/** Driver-merged set of `xxhash64(full row)` values over a predicate's
  * accumulated fact set, populated DURING the per-iteration checkpoint
  * materialization jobs (see
  * `GraftColumnBridge.checkpointWithPartitioningHashed`) — tracking the
  * fact set costs zero extra jobs. The membership half of the
  * reference's executor-resident hash sets (SetRDD.scala:29-167),
  * re-expressed driver-side: a hash-NEGATIVE candidate row is
  * *certainly* not in the fact set and can skip the set-difference
  * hash build entirely; false positives merely route a row through the
  * join it would have taken anyway.
  *
  * Wire economics (why exact hashes, not per-task bloom bitmaps): each
  * task update carries ONLY the 8-byte hashes of the rows that task
  * materialized — per-iteration driver ingest is O(delta rows × 8 B),
  * and the whole fixpoint ships each fact's hash exactly once. The
  * previous design accumulated per-task `BloomFilter` partials, whose
  * serialized form is the FULL conf-sized bitmap regardless of content
  * — O(partitions × bitmapBytes) per iteration (≈0.5 GB driver ingest
  * over a 20-iteration × 32-partition TC at the old 1<<20 default),
  * which is exactly what made the forced-on bench gate 3.6× slower
  * than its bloom-off twin.
  *
  * The probe-side sketch is built lazily on the DRIVER from the exact
  * hashes, sized to the OBSERVED fact count (`serializedBloom`): the
  * plan literal is ~9.6 bits/fact at fpp 0.03 instead of a fixed
  * ~0.9 MB. Capacity doubles geometrically up to `maxItems`; once the
  * cap is reached the raw buffer is dropped and further hashes fold
  * straight into the capped sketch (bounded driver memory — 8 B/fact
  * until the cap, bitmap-only after), degrading gracefully toward a
  * no-op filter as fpp climbs, never toward a wrong answer.
  *
  * Serialization: an empty accumulator (what executors receive after
  * `copyAndReset`) ships nothing but the sizing params; task→driver
  * updates carry the trimmed hash buffer. */
class FactHashAccumulator(val maxItems: Long, val fpp: Double)
    extends AccumulatorV2[java.lang.Long, java.lang.Long] {

  /** Raw hashes not yet frozen into a capped sketch. Trimmed on the
    * wire via writeObject. */
  @transient private var buf: Array[Long] = _
  private var n: Int = 0
  private var total: Long = 0L

  // ---- driver-only sketch state (never shipped to executors) ----
  @transient private var bloom: BloomFilter = _
  @transient private var bloomCapacity: Long = 0L
  @transient private var builtUpTo: Int = 0
  @transient private var bloomBytes: Array[Byte] = _
  @transient private var frozen = false

  private def grow(need: Int): Unit = {
    if (buf == null) buf = new Array[Long](math.max(64, need))
    else if (n + need > buf.length) {
      val cap = math.max(buf.length * 2L, n.toLong + need)
      buf = java.util.Arrays.copyOf(buf, math.min(cap, Int.MaxValue - 8).toInt)
    }
  }

  override def isZero: Boolean = total == 0L

  override def copy(): FactHashAccumulator = {
    val c = new FactHashAccumulator(maxItems, fpp)
    if (n > 0) { c.buf = java.util.Arrays.copyOf(buf, n); c.n = n }
    c.total = total
    c
  }

  override def reset(): Unit = {
    buf = null; n = 0; total = 0L
    bloom = null; bloomCapacity = 0L; builtUpTo = 0; bloomBytes = null
    frozen = false
  }

  override def add(v: java.lang.Long): Unit = {
    total += 1L
    if (frozen) { bloom.putLong(v.longValue); bloomBytes = null }
    else { grow(1); buf(n) = v.longValue; n += 1 }
  }

  override def merge(other: AccumulatorV2[java.lang.Long, java.lang.Long]): Unit = {
    other match {
      case o: FactHashAccumulator =>
        total += o.total
        if (o.n > 0) {
          if (frozen) {
            var i = 0
            while (i < o.n) { bloom.putLong(o.buf(i)); i += 1 }
            bloomBytes = null
          } else {
            grow(o.n)
            System.arraycopy(o.buf, 0, buf, n, o.n)
            n += o.n
          }
        }
      case _ => throw new UnsupportedOperationException(
        s"cannot merge ${other.getClass.getName} into FactHashAccumulator")
    }
    // merge runs driver-side only: past the sketch cap, freeze eagerly
    // so the raw buffer never outgrows 8 B × maxItems even when the
    // auto gate has not yet consulted the sketch
    if (!frozen && total >= maxItems) serializedBloom(1L)
  }

  /** Hashes observed so far (insertions, not distinct values). */
  override def value: java.lang.Long = Long.box(total)

  /** Driver-only: the serialized probe sketch, or None while the
    * accumulated count is below `minRows` (the `auto`-mode gate — a
    * tiny fixpoint's semi build is already cheap; skip the probe's
    * per-row hash and the plan literal until the build it narrows is
    * the dominant term). Sized to the observed count (2× headroom,
    * capped at `maxItems`); rebuilt geometrically, so amortized O(1)
    * inserts; the serialized form is memoized until new hashes arrive. */
  def serializedBloom(minRows: Long): Option[Array[Byte]] = {
    if (total == 0L || total < minRows) return None
    if (!frozen) {
      if (bloom == null || total > bloomCapacity) {
        bloomCapacity = math.min(math.max(64L, 2L * total), math.max(64L, maxItems))
        bloom = BloomFilter.create(bloomCapacity, fpp)
        var i = 0
        while (i < n) { bloom.putLong(buf(i)); i += 1 }
        builtUpTo = n
        bloomBytes = null
      } else if (builtUpTo < n) {
        var i = builtUpTo
        while (i < n) { bloom.putLong(buf(i)); i += 1 }
        builtUpTo = n
        bloomBytes = null
      }
      // at the cap no future rebuild can need the raw hashes — drop
      // them and fold subsequent updates straight into the sketch
      if (bloomCapacity >= maxItems && total >= maxItems) {
        frozen = true; buf = null; n = 0; builtUpTo = 0
      }
    }
    if (bloomBytes == null) {
      val bos = new ByteArrayOutputStream()
      bloom.writeTo(bos)
      bloomBytes = bos.toByteArray
    }
    Some(bloomBytes)
  }

  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    var i = 0
    while (i < n) { out.writeLong(buf(i)); i += 1 }
  }

  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    if (n > 0) {
      buf = new Array[Long](n)
      var i = 0
      while (i < n) { buf(i) = in.readLong(); i += 1 }
    }
  }
}
