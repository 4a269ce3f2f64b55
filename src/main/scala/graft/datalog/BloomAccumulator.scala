package graft.datalog

import java.io.{ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import org.apache.spark.util.AccumulatorV2
import org.apache.spark.util.sketch.BloomFilter

/** Driver-merged bloom filter over a predicate's accumulated fact set,
  * populated from `xxhash64(full row)` values folded in DURING the
  * per-iteration checkpoint materialization job (see
  * `GraftColumnBridge.checkpointWithPartitioningHashed`) — tracking the
  * fact set costs zero extra jobs. This is the membership half of the
  * reference's executor-resident hash sets (SetRDD.scala:29-167)
  * re-expressed as a sketch: no false negatives, so a bloom-NEGATIVE
  * candidate row is *certainly* not in the fact set and can skip the
  * set-difference hash build entirely; false positives merely route a
  * row through the join it would have taken anyway.
  *
  * Cost model (why an accumulator and not a per-slice job): each task
  * returns its partial bloom (≈ bitSize/8 bytes) to the driver once per
  * checkpoint job — O(partitions × bloomBytes) driver ingest per
  * iteration, zero extra job latency. Saturation degrades gracefully:
  * past `expectedItems` the fpp climbs toward 1 and the pre-filter
  * converges on a no-op (every row routed through the join), never on
  * a wrong answer. Size `expecteditems` to the expected FACT count at
  * the target scale; the bits are O(n) while the per-iteration re-hash
  * it avoids is O(n × iterations) rows.
  *
  * Serialization: an empty accumulator (what executors receive after
  * `copyAndReset`) ships only the sizing params, not the bitmap — the
  * task binary stays small; only task→driver updates carry bits. */
class BloomAccumulator(val expectedItems: Long, val fpp: Double)
    extends AccumulatorV2[java.lang.Long, BloomFilter] {

  @transient private var bloom: BloomFilter = _
  private var nonEmpty = false

  private def filter: BloomFilter = {
    if (bloom == null) bloom = BloomFilter.create(expectedItems, fpp)
    bloom
  }

  override def isZero: Boolean = !nonEmpty

  override def copy(): BloomAccumulator = {
    val c = new BloomAccumulator(expectedItems, fpp)
    if (nonEmpty) { c.filter.mergeInPlace(filter); c.nonEmpty = true }
    c
  }

  override def reset(): Unit = { bloom = null; nonEmpty = false }

  override def add(v: java.lang.Long): Unit = {
    filter.putLong(v.longValue)
    nonEmpty = true
  }

  override def merge(other: AccumulatorV2[java.lang.Long, BloomFilter]): Unit =
    other match {
      case b: BloomAccumulator =>
        if (b.nonEmpty) { filter.mergeInPlace(b.filter); nonEmpty = true }
      case _ => throw new UnsupportedOperationException(
        s"cannot merge ${other.getClass.getName} into BloomAccumulator")
    }

  override def value: BloomFilter = filter

  /** The sketch's wire format — feeds `might_contain`'s binary input. */
  def serialized: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    filter.writeTo(bos)
    bos.toByteArray
  }

  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    if (nonEmpty) filter.writeTo(out)
  }

  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    bloom = if (nonEmpty) BloomFilter.readFrom(in) else null
  }
}
