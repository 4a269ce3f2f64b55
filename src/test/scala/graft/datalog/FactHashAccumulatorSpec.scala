package graft.datalog

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import org.apache.spark.util.sketch.BloomFilter
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the bloom pre-filter's accumulator economics (the r10
  * rework of the r9 per-task-bitmap design): task→driver updates are
  * DELTA-sized, the driver sketch is sized from the observed count and
  * never false-negative, the capacity cap freezes the raw buffer
  * (bounded driver memory), and the auto `minrows` gate holds. */
class FactHashAccumulatorSpec extends AnyFunSuite {

  private def roundTripBytes(a: FactHashAccumulator): (Int, FactHashAccumulator) = {
    val bos = new ByteArrayOutputStream()
    val out = new ObjectOutputStream(bos)
    out.writeObject(a)
    out.close()
    val bytes = bos.toByteArray
    val in = new ObjectInputStream(new ByteArrayInputStream(bytes))
    (bytes.length, in.readObject().asInstanceOf[FactHashAccumulator])
  }

  test("task update serialization is delta-sized, not sketch-sized") {
    // driver-side AccumulatorV2 serialization requires registration
    val sc = TestSpark.spark.sparkContext
    val acc = new FactHashAccumulator(1L << 20, 0.03)
    sc.register(acc, "factHashSpec")
    // driver→executor wire: writeReplace ships a zeroed copy — params
    // only; the deserialized instance is the executor-side accumulator
    val (toExecBytes, execSide) = roundTripBytes(acc)
    assert(toExecBytes < 2048,
      s"executor-bound accumulator shipped $toExecBytes bytes")
    assert(execSide.isZero)
    // a task partial carrying 10 hashes must ship ~80 bytes of payload
    // back, not the ~0.9 MB a conf-sized bitmap would (the r9 failure
    // mode: per-task BloomFilter partials serialize the full bitmap)
    (1 to 10).foreach(i => execSide.add(Long.box(i.toLong * 7919)))
    val (nBytes, back) = roundTripBytes(execSide)
    assert(nBytes < 4096, s"task partial serialized to $nBytes bytes")
    assert(back.value.longValue == 10L)
    // and the driver merge absorbs it
    acc.merge(back)
    assert(acc.value.longValue == 10L)
  }

  test("sketch has no false negatives and is sized from the observed count") {
    val acc = new FactHashAccumulator(1L << 20, 0.03)
    val hashes = (1 to 5000).map(i => i.toLong * 1315423911L)
    hashes.foreach(h => acc.add(Long.box(h)))
    val bytes = acc.serializedBloom(1L).get
    // right-sized: ~2n items at fpp 0.03 is ~9.6 bits/item -> ~12 KB,
    // nowhere near the 0.9 MB a fixed 1<<20 sizing produced
    assert(bytes.length < 64 * 1024, s"sketch is ${bytes.length} bytes")
    val bf = BloomFilter.readFrom(new ByteArrayInputStream(bytes))
    assert(hashes.forall(bf.mightContainLong), "false negative in sketch")
  }

  test("auto minrows gate: no sketch below the threshold") {
    val acc = new FactHashAccumulator(1L << 20, 0.03)
    (1 to 100).foreach(i => acc.add(Long.box(i.toLong)))
    assert(acc.serializedBloom(1000L).isEmpty)
    assert(acc.serializedBloom(100L).nonEmpty)
  }

  test("capacity cap freezes the buffer; later merges fold into the sketch") {
    val cap = 1024L
    val acc = new FactHashAccumulator(cap, 0.03)
    (1 to 2048).foreach(i => acc.add(Long.box(i.toLong * 31)))
    val first = acc.serializedBloom(1L).get
    // past the cap the bitmap stops growing (bounded driver memory)...
    val partial = acc.copyAndReset().asInstanceOf[FactHashAccumulator]
    val late = (1 to 512).map(i => (100000 + i).toLong * 31)
    late.foreach(h => partial.add(Long.box(h)))
    acc.merge(partial)
    val second = acc.serializedBloom(1L).get
    assert(second.length == first.length,
      s"capped sketch grew: ${first.length} -> ${second.length}")
    // ...but still absorbs the late hashes (no false negatives)
    val bf = BloomFilter.readFrom(new ByteArrayInputStream(second))
    assert(late.forall(bf.mightContainLong),
      "late hash lost after the freeze")
    assert(acc.value.longValue == 2048L + 512L)
  }
}
