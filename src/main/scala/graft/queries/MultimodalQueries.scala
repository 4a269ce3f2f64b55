package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, batch feature extraction via `mapPartitions` over a typed
  * Dataset — the Spark-side shape a real image/audio pipeline needs
  * (binary column in, per-record features out, executed partition-
  * parallel with no driver collect).
  *
  * STUB: this container has no image/audio codecs, so "decode" is a
  * deterministic fake — the payload is the document text as UTF-8 bytes
  * and the extracted "features" are byte length, codepoint checksum and
  * a fake frame count. The plumbing (binary encoding, partition-batched
  * iteration, typed output schema) is real and is what would carry a
  * JPEG/WAV decode at 100 TB; swap `decodeStub` for the codec call.
  */
object MultimodalQueries extends QueryPack {

  private val P = 1000000007L

  /** The clearly-marked stand-in for a real media decoder. */
  private def decodeStub(bytes: Array[Byte]): (Long, Long) = {
    val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    var sum = 0L
    text.codePoints().toArray.foreach(c => sum = (sum + c) % P)
    (sum, bytes.length.toLong / 1000 + 1) // checksum, fake frame count
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_features" -> ((s, dir) => {
      import s.implicits._
      val payloads = Tables.load(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      payloads.select(col("doc_id").as[Long], col("payload").as[Array[Byte]])
        .mapPartitions { it =>
          it.map { case (id, bytes) =>
            val (cpSum, frames) = decodeStub(bytes)
            (id, bytes.length.toLong, cpSum, frames)
          }
        }
        .toDF("doc_id", "n_bytes", "cp_sum", "n_frames")
    }),

    // "Resize" stub: stride-4 downsample of the payload (what a real
    // pipeline does to image dimensions), emitting the resized length
    // and checksum — shape-preserving binary→binary transform.
    "mm_resize" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .select(col("doc_id").as[Long], col("payload").as[Array[Byte]])
        .mapPartitions { it =>
          it.map { case (id, bytes) =>
            val resized = bytes.indices.collect {
              case i if i % 4 == 0 => bytes(i)
            }
            var sum = 0L
            resized.foreach(b => sum = (sum + (b & 0xff)) % P)
            (id, resized.length.toLong, sum)
          }
        }
        .toDF("doc_id", "resized_bytes", "resized_sum")
    }),

    // One payload → many sampled "frames": mapPartitions emits a row per
    // fixed-size window with a per-frame checksum (what a real pipeline
    // does with decoded video frames; decode itself is the stub).
    "mm_frames" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .select(col("doc_id").as[Long], col("payload").as[Array[Byte]])
        .mapPartitions { it =>
          it.flatMap { case (id, bytes) =>
            bytes.grouped(frameBytes).zipWithIndex.map { case (frame, i) =>
              var sum = 0L
              frame.foreach(b => sum = (sum + (b & 0xff)) % P)
              (id, i.toLong, frame.length.toLong, sum)
            }
          }
        }
        .toDF("doc_id", "frame_idx", "frame_bytes", "frame_sum")
    })
  )

  /** "Frame" sampling stub: fixed-size byte windows standing in for
    * decoded video frames — the one-payload→many-frames batch shape. */
  private val frameBytes = 500

  val oracles: Map[String, String] = Map(
    // text is ASCII, so UTF-8 byte length == char length and the
    // codepoint checksum is the unicode() sum
    "mm_features" ->
      s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(range(length(text)), i -> CAST(unicode(substr(text, i+1, 1)) AS BIGINT))),
            (h, x) -> (h + x) % $P) AS cp_sum,
          CAST(length(text) // 1000 + 1 AS BIGINT) AS n_frames
          FROM documents""",
    "mm_resize" ->
      s"""SELECT doc_id,
          CAST((length(text) + 3) // 4 AS BIGINT) AS resized_bytes,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(range((length(text) + 3) // 4),
              i -> CAST(unicode(substr(text, CAST(4*i + 1 AS INTEGER), 1)) AS BIGINT))),
            (h, x) -> (h + x) % $P) AS resized_sum
          FROM documents""",
    // ASCII text: frame windows are substrings; byte values = unicode()
    "mm_frames" ->
      s"""WITH idx AS (
            SELECT doc_id, text,
              unnest(range((length(text) + ${frameBytes - 1}) // $frameBytes)) AS i
            FROM documents),
          f AS (
            SELECT doc_id, i AS frame_idx,
              substr(text, CAST(i*$frameBytes + 1 AS INTEGER), $frameBytes) AS frame
            FROM idx)
          SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
            CAST(length(frame) AS BIGINT) AS frame_bytes,
            list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(range(length(frame)),
                i -> CAST(unicode(substr(frame, i+1, 1)) AS BIGINT))),
              (h, x) -> (h + x) % $P) AS frame_sum
          FROM f"""
  )
}
