package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata (SURVEY.md north star; builder
  * brief "multimodal columns").
  *
  * The Spark-side contract is real and tested — schema, partition-local
  * batched processing via `mapPartitions` (the Scala analogue of
  * `mapInPandas`: one iterator per partition, amortised per-batch setup),
  * deterministic repartitioning by media id. The actual codec work sits
  * behind the [[MediaCodec]] trait; this container has no image/audio
  * libs, so the shipped impl is the deterministic [[FakeCodec]] STUB.
  * Dropping in a real decoder (JavaCV, TwelveMonkeys, ffmpeg-cli…) means
  * implementing MediaCodec ONLY — every operator below takes the codec
  * as a parameter and none of their call sites change.
  */
object Multimodal {
  /** A media row: payload plus envelope metadata. */
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])

  /** Decoded metadata (what a real decoder would surface). */
  case class MediaMeta(media_id: Long, kind: String, width: Int, height: Int,
                       format: String, durationMs: Long, sizeBytes: Int)

  /** One sampled frame (video) / window (audio): id, index, feature. */
  case class Frame(media_id: Long, frame_idx: Int, feature: Array[Float])

  /** The codec seam: everything that touches payload BYTES. Implementors
    * must be Serializable (instances ship inside mapPartitions closures)
    * and deterministic (task retries and speculative execution re-decode
    * rows; a nondeterministic codec breaks exactly-once outputs).
    * Heavyweight state (decoder contexts, models) must be lazy/transient
    * so per-partition setup happens executor-side, once per partition —
    * not serialized from the driver.
    */
  trait MediaCodec extends Serializable {
    /** Surface envelope metadata from the encoded bytes. */
    def decode(row: MediaRow): MediaMeta
    /** Re-encode to the given dimensions (content otherwise preserved). */
    def resize(row: MediaRow, width: Int, height: Int): MediaRow
    /** The decoded content bytes — the payload's identity for dedup:
      * byte-identical content must return byte-identical payloads even
      * when envelopes (headers, containers) differ.
      */
    def payload(row: MediaRow): Array[Byte]
    /** Per-frame (video) / per-window (audio) feature vector. */
    def frameFeature(row: MediaRow, frameIdx: Int, dim: Int): Array[Float]
    /** Whole-media embedding from decoded content bytes. */
    def mediaFeature(payload: Array[Byte], dim: Int): Array[Float]
  }

  /** STUB codec. "Header": bytes 0-3 width, 4-7 height, 8-15 duration
    * (big-endian); the rest is payload. Deterministic by construction.
    */
  object FakeCodec extends MediaCodec {
    def encodeHeader(width: Int, height: Int, durationMs: Long, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(16 + payload.length)
      bb.putInt(width).putInt(height).putLong(durationMs).put(payload)
      bb.array()
    }

    override def decode(row: MediaRow): MediaMeta = {
      val bb = java.nio.ByteBuffer.wrap(row.bytes)
      val (w, h, d) = (bb.getInt, bb.getInt, bb.getLong)
      val fmt = row.kind match {
        case "image" => "png-stub"
        case "audio" => "wav-stub"
        case _       => "mp4-stub"
      }
      MediaMeta(row.media_id, row.kind, w, h, fmt, d, row.bytes.length)
    }

    override def resize(row: MediaRow, width: Int, height: Int): MediaRow = {
      val bb = java.nio.ByteBuffer.wrap(row.bytes)
      bb.getInt; bb.getInt
      val dur = bb.getLong
      val p = new Array[Byte](row.bytes.length - 16)
      bb.get(p)
      row.copy(bytes = encodeHeader(width, height, dur, p))
    }

    override def payload(row: MediaRow): Array[Byte] =
      java.util.Arrays.copyOfRange(row.bytes, 16, row.bytes.length)

    /** Deterministic fake per-frame feature: seeded by (id, frame). */
    override def frameFeature(row: MediaRow, frameIdx: Int, dim: Int): Array[Float] = {
      val rnd = new scala.util.Random(row.media_id * 31 + frameIdx)
      Array.fill(dim)(rnd.nextFloat())
    }

    /** Deterministic fake whole-media embedding: seeded by the PAYLOAD
      * content (not the id), so byte-identical media embed identically —
      * the property content-dedup via ANN relies on.
      */
    override def mediaFeature(bytes: Array[Byte], dim: Int): Array[Float] = {
      val rnd = new scala.util.Random(java.util.Arrays.hashCode(bytes).toLong)
      Array.fill(dim)(rnd.nextFloat() * 2 - 1)
    }
  }

  /** Decode metadata for every media row — partition-local, batched. */
  def decodeMeta(media: Dataset[MediaRow],
                 codec: MediaCodec = FakeCodec): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // Per-partition setup would go here (codec contexts are expensive;
      // amortise them across the whole partition, never per row).
      rows.map(codec.decode)
    }
  }

  /** Sample ~1 frame per second of duration (capped), emitting a feature
    * vector per frame — the explode-shaped op (one row in, many out).
    */
  def sampleFrames(media: Dataset[MediaRow], maxFrames: Int = 8,
                   dim: Int = 8, codec: MediaCodec = FakeCodec): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val meta = codec.decode(r)
        val n = math.min(maxFrames, math.max(1, (meta.durationMs / 1000).toInt))
        (0 until n).iterator.map(i => Frame(r.media_id, i, codec.frameFeature(r, i, dim)))
      }
    }
  }

  /** Resize every payload — schema in/out identical, no shuffle. */
  def resize(media: Dataset[MediaRow], width: Int, height: Int,
             codec: MediaCodec = FakeCodec): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(rows => rows.map(codec.resize(_, width, height)))
  }

  /** Whole-media feature extraction: payload → embedding column (a real
    * codec runs a vision/audio encoder with per-partition model loading —
    * the setup comment in [[decodeMeta]] applies doubly here). The
    * output's (id, Array[Float]) shape composes directly with
    * [[Ann]]/[[Ivf]]: media → embedding → LSH buckets is the content
    * dedup / retrieval path for image/audio corpora at 100 TB.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 8,
                      codec: MediaCodec = FakeCodec): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition encoder/model setup would go here
      rows.map { r =>
        // feature from the DECODED payload (header stripped): resized or
        // re-encoded envelopes must not change content identity
        (r.media_id, codec.mediaFeature(codec.payload(r), dim))
      }
    }.toDF("media_id", "embedding")
  }

  /** Deterministic synthetic media table for tests/demos. */
  def synthetic(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val kind = Seq("image", "audio", "video")(i.toInt % 3)
      val payload = Array.tabulate[Byte](32)(j => ((i * 7 + j) % 127).toByte)
      MediaRow(i, kind,
        FakeCodec.encodeHeader(64 + i.toInt % 1920, 48 + i.toInt % 1080,
          1000L * (1 + i % 10), payload))
    }.repartition(col("media_id"))
  }
}
