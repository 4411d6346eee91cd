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
  * deterministic repartitioning by media id. The actual codec work is
  * STUBBED deterministically (this container has no image/audio libs):
  * [[FakeCodec]] "decodes" a 16-byte header we also use to synthesise
  * test data. Swapping in a real decoder touches ONLY FakeCodec.
  */
object Multimodal {
  /** A media row: payload plus envelope metadata. */
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])

  /** Decoded metadata (what a real decoder would surface). */
  case class MediaMeta(media_id: Long, kind: String, width: Int, height: Int,
                       format: String, durationMs: Long, sizeBytes: Int)

  /** One sampled frame (video) / window (audio): id, index, feature. */
  case class Frame(media_id: Long, frame_idx: Int, feature: Array[Float])

  /** STUB codec. "Header": bytes 0-3 width, 4-7 height, 8-15 duration
    * (big-endian); the rest is payload. Deterministic by construction.
    */
  object FakeCodec {
    def encodeHeader(width: Int, height: Int, durationMs: Long, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(16 + payload.length)
      bb.putInt(width).putInt(height).putLong(durationMs).put(payload)
      bb.array()
    }

    def decode(row: MediaRow): MediaMeta = {
      val bb = java.nio.ByteBuffer.wrap(row.bytes)
      val (w, h, d) = (bb.getInt, bb.getInt, bb.getLong)
      val fmt = row.kind match {
        case "image" => "png-stub"
        case "audio" => "wav-stub"
        case _       => "mp4-stub"
      }
      MediaMeta(row.media_id, row.kind, w, h, fmt, d, row.bytes.length)
    }

    /** Deterministic fake per-frame feature: seeded by (id, frame). */
    def frameFeature(mediaId: Long, frameIdx: Int, dim: Int = 8): Array[Float] = {
      val rnd = new scala.util.Random(mediaId * 31 + frameIdx)
      Array.fill(dim)(rnd.nextFloat())
    }

    /** Deterministic fake whole-media embedding: seeded by the PAYLOAD
      * content (not the id), so byte-identical media embed identically —
      * the property content-dedup via ANN relies on.
      */
    def mediaFeature(bytes: Array[Byte], dim: Int): Array[Float] = {
      val rnd = new scala.util.Random(java.util.Arrays.hashCode(bytes).toLong)
      Array.fill(dim)(rnd.nextFloat() * 2 - 1)
    }
  }

  /** Decode metadata for every media row — partition-local, batched. */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // Per-partition setup would go here (codec contexts are expensive;
      // amortise them across the whole partition, never per row).
      rows.map(FakeCodec.decode)
    }
  }

  /** Sample ~1 frame per second of duration (capped), emitting a feature
    * vector per frame — the explode-shaped op (one row in, many out).
    */
  def sampleFrames(media: Dataset[MediaRow], maxFrames: Int = 8): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val meta = FakeCodec.decode(r)
        val n = math.min(maxFrames, math.max(1, (meta.durationMs / 1000).toInt))
        (0 until n).iterator.map(i => Frame(r.media_id, i, FakeCodec.frameFeature(r.media_id, i)))
      }
    }
  }

  /** "Resize": metadata-only transform of the stub header (a real impl
    * re-encodes bytes; the plumbing — schema in/out, no shuffle — is
    * identical).
    */
  def resize(media: Dataset[MediaRow], width: Int, height: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val bb = java.nio.ByteBuffer.wrap(r.bytes)
        bb.getInt; bb.getInt
        val dur = bb.getLong
        val payload = new Array[Byte](r.bytes.length - 16)
        bb.get(payload)
        r.copy(bytes = FakeCodec.encodeHeader(width, height, dur, payload))
      }
    }
  }

  /** Whole-media feature extraction: payload → embedding column (stub; a
    * real impl runs a vision/audio encoder with per-partition model
    * loading — the setup comment in [[decodeMeta]] applies doubly here).
    * The output's (id, Array[Float]) shape composes directly with
    * [[Ann]]/[[Ivf]]: media → embedding → LSH buckets is the content
    * dedup / retrieval path for image/audio corpora at 100 TB.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 8): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition encoder/model setup would go here
      rows.map { r =>
        // feature from the DECODED payload (header stripped): resized or
        // re-encoded headers must not change content identity
        val payload = java.util.Arrays.copyOfRange(r.bytes, 16, r.bytes.length)
        (r.media_id, FakeCodec.mediaFeature(payload, dim))
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
