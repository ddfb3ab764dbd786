package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: media (image/audio/video) travels through the
 * engine as an opaque `binary` payload plus a typed metadata struct. The
 * expensive per-record work (codec decode, feature extraction) runs in
 * `mapPartitions` so each task amortizes codec/model setup across its batch
 * — the Scala analog of `mapInPandas` batching.
 *
 * The actual codec is STUBBED (no image/audio libraries in this container):
 * [[MediaCodecStub.decode]] produces a deterministic fake feature vector
 * from the payload bytes. The Spark-side plumbing — schema, encoders,
 * partitioning, batch shape — is real and tested; swapping in a real codec
 * changes only the body of `decode`.
 */
object Multimodal {

  /** One media record: payload + typed metadata. */
  final case class MediaRecord(
      doc_id: Long,
      payload: Array[Byte],
      mime: String,
      width: Long,
      height: Long,
      n_frames: Long)

  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      checksum: Long,
      feature: Array[Double])

  /**
   * ===== STUB =====
   * Stand-in for a real image/audio decoder. Deterministic: derives a
   * fixed-length "feature vector" from payload bytes. A real implementation
   * would decode pixels/samples here; everything around it stays unchanged.
   */
  object MediaCodecStub {
    val FeatureDim = 8

    def decode(payload: Array[Byte]): (Long, Array[Double]) = {
      var checksum = 0L
      val feat = new Array[Double](FeatureDim)
      var i = 0
      while (i < payload.length) {
        val b = payload(i) & 0xff
        checksum += b
        feat(i % FeatureDim) += b / 255.0
        i += 1
      }
      (checksum, feat)
    }
  }

  /**
   * Wrap the documents table as a multimodal table: text bytes become the
   * opaque payload; metadata is derived deterministically (a real pipeline
   * would read it from the container format).
   */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // null text -> empty payload: MediaRecord's primitive metadata fields
    // are non-nullable, so a single null-text row would otherwise kill the
    // whole job at encoder time (AssertNotNull)
    val text = coalesce(col("text"), lit(""))
    docs.select(
      col("doc_id"),
      text.cast("binary").as("payload"),
      lit("text/plain").as("mime"),
      (lit(16) + octet_length(text) % 48).cast("long").as("width"),
      (lit(16) + (octet_length(text) * 7) % 48).cast("long").as("height"),
      (lit(1) + octet_length(text) % 8).cast("long").as("n_frames")
    ).as[MediaRecord]
  }

  /**
   * Batch "decode" + feature extraction. mapPartitions (not map/UDF) so a
   * real codec initializes once per task, not once per record — the shape
   * that matters when each partition holds thousands of blobs.
   */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { it =>
      // real pipeline: val codec = HeavyCodec.open() — once per partition
      it.map { r =>
        val (checksum, feat) = MediaCodecStub.decode(r.payload)
        MediaFeatures(r.doc_id, r.payload.length.toLong, checksum, feat)
      }
    }
  }

  /**
   * Frame sampling: slice `n` evenly spaced fixed-size windows out of the
   * payload (the video-frame-sampling access pattern over an opaque blob).
   */
  def sampleFrames(media: Dataset[MediaRecord], n: Int, frameBytes: Int): DataFrame = {
    val sampled = udf { (payload: Array[Byte]) =>
      if (payload == null || payload.isEmpty) Array.empty[Array[Byte]]
      else {
        val step = math.max(1, payload.length / n)
        (0 until n).iterator
          .map(i => i * step)
          .takeWhile(_ < payload.length)
          .map(off => payload.slice(off, math.min(off + frameBytes, payload.length)))
          .toArray
      }
    }
    media.toDF().withColumn("frames", sampled(col("payload")))
      .select(col("doc_id"), col("mime"), col("frames"),
        size(col("frames")).cast("long").as("n_sampled"))
  }

  /** Metadata projection — the oracle-checkable face of the multimodal
    * table (pure arithmetic, no codec). */
  def metaTable(docs: DataFrame): DataFrame =
    fromDocuments(docs).toDF()
      .select(col("doc_id"), col("mime"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        col("width"), col("height"), col("n_frames"))
}
