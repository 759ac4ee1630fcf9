package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: media as opaque BINARY + typed metadata
  * (SURVEY §2.K / task brief). The Spark-side plumbing — schema,
  * partitioning, batch shape — is real; the actual codec is STUBBED with
  * a deterministic fake (this container has no image/audio libraries),
  * clearly marked below. On a real cluster the stub body is the only
  * thing to replace (e.g. with a JNI/javacv decoder), the dataflow
  * stays identical.
  */
object Multimodal {

  /** One media row: media is the opaque payload; meta is typed. */
  case class MediaRow(id: Long, media: Array[Byte], format: String, n_bytes: Long)
  case class MediaFeatures(id: Long, format: String, n_bytes: Long,
                           header_hex: String, checksum: String,
                           thumb_bytes: Long, frames_sampled: Int)

  /** Build a media table from the documents fixture: the UTF-8 bytes of
    * `text` stand in for an encoded image/audio payload (deterministic). */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    graft.core.Tables.documents(s, dir).select(
      col("doc_id").as("id"),
      col("text").cast("binary").as("media"),
      when(pmod(col("doc_id"), lit(2)) === 0, "png").otherwise("wav").as("format"),
      octet_length(col("text").cast("binary")).cast("long").as("n_bytes"))

  /** Per-partition "decode + feature extract". mapPartitions (not map) is
    * deliberate: a real decoder amortizes codec init per partition, and
    * partition size bounds decoder memory. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // >>> STUB DECODER <<< — deterministic fake standing in for an
      // image/audio codec. Real impl: decode `m.media`, emit real
      // dimensions/frames. Everything below derives only from the bytes.
      // The digest instance is per-partition (the codec-init-amortization
      // slot); md5 (vs an ad-hoc fold) keeps the output engine-portable.
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { m =>
        val header = m.media.take(4).map(b => f"$b%02X").mkString
        md.reset()
        val checksum = md.digest(m.media).map(b => f"$b%02x").mkString
        val thumb = math.max(m.n_bytes / 16, 1L)        // "resize": 1/16 payload
        val frames = math.min(8, (m.n_bytes / 64 + 1)).toInt // "frame sample"
        MediaFeatures(m.id, m.format, m.n_bytes, header, checksum, thumb, frames)
      }
    }
  }

  /** End-to-end plumbing: table → typed Dataset (repartitioned so decode
    * parallelism is independent of file layout) → per-partition decode. */
  def features(s: SparkSession, dir: String, partitions: Int = 32): DataFrame = {
    import s.implicits._
    val ds = mediaTable(s, dir).repartition(partitions, col("id")).as[MediaRow]
    decodeFeatures(ds).toDF()
  }
}
