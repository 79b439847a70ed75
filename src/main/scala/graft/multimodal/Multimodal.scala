package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-local batches.
  *
  * The actual media decode is STUBBED (this container ships no image/audio
  * codecs): `decodeStub` produces a deterministic fake feature vector from
  * the bytes. Everything around it — the schema, the batch shape, the
  * partition-local iteration, the explode of sampled frames — is the real
  * 100 TB plumbing: batches never leave the executor, no driver collect, and
  * the binary payload is projected away as soon as features are extracted.
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true))), nullable = true)))

  /** Synthesize a media table from the documents table: content = utf-8 bytes
    * of the text (an opaque deterministic payload), meta derived from length.
    *
    * Null contract: a NULL-text document is an EMPTY payload (decoders see
    * zero bytes, metadata synthesizes from length 0), not an absent row — a
    * downstream struct encoder with non-null fields must never see a
    * null-field meta, and dropping rows here would silently change media
    * counts against the source table.
    */
  def fakeMediaFromDocs(docs: DataFrame): DataFrame = {
    val len = coalesce(col("n_chars"), lit(0L))
    docs.select(
      col("doc_id").as("media_id"),
      coalesce(col("text"), lit("")).cast("binary").as("content"),
      struct(
        lit("fake/raw").as("format"),
        (len % 64 + 1).cast("int").as("width"),
        (len % 48 + 1).cast("int").as("height"),
        (len % 16 + 1).cast("int").as("n_frames")).as("meta"))
  }

  /** Deterministic fake "decode": digest bytes into `dim` floats in [0,1).
    * Stands in for a real image/audio decoder; byte-identical across runs
    * and engines.
    */
  def decodeStub(content: Array[Byte], dim: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(if (content == null) Array.emptyByteArray else content)
    Array.tabulate(dim) { i =>
      val b0 = d(i % 16) & 0xff
      val b1 = d((i + 7) % 16) & 0xff
      ((b0 * 256 + b1).toFloat / 65536.0f)
    }
  }

  /** Batched feature extraction over the binary column. Batches of
    * `batchSize` rows are processed inside each partition (the mapInPandas
    * batch shape, expressed as Scala mapPartitions) — the decode stub is the
    * only fake part.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16, batchSize: Int = 64): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false),
      StructField("format", StringType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    media.select(col("media_id"), col("content"), col("meta.format").as("format"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val id = r.getLong(0)
            val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
            Row(id, decodeStub(bytes, dim).toSeq, if (r.isNullAt(2)) null else r.getString(2))
          }
        }
      }(enc)
  }

  /** "Resize" for image-like media — the decode→scale→re-encode step with the
    * pixel work stubbed deterministically (no codecs in this container): the
    * output payload is a digest-stretched byte array of the target size's
    * footprint, and meta reflects the new dimensions. The Spark-side shape is
    * the real thing: partition-local batches, binary in/binary out, no
    * driver involvement.
    */
  def resizeStub(media: DataFrame, targetW: Int, targetH: Int,
      batchSize: Int = 64): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = true),
      StructField("meta", MediaSchema("meta").dataType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    media.select("media_id", "content", "meta").mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val meta = if (r.isNullAt(2)) null else r.getStruct(2)
          val resized =
            if (bytes == null) null
            else {
              val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
              val size = math.max(1, (targetW * targetH) / 64)
              Array.tabulate[Byte](size)(i => md(i % 16))
            }
          val newMeta = if (meta == null) null else Row(
            meta.getString(0), targetW, targetH, meta.getInt(3))
          Row(id, resized, newMeta)
        }
      }
    }(enc)
  }

  /** Frame sampling for video-like media: one row per sampled frame index
    * (every `stride`-th of meta.n_frames). Pure plan — the explode happens
    * executor-side; content is carried, not duplicated per frame, by
    * sampling indices first.
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    // narrow projection FIRST (the binary payload must not ride the
    // spread exchange), then the under-partitioned-scan guard: the frame
    // explode amplifies by n_frames/stride per row — hundreds for real
    // video — so a compact media scan must not serialize it on one core
    graft.ops.Spread.forAmplification(
        media.select(col("media_id"), col("meta")), col("media_id"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("meta.n_frames") - 1, lit(0)), lit(stride))))
      .select(col("media_id"), col("frame_idx"), col("meta.format").as("format"))
}
