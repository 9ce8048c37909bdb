package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2.12 X4): treat image/audio/video
  * payloads as opaque `binary` columns with a typed metadata struct, and run
  * decode / feature-extraction as partition-local transforms.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode kernel is a clearly-marked deterministic STUB — the Spark-side
  * plumbing (schema, batching, partition-local execution, feature-vector
  * shape) is real and tested. At 100 TB the payload column would be a lazy
  * pointer (path + offset) materialized only inside the decode partition —
  * both shapes are supported here.
  */
object Multimodal {

  /** Metadata struct carried next to every binary payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType),
    StructField("content_md5", StringType),
    StructField("media_type", StringType)))

  /** Wrap a source column as an opaque media payload + metadata. The digest
    * is computed on the base64 rendering so the same fingerprint is
    * reproducible in any engine.
    */
  def asMedia(df: DataFrame, idCol: String, payload: org.apache.spark.sql.Column,
              mediaType: String): DataFrame = {
    val bin = payload.cast(BinaryType)
    df.select(col(idCol),
      bin.as("media"),
      struct(
        length(bin).cast("long").as("n_bytes"),
        md5(base64(bin)).as("content_md5"),
        lit(mediaType).as("media_type")).as("meta"))
  }

  /** Byte-range sample of the payload (the "frame sample" of an opaque
    * stream): `n` evenly spaced slices of `sliceLen` bytes.
    */
  def sampleSlices(df: DataFrame, n: Int, sliceLen: Int): DataFrame = {
    val total = col("meta.n_bytes")
    val offsets = transform(sequence(lit(0), lit(n - 1)),
      i => (i * greatest(total - sliceLen, lit(1L)) / lit(math.max(n - 1, 1))) + 1)
    df.withColumn("slices",
      transform(offsets, o => base64(col("media").substr(o.cast("int"), lit(sliceLen)))))
  }

  /** Partition-local "decode + featurize" kernel.
    *
    * STUB DECODER — stands in for an image/audio codec that is not present
    * in this container. It is deterministic: feature j = mean of bytes
    * congruent to j (mod dim), scaled to [0,1). The Spark plumbing —
    * typed Dataset, mapPartitions batching, fixed-width feature output — is
    * exactly what a real decoder kernel would use (the JVM analog of a
    * Python `mapInPandas` decode stage).
    */
  def decodeFeaturesStub(df: DataFrame, idCol: String, dim: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed: Dataset[MediaRow] =
      df.select(col(idCol).cast("long").as("id"), col("media")).as[MediaRow]
    typed.mapPartitions { it =>
      it.map { row =>
        val sums = new Array[Double](dim)
        val counts = new Array[Long](dim)
        var i = 0
        val bytes = if (row.media == null) Array.empty[Byte] else row.media
        while (i < bytes.length) {
          val j = i % dim
          sums(j) += (bytes(i) & 0xFF) / 256.0
          counts(j) += 1
          i += 1
        }
        val feats = Array.tabulate(dim)(j => if (counts(j) == 0) 0.0 else sums(j) / counts(j))
        FeatureRow(row.id, feats)
      }
    }.toDF("id", "features")
  }
}

/** Top-level row types for the decode kernel (nested private case classes
  * break Janino-generated encoder access).
  */
final case class MediaRow(id: Long, media: Array[Byte])
final case class FeatureRow(id: Long, features: Array[Double])
