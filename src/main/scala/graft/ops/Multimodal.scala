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

  /** X4 lazy-pointer variant (SURVEY.md §2.12): at 100 TB the payload bytes
    * cannot ride through every shuffle — the row carries only a
    * `(path, offset, n_bytes)` pointer into the media store, and bytes are
    * materialized partition-locally AFTER all shuffles, immediately before
    * the decode kernel. Joins/filters/repartitions upstream move ~50 bytes
    * per row instead of megabytes.
    */
  val pointerSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("offset", LongType),
    StructField("n_bytes", LongType)))

  /** Wrap pointer columns as the lazy media representation: (id, ptr,
    * meta). No payload bytes anywhere in the schema.
    */
  def asMediaPointers(df: DataFrame, idCol: String,
                      path: org.apache.spark.sql.Column,
                      offset: org.apache.spark.sql.Column,
                      nBytes: org.apache.spark.sql.Column,
                      mediaType: String): DataFrame =
    df.select(col(idCol),
      struct(path.as("path"), offset.cast("long").as("offset"),
        nBytes.cast("long").as("n_bytes")).as("ptr"),
      struct(nBytes.cast("long").as("n_bytes"),
        lit(mediaType).as("media_type")).as("meta"))

  /** Materialize pointer rows into payload bytes, partition-locally: each
    * partition opens its referenced files once (small channel cache), reads
    * the byte ranges, and emits (id, media). This is the LAST step before a
    * decode kernel — everything upstream shuffles pointers only. Local
    * filesystem reader; an object-store deployment swaps in its ranged-GET
    * client here, the Spark plumbing is identical.
    */
  def materializePointers(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed: Dataset[PointerRow] = df.select(
      col(idCol).cast("long").as("id"),
      col("ptr.path").as("path"),
      col("ptr.offset").as("offset"),
      col("ptr.n_bytes").as("nBytes")).as[PointerRow]
    typed.mapPartitions { it =>
      val channels = scala.collection.mutable.Map.empty[String, java.nio.channels.FileChannel]
      def channel(p: String) = channels.getOrElseUpdate(p,
        java.nio.channels.FileChannel.open(java.nio.file.Paths.get(p),
          java.nio.file.StandardOpenOption.READ))
      // close on TASK completion, not on iterator exhaustion: a limit/take
      // or task failure abandons the iterator mid-stream and would leak
      // the handles until GC
      Option(org.apache.spark.TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
        channels.values.foreach(ch => scala.util.Try(ch.close())); channels.clear()
      })
      new Iterator[MediaRow] {
        override def hasNext: Boolean = {
          val more = it.hasNext
          if (!more) { channels.values.foreach(_.close()); channels.clear() }
          more
        }
        override def next(): MediaRow = {
          val row = it.next()
          // a Spark binary cell is a JVM byte[]: hard ~2 GiB ceiling
          // (HotSpot caps arrays a few elements below Int.MaxValue — an
          // allocate at the exact boundary dies as OutOfMemoryError, which
          // Spark's handler treats as executor-fatal). Fail loudly rather
          // than let .toInt wrap to a silently-short read.
          require(row.nBytes >= 0 && row.nBytes <= Int.MaxValue - 8,
            s"payload of ${row.nBytes} bytes at ${row.path}:${row.offset} exceeds the " +
              "2 GiB binary-cell limit - split oversized media into ranged pointer rows")
          val buf = java.nio.ByteBuffer.allocate(row.nBytes.toInt)
          val ch = channel(row.path)
          var pos = row.offset
          while (buf.hasRemaining) {
            val n = ch.read(buf, pos)
            require(n >= 0, s"EOF at $pos reading ${row.nBytes} bytes of ${row.path}")
            pos += n
          }
          MediaRow(row.id, buf.array())
        }
      }
    }.toDF("id", "media")
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
final case class PointerRow(id: Long, path: String, offset: Long, nBytes: Long)
