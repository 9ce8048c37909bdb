package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-adaptive event-time access.
  *
  * The reference's time semantics are *logical* epoch millis (`updatedOnMs`,
  * reference cache.js:16) and never depend on the physical encoding of the
  * source column. Real sources deliver event time in several parquet
  * encodings — TIMESTAMP(NANOS) (only readable in Spark 4 as a nanos LONG
  * under `spark.sql.legacy.parquet.nanosAsLong`), TIMESTAMP(MICROS) as
  * TIMESTAMP_NTZ or TIMESTAMP — and the encoding is owned by the producer,
  * so it can change between runs. Every accessor here inspects the bound
  * column's DataType and emits the right arithmetic:
  *
  *  - integral (nanos-as-long): exact integer division `ts div 1000000`
  *    (matches DuckDB `epoch_ms` flooring);
  *  - TIMESTAMP / TIMESTAMP_NTZ: `unix_millis(cast(ts as timestamp))`
  *    under the UTC session zone ([[Canonical.tsMillis]]).
  *
  * Predicates ([[Accessors.after]] / [[Accessors.atLeast]] /
  * [[Accessors.before]]) compare the RAW column against pre-scaled bounds —
  * longs for integral columns, timestamp literals for timestamp columns —
  * because arithmetic on the column (`ts div 1000000 > c`) defeats parquet
  * row-group min/max pruning, while both long and timestamp literals prune
  * natively. The rewrites are exact for sub-millisecond encodings:
  * floor(ms) > c ⇔ ts ≥ (c+1)ms, floor(ms) ≥ c ⇔ ts ≥ c·ms,
  * floor(ms) < c ⇔ ts < c·ms.
  */
object EventTime {

  /** Accessors bound to one column's physical type. */
  final class Accessors private[EventTime] (dt: DataType, name: String) {

    private val isIntegral = dt match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _                                             => false
    }

    /** Event time as epoch millis (BIGINT), whatever the encoding. */
    val ms: Column =
      if (isIntegral) expr(s"$name div 1000000")
      else Canonical.tsMillis(col(name))

    /** A literal of the column's own type holding epoch-millis `msv` —
      * type-matched so the comparison reaches the parquet scan as a
      * pushable filter (no implicit cast wrapping the column).
      */
    private def tsLit(msv: Long): Column = dt match {
      case TimestampNTZType =>
        lit(java.time.LocalDateTime.ofInstant(
          java.time.Instant.ofEpochMilli(msv), java.time.ZoneOffset.UTC))
      case _ =>
        lit(java.time.Instant.ofEpochMilli(msv))
    }

    /** floor(ms) > c — strict "past the checkpoint" (reference cache.js:114). */
    def after(c: Long): Column =
      if (isIntegral) col(name) >= (c + 1) * 1000000L else col(name) >= tsLit(c + 1)

    /** floor(ms) >= c. */
    def atLeast(c: Long): Column =
      if (isIntegral) col(name) >= c * 1000000L else col(name) >= tsLit(c)

    /** floor(ms) < c. */
    def before(c: Long): Column =
      if (isIntegral) col(name) < c * 1000000L else col(name) < tsLit(c)
  }

  /** Bind accessors to `df`'s `colName` (default `ts`), inspecting its type. */
  def bind(df: DataFrame, colName: String = "ts"): Accessors =
    new Accessors(df.schema(colName).dataType, colName)
}
