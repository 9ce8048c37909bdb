package graft.state

import graft.model.Model
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}

/** Bucketed variant of the entity state table — the 100 TB posture from
  * SURVEY.md §7.5: state is the big side of the CDC join, so it is stored
  * bucketed (+sorted) by `id`. Re-reading it for the join then produces NO
  * exchange on the state side — only the (much smaller) incoming batch is
  * shuffled to the state's bucketing, every run.
  *
  * Commits alternate between two bucketed tables (blue/green) because a
  * catalog table cannot be overwritten by a plan that reads it; a pointer
  * file records which generation is current, preserving the reference's
  * page-granular commit (app.js:57-58) with crash-safe swap semantics.
  *
  * (In a real deployment the catalog is a shared metastore; here the
  * in-session catalog carries the bucketing metadata, which is exactly what
  * the CDC join needs within a run.)
  */
final class BucketedStateStore(spark: SparkSession, root: String, buckets: Int = 8) {

  private def typeDir(t: String): Path = Paths.get(root, t)
  private def ckptFile(t: String): Path = typeDir(t).resolve("checkpoint")
  private def genFile(t: String): Path = typeDir(t).resolve("generation")
  // the bucket count the surviving parquet files were WRITTEN with: a
  // restart that constructs the store with a different `buckets` must not
  // re-register a wrong bucket spec — the CDC join's no-exchange property
  // would then silently read rows from the wrong buckets
  private def bucketsFile(t: String): Path = typeDir(t).resolve("buckets")

  private def recordedBuckets(t: String): Option[Int] =
    if (Files.exists(bucketsFile(t))) Some(Files.readString(bucketsFile(t)).trim.toInt) else None
  // store-unique table names: two stores (or re-runs over a reused
  // warehouse) must not collide
  private val storeId = java.security.MessageDigest.getInstance("MD5")
    .digest(root.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
  // type names come from the REMOTE catalog: anything outside identifier
  // characters (aws-ec2) would make saveAsTable's parse fail. Sanitized
  // with a short hash suffix so distinct raw names cannot collide.
  private def sanitized(t: String): String = {
    val clean = t.replaceAll("[^A-Za-z0-9_]", "_")
    if (clean == t) t
    else clean + "_" + java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).take(2).map("%02x".format(_)).mkString
  }
  private def tableName(t: String, gen: Long): String =
    s"graft_state_${storeId}_${sanitized(t)}_g${gen % 2}"

  private def currentGen(t: String): Option[Long] =
    if (Files.exists(genFile(t))) Some(Files.readString(genFile(t)).trim.toLong) else None

  def load(entityType: String): (DataFrame, Long) = {
    val df = currentGen(entityType) match {
      case Some(gen) =>
        val name = tableName(entityType, gen)
        // the generation pointer survives a session restart but the
        // in-session catalog does not: re-register the table over its
        // surviving warehouse files (bucket spec included, so the CDC
        // join's no-exchange property is restored too) before reading
        if (!spark.catalog.tableExists(name)) reRegister(entityType, name)
        if (spark.catalog.tableExists(name)) spark.table(name)
        else emptyState // pointer without files: bootstrap like a cache miss
      case None => emptyState
    }
    val ckpt =
      if (Files.exists(ckptFile(entityType))) Files.readString(ckptFile(entityType)).trim.toLong
      else Model.DefaultCheckpoint
    (df, ckpt)
  }

  private def emptyState: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Model.stateSchema)

  /** Recreate catalog metadata for a generation table whose files survived
    * a session restart in the warehouse directory (the in-memory catalog
    * starts empty every session).
    */
  private def reRegister(entityType: String, name: String): Unit = {
    // the files' actual bucket count wins; a silent mismatch would corrupt
    // every join that trusts the registered spec, so refuse loudly instead
    val fileBuckets = recordedBuckets(entityType).getOrElse(buckets)
    require(fileBuckets == buckets,
      s"BucketedStateStore at $root/$entityType was written with $fileBuckets buckets " +
        s"but reopened with buckets=$buckets; reopen with buckets=$fileBuckets " +
        "(or recommit the state) — registering a mismatched bucket spec would " +
        "silently misroute the bucketed CDC join")
    val loc = spark.sessionState.catalog.defaultTablePath(
      org.apache.spark.sql.catalyst.TableIdentifier(name))
    if (Files.exists(Paths.get(loc.getPath))) {
      spark.sql(s"CREATE TABLE `$name` (${Model.stateSchema.toDDL}) USING PARQUET " +
        s"CLUSTERED BY (id) SORTED BY (id) INTO $fileBuckets BUCKETS LOCATION '$loc'")
    }
  }

  /** Same commit semantics as [[EntityStateStore.commit]] (upsert + TTL
    * eviction + checkpoint advance), materialized as a bucketed, id-sorted
    * catalog table in the next generation slot.
    */
  def commit(entityType: String, batch: DataFrame, nowMs: Long, ttlMs: Long,
             newCheckpoint: Long): Unit = {
    val (state, _) = load(entityType)
    val fresh = StateStores.dedupNewestPerId(batch)
      .select(col("id"), lit(nowMs + ttlMs).as("ttl"), col("entityJson"), col("entityHash"))
    val survivors = state
      .where(col("ttl") >= lit(nowMs))
      .join(fresh.select(col("id").as("__bid")), col("id") === col("__bid"), "left_anti")
    val next = survivors.unionByName(fresh).select(Model.stateSchema.fieldNames.map(col): _*)

    val gen = currentGen(entityType).map(_ + 1).getOrElse(0L)
    dropStale(tableName(entityType, gen))
    next.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "id").sortBy("id")
      .format("parquet")
      .saveAsTable(tableName(entityType, gen))

    Files.createDirectories(typeDir(entityType))
    Files.writeString(bucketsFile(entityType), buckets.toString)
    Files.writeString(genFile(entityType), gen.toString)
    Files.writeString(ckptFile(entityType), newCheckpoint.toString)
  }

  /** Drop the slot's table AND its warehouse directory — a crashed previous
    * session can leave the directory behind with no catalog entry, which
    * blocks re-creation (LOCATION_ALREADY_EXISTS).
    */
  private def dropStale(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    val loc = spark.sessionState.catalog.defaultTablePath(
      org.apache.spark.sql.catalyst.TableIdentifier(name))
    val dir = Paths.get(loc.getPath)
    if (Files.exists(dir)) {
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
    }
  }
}
