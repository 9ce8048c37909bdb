package graft

import graft.cdc.ChangeFilter
import graft.functions.Canonical
import graft.model.Model
import graft.state.BucketedStateStore
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Bucketed state: same commit semantics as the plain store, plus the scale
  * property — the CDC join reads bucketed state WITHOUT an exchange on the
  * state side (only the incoming batch shuffles).
  */
class BucketedStateStoreSpec extends SparkSpec {
  import spark.implicits._

  private def batch(rows: (String, String)*) =
    rows.toSeq.toDF("id", "entityHash")
      .withColumn("entityJson", lit("{}"))
      .select("id", "entityJson", "entityHash")

  test("bucketed commit: upsert, TTL eviction, generation alternation, checkpoint") {
    val store = new BucketedStateStore(spark, Files.createTempDirectory("bkt").toString, buckets = 4)
    store.commit("t", batch("1" -> "h1", "2" -> "h2"), nowMs = 1000, ttlMs = 500, newCheckpoint = 42)
    val (s1, c1) = store.load("t")
    assert(c1 == 42 && s1.count() == 2)

    // gen 2: upsert id=2, add id=3; id=1's ttl (1500) survives now=1100
    store.commit("t", batch("2" -> "h2b", "3" -> "h3"), nowMs = 1100, ttlMs = 500, newCheckpoint = 50)
    val (s2, c2) = store.load("t")
    assert(c2 == 50)
    assert(s2.select("id", "entityHash").as[(String, String)].collect().toMap ==
      Map("1" -> "h1", "2" -> "h2b", "3" -> "h3"))

    // gen 3 (wraps to slot 0): ids 1 (ttl 1500) and 2 (ttl 1600) are both
    // expired at now=2000; id=3 is re-touched by the batch -> refreshed
    store.commit("t", batch("3" -> "h3"), nowMs = 2000, ttlMs = 500, newCheckpoint = 60)
    assert(store.load("t")._1.select("id").as[String].collect().sorted.toSeq == Seq("3"))
  }

  test("state survives a session restart: catalog metadata is re-registered over the warehouse files") {
    val store = new BucketedStateStore(spark, Files.createTempDirectory("bkt3").toString, buckets = 4)
    store.commit("t", batch("1" -> "h1", "2" -> "h2"), nowMs = 1000, ttlMs = 500, newCheckpoint = 7)
    // simulate a restart: the in-memory catalog loses the table while the
    // warehouse files survive — copy data out, drop (which deletes the
    // managed files), restore the files without metadata
    val name = spark.catalog.listTables().collect()
      .map(_.name).find(_.contains("_t_g0")).orElse(
        spark.catalog.listTables().collect().map(_.name).find(_.endsWith("_g0"))).get
    val loc = java.nio.file.Paths.get(spark.sessionState.catalog.defaultTablePath(
      org.apache.spark.sql.catalyst.TableIdentifier(name)).getPath)
    val backup = Files.createTempDirectory("bkt3-backup")
    org.apache.commons.io.FileUtils.copyDirectory(loc.toFile, backup.toFile)
    spark.sql(s"DROP TABLE `$name`")
    org.apache.commons.io.FileUtils.copyDirectory(backup.toFile, loc.toFile)
    assert(!spark.catalog.tableExists(name))
    // load must re-register and read the surviving generation
    val (df, ckpt) = store.load("t")
    assert(ckpt == 7)
    assert(df.select("id").as[String].collect().sorted.toSeq == Seq("1", "2"))
    // and the next commit still works (generation advances into slot 1)
    store.commit("t", batch("3" -> "h3"), nowMs = 1100, ttlMs = 500, newCheckpoint = 8)
    assert(store.load("t")._1.count() == 3)
  }

  test("reopening with a different bucket count fails loudly instead of registering a wrong spec") {
    val root = Files.createTempDirectory("bkt5").toString
    new BucketedStateStore(spark, root, buckets = 4)
      .commit("t", batch("1" -> "h1"), nowMs = 1000, ttlMs = 500, newCheckpoint = 1)
    // simulate a restart with a changed config: the store must refuse to
    // re-register the surviving files under the NEW bucket count — a wrong
    // registered spec would silently misroute the no-exchange CDC join
    // this store's tables only — other suites' stores share the catalog
    val storeId = java.security.MessageDigest.getInstance("MD5")
      .digest(root.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    val name = spark.catalog.listTables().collect().map(_.name)
      .find(n => n.contains(storeId) && n.endsWith("_g0")).get
    spark.sql(s"DROP TABLE IF EXISTS `$name`") // metadata only in this simulation path
    val reopened = new BucketedStateStore(spark, root, buckets = 8)
    val e = intercept[IllegalArgumentException] { reopened.load("t") }
    assert(e.getMessage.contains("4 buckets") || e.getMessage.contains("buckets=4"))
    // reopening with the RECORDED count works
    assert(new BucketedStateStore(spark, root, buckets = 4).load("t")._2 == 1)
  }

  test("non-identifier type names (remote catalog) commit and load round-trip") {
    val store = new BucketedStateStore(spark, Files.createTempDirectory("bkt4").toString, buckets = 2)
    store.commit("aws-ec2", batch("1" -> "h1"), nowMs = 1000, ttlMs = 500, newCheckpoint = 1)
    assert(store.load("aws-ec2")._1.count() == 1)
    // distinct raw names must not collide after sanitization
    store.commit("aws_ec2", batch("2" -> "h2", "3" -> "h3"), nowMs = 1000, ttlMs = 500, newCheckpoint = 1)
    assert(store.load("aws-ec2")._1.count() == 1)
    assert(store.load("aws_ec2")._1.count() == 2)
  }

  test("CDC join over bucketed state shuffles only the batch side") {
    val store = new BucketedStateStore(spark, Files.createTempDirectory("bkt2").toString, buckets = 4)
    store.commit("t", batch((1 to 50).map(i => i.toString -> s"h$i"): _*), 1000, 100000, 1)

    val (state, _) = store.load("t")
    val incoming = (40 to 60).map(i => (i.toString, Some(i.toLong), Map("x" -> i.toString)))
      .toDF("id", Model.UpdatedOnMs, "attrs")
    val changed = ChangeFilter.newOrUpdated(incoming, state, "id",
      Canonical.canonicalHashExcept(col("attrs"), Model.IgnoredProps))

    val plan = changed.queryExecution.executedPlan.toString
    // broadcast would hide the property; force the sort-merge path check
    // only when no broadcast was chosen
    if (!plan.contains("BroadcastHashJoin")) {
      // exactly one Exchange: the incoming batch re-shuffles to the state's
      // bucketing; the bucketed state side scans in place
      assert(plan.split("Exchange").length - 1 == 1, s"unexpected exchanges in:\n$plan")
    }
    assert(changed.count() == 21) // 40..50 changed content, 51..60 new
  }
}
