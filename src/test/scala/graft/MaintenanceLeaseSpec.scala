package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{FileManifest, History, LeaseHeldException,
  MaintenanceLease}

/** The single-maintenance-agent lease: acquire/renew/release/expiry
  * semantics, the threaded two-daemon race (one proceeds, one bounces),
  * crash → expiry → takeover, and a flapping-daemon fuzz asserting
  * mutual exclusion across interleaved acquires. */
class MaintenanceLeaseSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def freshLake(): (org.apache.hadoop.fs.FileSystem, String) = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lease").toString + "/lake"
    Seq((1L, "a")).toDF("id", "tag").write.parquet(dir)
    History.enableManifests(spark, dir): Unit
    (new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration), dir)
  }

  test("acquire, renew, release, and the second-daemon bounce") {
    val (fs, dir) = freshLake()
    val l1 = MaintenanceLease.acquire(fs, dir, "daemonA", 60000L)
    assert(l1.version === 1L && l1.owner === "daemonA")
    // the second daemon bounces loudly while A's lease is live
    val e = intercept[LeaseHeldException] {
      MaintenanceLease.acquire(fs, dir, "daemonB", 60000L)
    }
    assert(e.getMessage.contains("daemonA"), e.getMessage)
    // the HOLDER renews freely — same verb, version advances
    val l2 = MaintenanceLease.acquire(fs, dir, "daemonA", 60000L)
    assert(l2.version === 2L && l2.expiresAt >= l1.expiresAt)
    // release publishes an expired marker; B then acquires
    assert(MaintenanceLease.release(fs, dir, "daemonA"))
    val l3 = MaintenanceLease.acquire(fs, dir, "daemonB", 60000L)
    assert(l3.owner === "daemonB" && l3.version > l2.version)
    // a non-holder release is a no-op false
    assert(!MaintenanceLease.release(fs, dir, "daemonA"))
    // superseded lease files are swept — only the current remains
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(
        MaintenanceLease.leaseDir(dir)))
      .map(_.getPath.getName).filter(_.endsWith(".lease"))
    assert(files.length === 1, files.mkString(","))
  }

  test("crash → lease expires → takeover") {
    val (fs, dir) = freshLake()
    // "daemonA" acquires with a tiny TTL and crashes (never releases)
    MaintenanceLease.acquire(fs, dir, "daemonA", 50L): Unit
    intercept[LeaseHeldException] {
      MaintenanceLease.acquire(fs, dir, "daemonB", 60000L)
    }
    Thread.sleep(120L)
    // past expiry the next daemon takes over without manual unlock
    val l = MaintenanceLease.acquire(fs, dir, "daemonB", 60000L)
    assert(l.owner === "daemonB")
  }

  test("fencing: a zombie pass that outlived its TTL deletes nothing " +
      "under the successor's lease") {
    import spark.implicits._
    val (fs, dir) = freshLake()
    // retire a file so vacuum(grace≈0) has something real to delete
    History.deleteWhere(spark, dir,
      org.apache.spark.sql.functions.col("id") === 1L): Unit
    val m = FileManifest.latest(fs, dir).get
    assert(m.retired.nonEmpty, "need a retired file to prove no-delete")
    val retiredPath = new org.apache.hadoop.fs.Path(
      fs.makeQualified(new org.apache.hadoop.fs.Path(dir)),
      m.retired.head._2)
    assert(fs.exists(retiredPath))
    // daemon A's pass stalls past its own TTL; B takes over
    val zombie = MaintenanceLease.acquire(fs, dir, "daemonA", 50L)
    Thread.sleep(120L)
    val succ = MaintenanceLease.acquire(fs, dir, "daemonB", 60000L)
    // A resumes its sweep with its stale token — the fence bounces it
    // BEFORE the first delete batch, and the retired file survives
    val e = intercept[graft.sources.LeaseFencedException] {
      History.vacuum(spark, dir, graceMs = 1L,
        fence = () => MaintenanceLease.checkFence(fs, dir, zombie))
    }
    assert(e.getMessage.contains("daemonB"), e.getMessage)
    assert(fs.exists(retiredPath), "zombie sweep must delete nothing")
    // the live holder's fence passes and the sweep reclaims
    Thread.sleep(5L)
    History.vacuum(spark, dir, graceMs = 1L,
      fence = () => MaintenanceLease.checkFence(fs, dir, succ)): Unit
    assert(!fs.exists(retiredPath), "the valid holder's sweep reclaims")
    // an EXPIRED-but-unsuperseded token also bounces (deleting without
    // a valid lease is the hazard, successor or not) — and a renewal
    // by the same owner at a higher version passes
    val short = MaintenanceLease.acquire(fs, dir, "daemonB", 1L)
    Thread.sleep(10L)
    intercept[graft.sources.LeaseFencedException] {
      MaintenanceLease.checkFence(fs, dir, short)
    }
    MaintenanceLease.acquire(fs, dir, "daemonB", 60000L): Unit
    MaintenanceLease.checkFence(fs, dir, short) // renewed: passes
  }

  test("a zombie whose fence passes STALE at the batch boundary " +
      "renames, never destroys: zero irrecoverable deletes") {
    import spark.implicits._
    val (fs, dir) = freshLake()
    History.deleteWhere(spark, dir,
      org.apache.spark.sql.functions.col("id") === 1L): Unit
    val m = FileManifest.latest(fs, dir).get
    val retiredRel = m.retired.head._2
    val qRoot = fs.makeQualified(new org.apache.hadoop.fs.Path(dir))
    val retiredPath = new org.apache.hadoop.fs.Path(qRoot, retiredRel)
    assert(fs.exists(retiredPath))
    // the worst interleaving: the TTL expires (successor takes over)
    // RIGHT AFTER a fence check passed — the first delete batch runs
    // on a stale check. Simulated deterministically: the first fence
    // call passes, every later one throws (the pass is a zombie from
    // batch 2 on).
    var calls = 0
    val e = intercept[graft.sources.LeaseFencedException] {
      History.vacuum(spark, dir, graceMs = 1L, fence = { () =>
        calls += 1
        if (calls > 1) throw new graft.sources.LeaseFencedException(
          "simulated: lease lost after the first batch's check passed")
      })
    }
    assert(e.getMessage.contains("simulated"))
    // the stale-checked batch RAN — the file left its live path —
    // but nothing was destroyed: its bytes sit in the pass's trash
    assert(!fs.exists(retiredPath),
      "the stale-checked batch should have run (rename)")
    val trashRoot = new org.apache.hadoop.fs.Path(
      FileManifest.manifestDir(dir), "trash")
    val trashed = fs.listStatus(trashRoot).filter(_.isDirectory)
    assert(trashed.length === 1, "one abandoned pass trash dir")
    // full recovery: restore puts the byte-identical file back
    assert(History.restoreTrash(spark, dir) === 1)
    assert(fs.exists(retiredPath), "restored to its original path")
    // a later VALID pass reclaims it for real (trash purged at pass
    // end, nothing abandoned left behind)
    Thread.sleep(5L)
    History.vacuum(spark, dir, graceMs = 1L): Unit
    assert(!fs.exists(retiredPath))
    val leftover = if (fs.exists(trashRoot))
      fs.listStatus(trashRoot).filter(_.isDirectory) else Array.empty
    assert(leftover.isEmpty, "a completed pass leaves no trash")
    // and the lake still answers
    assert(History.readPinned(spark, dir).count() === 0L)
  }

  test("abandoned trash of a crashed pass is reclaimed by a later " +
      "vacuum only past grace") {
    import spark.implicits._
    val (fs, dir) = freshLake()
    History.deleteWhere(spark, dir,
      org.apache.spark.sql.functions.col("id") === 1L): Unit
    // zombie pass dies after batch 1 (as above)
    var calls = 0
    intercept[graft.sources.LeaseFencedException] {
      History.vacuum(spark, dir, graceMs = 1L, fence = { () =>
        calls += 1
        if (calls > 1) throw new graft.sources.LeaseFencedException(
          "simulated")
      })
    }
    val trashRoot = new org.apache.hadoop.fs.Path(
      FileManifest.manifestDir(dir), "trash")
    assert(fs.listStatus(trashRoot).count(_.isDirectory) === 1)
    // a successor running with a LONG grace leaves the fresh trash
    // alone — the restore window holds
    History.vacuum(spark, dir, graceMs = 3600000L): Unit
    assert(fs.listStatus(trashRoot).count(_.isDirectory) === 1,
      "fresh abandoned trash must survive within grace")
    // past grace it is reclaimed
    Thread.sleep(10L)
    History.vacuum(spark, dir, graceMs = 1L): Unit
    assert(fs.listStatus(trashRoot).count(_.isDirectory) === 0,
      "abandoned trash past grace is reclaimed")
  }

  test("two daemons racing the same acquire: exactly one wins") {
    val (fs, dir) = freshLake()
    for (round <- 0 until 5) {
      val winners = new java.util.concurrent.atomic.AtomicInteger(0)
      val losers = new java.util.concurrent.atomic.AtomicInteger(0)
      val start = new java.util.concurrent.CountDownLatch(1)
      val threads = (0 until 4).map { i =>
        new Thread(() => {
          start.await()
          try {
            MaintenanceLease.acquire(fs, dir, s"racer-$round-$i",
              60000L): Unit
            winners.incrementAndGet(): Unit
          } catch {
            case _: LeaseHeldException => losers.incrementAndGet(): Unit
          }
        })
      }
      threads.foreach(_.start())
      start.countDown()
      threads.foreach(_.join(30000L))
      assert(winners.get() === 1,
        s"round $round: ${winners.get()} winners (want exactly 1)")
      assert(losers.get() === 3, s"round $round: ${losers.get()} losers")
      // release so the next round starts clean
      val holder = MaintenanceLease.current(fs, dir).get.owner
      assert(MaintenanceLease.release(fs, dir, holder))
    }
  }

  test("flapping-daemon fuzz: interleaved acquire/crash cycles never " +
      "overlap two holders") {
    val (fs, dir) = freshLake()
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    val overlaps = new java.util.concurrent.atomic.AtomicInteger(0)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    // TTL far above the hold time: mutual exclusion is only promised
    // for holders that finish (or renew) within their lease
    val ttl = 5000L
    val threads = (0 until 3).map { i =>
      new Thread(() => {
        val rnd = new scala.util.Random(1000L + i)
        while (!stop.get()) {
          try {
            MaintenanceLease.acquire(fs, dir, s"flapper-$i", ttl): Unit
            if (inside.incrementAndGet() != 1)
              overlaps.incrementAndGet(): Unit
            Thread.sleep(1L + rnd.nextInt(5))
            inside.decrementAndGet(): Unit
            // half the cycles CRASH (no release) — the successor
            // waits out the TTL like a real takeover; the other half
            // release promptly
            if (rnd.nextBoolean())
              MaintenanceLease.release(fs, dir, s"flapper-$i"): Unit
          } catch {
            case _: LeaseHeldException => Thread.sleep(2L)
          }
        }
      })
    }
    threads.foreach(_.start())
    Thread.sleep(3000L)
    stop.set(true)
    threads.foreach(_.join(30000L))
    assert(overlaps.get() === 0,
      s"${overlaps.get()} overlapping lease holds observed")
    // the flappers made real progress (some acquires succeeded)
    assert(MaintenanceLease.current(fs, dir).isDefined)
  }

  test("MaintenanceMain bounces out when another daemon holds the lease") {
    val (fs, dir) = freshLake()
    val feed = java.nio.file.Files
      .createTempDirectory("graft-lease-feed").toString
    MaintenanceLease.acquire(fs, dir, "other-daemon", 60000L): Unit
    spark.conf.set("spark.graft.maintenance.lake", dir)
    spark.conf.set("spark.graft.maintenance.feedDir", feed)
    try {
      intercept[LeaseHeldException] {
        MaintenanceMain.acquireLease(spark, "this-daemon")
      }
      // with the holder released, the pass path acquires and runs
      assert(MaintenanceLease.release(fs, dir, "other-daemon"))
      MaintenanceMain.acquireLease(spark, "this-daemon")
      MaintenanceMain.runOnce(spark): Unit // full pass under the lease
      assert(MaintenanceLease.current(fs, dir)
        .exists(_.owner === "this-daemon"))
      MaintenanceMain.releaseLease(spark, "this-daemon")
      // lease off (ttl 0) skips enforcement entirely
      spark.conf.set("spark.graft.maintenance.leaseTtlMs", "0")
      MaintenanceMain.acquireLease(spark, "whoever")
    } finally {
      spark.conf.unset("spark.graft.maintenance.lake")
      spark.conf.unset("spark.graft.maintenance.feedDir")
      spark.conf.unset("spark.graft.maintenance.leaseTtlMs")
    }
  }

  test("lease files live under _manifests and never pollute the data " +
      "listing") {
    val (fs, dir) = freshLake()
    MaintenanceLease.acquire(fs, dir, "daemonA", 60000L): Unit
    val live = FileManifest.listLiveFiles(fs, dir)
    assert(!live.exists(_.contains("lease")), live.mkString(","))
    // a vacuum pass leaves the lease alone
    History.vacuum(spark, dir, graceMs = 0L): Unit
    assert(MaintenanceLease.current(fs, dir).exists(_.owner === "daemonA"))
  }
}
