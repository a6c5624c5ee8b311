package graft.operators

import graft.SparkSpec
import java.nio.file.Files

class MetadataStoreSpec extends SparkSpec {

  test("KV store: set/get, last-write-wins, checkpoint accessors") {
    val path = Files.createTempDirectory("graft_meta").toString + "/kv"
    assert(MetadataStore.get(spark, path, "anything").isEmpty)
    assert(MetadataStore.lastSlot(spark, path).isEmpty)

    MetadataStore.updateLastSlot(spark, path, 100L)
    assert(MetadataStore.lastSlot(spark, path).contains(100L))

    // overwrite advances; older versions remain underneath but the
    // snapshot resolves to the newest — no sleeps: versioning must be
    // correct even for back-to-back writes
    MetadataStore.updateLastSlot(spark, path, 250L)
    MetadataStore.set(spark, path, "warehouse_type", "parquet")
    assert(MetadataStore.lastSlot(spark, path).contains(250L))
    assert(MetadataStore.get(spark, path, "warehouse_type").contains("parquet"))
    assert(MetadataStore.snapshot(spark, path).count() == 2) // 2 live keys
  }

  test("compaction shrinks the log and preserves the snapshot") {
    val path = Files.createTempDirectory("graft_meta_compact").toString + "/kv"
    (1L to 5L).foreach(i => MetadataStore.updateLastSlot(spark, path, i * 100))
    MetadataStore.set(spark, path, "warehouse_type", "orc")
    assert(spark.read.parquet(path).count() == 6) // full audit log
    MetadataStore.compact(spark, path)
    // one row per live key + the hidden compaction-floor marker
    assert(spark.read.parquet(path).count() == 3)
    assert(MetadataStore.snapshot(spark, path).count() == 2)
    assert(MetadataStore.lastSlot(spark, path).contains(500L))
    assert(MetadataStore.get(spark, path, "warehouse_type").contains("orc"))
    // post-compact writes keep layering normally
    MetadataStore.updateLastSlot(spark, path, 600L)
    assert(MetadataStore.lastSlot(spark, path).contains(600L))
  }

  test("version travel below the compaction floor fails loudly, not silently") {
    val path = Files.createTempDirectory("graft_meta_floor").toString + "/kv"
    MetadataStore.updateLastSlot(spark, path, 100L)
    val v1 = MetadataStore.snapshot(spark, path)
      .select("updated_at").collect()(0).getLong(0)
    MetadataStore.updateLastSlot(spark, path, 250L)
    // pre-compact: history intact, v1 readable
    assert(MetadataStore.snapshotAt(spark, path, v1).count() == 1)
    MetadataStore.compact(spark, path)
    // post-compact: v1's history is gone — truncation must not read as
    // a (filtered, possibly empty) fake snapshot
    val e = intercept[IllegalArgumentException] {
      MetadataStore.snapshotAt(spark, path, v1).collect()
    }
    assert(e.getMessage.contains("compaction floor"))
    // the floor itself and anything newer still read fine
    val floor = MetadataStore.snapshot(spark, path)
      .select("updated_at").collect().map(_.getLong(0)).max
    assert(MetadataStore.snapshotAt(spark, path, floor).count() == 1)
    assert(MetadataStore.lastSlot(spark, path).contains(250L))
    // the reserved marker key is invisible to reads and unwritable
    assert(MetadataStore.get(spark, path, MetadataStore.FloorKey).isEmpty)
    intercept[IllegalArgumentException] {
      MetadataStore.set(spark, path, MetadataStore.FloorKey, "0")
    }
    // repeated compaction keeps the floor monotonic
    MetadataStore.compact(spark, path)
    assert(MetadataStore.snapshotAt(spark, path, floor).count() == 1)
  }

  test("compacting single-version keys discards nothing: every as-of stays readable") {
    // the floor tracks what compaction DESTROYS, not merely when it
    // ran: one version per key means the compacted row IS the full
    // history, so even pre-write as-of reads must keep working
    val path = Files.createTempDirectory("graft_meta_nofloor").toString + "/kv"
    MetadataStore.updateLastSlot(spark, path, 42L)
    val v1 = MetadataStore.snapshot(spark, path)
      .select("updated_at").collect()(0).getLong(0)
    MetadataStore.compact(spark, path)
    assert(MetadataStore.snapshotAt(spark, path, v1 - 1).count() == 0) // pre-write: empty, not an error
    assert(MetadataStore.snapshotAt(spark, path, v1).count() == 1)
    assert(MetadataStore.lastSlot(spark, path).contains(42L))
    // and no marker row was materialized for the no-op floor
    assert(spark.read.parquet(path).count() == 1)
  }

  test("crash between compaction renames: store heals instead of losing data") {
    // Simulate StoreOps.replaceWith dying between `rename(dst, prev)` and
    // `rename(staged, dst)`: dst is gone, prev holds the ONLY copy. Every
    // entry point (read, write, compact) must restore it — in particular
    // compact must NOT snapshot the missing dir as empty and then delete
    // prev, which was the pre-fix data-loss path.
    val path = Files.createTempDirectory("graft_meta_crash").toString + "/kv"
    MetadataStore.updateLastSlot(spark, path, 123L)
    MetadataStore.set(spark, path, "warehouse_type", "parquet")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + "_prev")), "crash setup rename failed")

    // reads heal the torn swap
    assert(MetadataStore.lastSlot(spark, path).contains(123L))
    assert(fs.exists(new org.apache.hadoop.fs.Path(path)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "_prev")))

    // tear it again and go straight to compact: nothing may be lost
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + "_prev")))
    MetadataStore.compact(spark, path)
    assert(MetadataStore.lastSlot(spark, path).contains(123L))
    assert(MetadataStore.get(spark, path, "warehouse_type").contains("parquet"))
    // both keys are single-version: nothing discarded, so no floor marker
    assert(spark.read.parquet(path).count() == 2)

    // and a torn swap followed by a WRITE keeps the prior keys too
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + "_prev")))
    MetadataStore.updateLastSlot(spark, path, 456L)
    assert(MetadataStore.lastSlot(spark, path).contains(456L))
    assert(MetadataStore.get(spark, path, "warehouse_type").contains("parquet"))
  }

  test("grace-gated read heal: an in-flight swap is waited out, a crash is healed") {
    // A LIVE replaceWith exposes the same (prev present, dst absent)
    // state between its two renames as a crash does. A reader healing
    // inside that window renames prev back under the compactor — so the
    // read path re-checks across a grace window and only heals a state
    // that stays torn (i.e. a crash). Simulate the in-flight case with a
    // thread that completes the "swap" mid-grace.
    val path = Files.createTempDirectory("graft_meta_grace").toString + "/kv"
    MetadataStore.updateLastSlot(spark, path, 7L)
    val dst = new org.apache.hadoop.fs.Path(path)
    val prev = new org.apache.hadoop.fs.Path(path + "_prev")
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)

    assert(fs.rename(dst, prev), "swap-window setup rename failed")
    val compactor = new Thread(() => { Thread.sleep(60L); fs.rename(prev, dst); () })
    compactor.start()
    // must NOT heal: the torn state resolves itself inside the grace
    assert(!StoreOps.recoverInterrupted(spark, path, graceMs = 2000L))
    compactor.join()
    assert(fs.exists(dst) && !fs.exists(prev))

    // a state that STAYS torn for the whole grace window is a crash: heal
    assert(fs.rename(dst, prev))
    assert(StoreOps.recoverInterrupted(spark, path, StoreOps.ReadHealGraceMs))
    assert(fs.exists(dst) && !fs.exists(prev))
    assert(MetadataStore.lastSlot(spark, path).contains(7L))
  }

  test("version travel: snapshotAt replays the store as of any version") {
    val path = Files.createTempDirectory("graft_meta_tt").toString + "/kv"
    MetadataStore.updateLastSlot(spark, path, 100L)
    val v1 = MetadataStore.snapshot(spark, path)
      .select("updated_at").collect()(0).getLong(0)
    MetadataStore.updateLastSlot(spark, path, 250L)
    MetadataStore.set(spark, path, "warehouse_type", "orc")
    // as-of v1: only the first write is visible
    val at1 = MetadataStore.snapshotAt(spark, path, v1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(at1 == Map("last_confirmed_slot" -> "100"))
    // as-of the far future == current snapshot
    val now = MetadataStore.snapshotAt(spark, path, Long.MaxValue)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(now == Map("last_confirmed_slot" -> "250", "warehouse_type" -> "orc"))
    // before any write: empty, not an error
    assert(MetadataStore.snapshotAt(spark, path, 0L).count() == 0)
  }

  test("same-millisecond updates never resolve to the stale write") {
    // "9" > "10" lexically: with a wall-clock-only version, two writes
    // inside one millisecond would tie on updated_at and Upsert's
    // descending string tiebreak on value would snapshot 9 — the
    // monotonic version bump makes write order win instead.
    val path = Files.createTempDirectory("graft_meta_mono").toString + "/kv"
    MetadataStore.updateLastSlot(spark, path, 9L)
    MetadataStore.updateLastSlot(spark, path, 10L)
    assert(MetadataStore.lastSlot(spark, path).contains(10L))
  }
}
