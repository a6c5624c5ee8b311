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
    assert(spark.read.parquet(path).count() == 2) // one row per live key
    assert(MetadataStore.lastSlot(spark, path).contains(500L))
    assert(MetadataStore.get(spark, path, "warehouse_type").contains("orc"))
    // post-compact writes keep layering normally
    MetadataStore.updateLastSlot(spark, path, 600L)
    assert(MetadataStore.lastSlot(spark, path).contains(600L))
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
