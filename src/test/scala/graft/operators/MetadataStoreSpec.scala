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
    // snapshot resolves to the newest
    Thread.sleep(2)
    MetadataStore.updateLastSlot(spark, path, 250L)
    Thread.sleep(2)
    MetadataStore.set(spark, path, "warehouse_type", "parquet")
    assert(MetadataStore.lastSlot(spark, path).contains(250L))
    assert(MetadataStore.get(spark, path, "warehouse_type").contains("parquet"))
    assert(MetadataStore.snapshot(spark, path).count() == 2) // 2 live keys
  }
}
