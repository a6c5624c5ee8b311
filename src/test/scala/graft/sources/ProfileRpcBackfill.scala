package graft.sources

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicLong

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.ingest.Backfill

/** 100× rehearsal for the LIVE-RPC backfill path (not a unit test — run
  * with `Test/runMain graft.sources.ProfileRpcBackfill`): 20,000 slots
  * fetched over real HTTP against a local stub, through
  * `RpcClient.fetcher` + the ETL_BACKFILL_CHUNK_SIZE partitioning, with
  * an injected first-attempt failure on every 13th slot — measuring
  * end-to-end blocks/s, the retry amplification, and that the chunked
  * partition plan keeps per-task work bounded. The declared
  * RpcClientSpec range is 20 slots; this is the same path at 1000×.
  *
  * Scale context (BASELINE.md): the reference's ingest ceiling is its
  * 50 req/s rate limit — PER WORKER here, so the cluster-wide ceiling
  * is workers × 50; this rehearsal runs unthrottled to measure the
  * ENGINE's own overhead (HTTP + JSON + parse + partitioned write),
  * which must not be the bottleneck under any real rate limit.
  */
object ProfileRpcBackfill {
  def main(args: Array[String]): Unit = {
    val slots = args.headOption.map(_.toLong).getOrElse(20000L)
    // the JDK stub server leaves Nagle ON; with the client's delayed
    // ACKs that costs ~40ms quanta PER REQUEST on loopback — measured
    // 156 blocks/s with it, 1,770 without. The property must be set
    // before the first server is created.
    System.setProperty("sun.net.httpserver.nodelay", "true")
    val requests = new AtomicLong
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // server.stop does NOT shut down a caller-provided executor, and
    // non-daemon pool threads would pin the JVM open after main returns
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      args.lift(1).map(_.toInt).getOrElse(48))
    server.setExecutor(pool)
    server.createContext("/", { (ex: HttpExchange) =>
      val req = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val slot = """"params":\[(\d+)""".r.findFirstMatchIn(req).get.group(1).toLong
      val n = requests.incrementAndGet()
      val (status, body) =
        if (slot % 13 == 0 && !seen.containsKey(slot)) {
          seen.put(slot, java.lang.Boolean.TRUE)
          (429, "busy") // first attempt on every 13th slot fails
        } else Backfill.syntheticBlock(slot) match {
          case Some(b) => (200, s"""{"jsonrpc":"2.0","id":1,"result":$b}""")
          case None => (200, """{"jsonrpc":"2.0","id":1,"result":null}""")
        }
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes); ex.close()
    })
    server.start()
    val url = s"http://127.0.0.1:${server.getAddress.getPort}/"

    val spark = graft.LocalSession.build("profile-rpc-backfill")
    val out = java.nio.file.Files.createTempDirectory("rpc100x").toString + "/sink"
    val t0 = System.nanoTime()
    Backfill.run(spark, 0L, slots, workers = 8, out,
      fetcher = RpcClient.fetcher(RpcConfig(url, maxRetries = 3,
        ratePerSec = 0.0, retryBaseMs = 1L)),
      chunkSize = Some(500L))
    val wall = (System.nanoTime() - t0) / 1e9
    val events = spark.read.parquet(out).count()
    val nParts = ((slots + 499) / 500).max(8)
    println(f"[profile-rpc] slots=$slots wall=$wall%.1fs " +
      f"blocks_per_sec=${slots / wall}%.0f events=$events " +
      f"http_requests=${requests.get} retried=${seen.size} partitions=$nParts")
    spark.stop()
    server.stop(0)
    pool.shutdownNow()
    ()
  }

  private val seen = new java.util.concurrent.ConcurrentHashMap[Long, java.lang.Boolean]
}
