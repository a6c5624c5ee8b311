package graft.sources

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkSpec

/** The S4/S5 LIVE scans end-to-end through Spark: keyset pagination
  * (`before`/`until`, rpc.rs:162-187) and program-accounts fan-out
  * (rpc.rs:189-208) against a scripted local JSON-RPC stub — proving
  * page walking, the short/empty-page stop, per-address partitioning,
  * retry healing, and the loud no-signature failure, all through a
  * `spark.read.format(...)` DataFrame. */
class SignaturesSourceSpec extends SparkSpec {

  /** Newest-first synthetic history per address (the RPC's order). */
  private def history(addr: String, n: Int): Seq[String] =
    (n - 1 to 0 by -1).map(i => f"s${addr}_$i%02d")

  private def entry(sig: String): String =
    s"""{"signature":"$sig","slot":${sig.drop(1).hashCode.abs % 1000},"blockTime":1704067200}"""

  /** Stub serving getSignaturesForAddress with real keyset semantics
    * (before = strictly older than; until = strictly newer than) and
    * getProgramAccounts with filter-sensitive results. `flake` keys
    * get one 429 before succeeding. */
  private def withStub[T](histories: Map[String, Int],
      flake: Set[String] = Set.empty)(body: String => T): (T, Map[String, Int]) = {
    System.setProperty("sun.net.httpserver.nodelay", "true")
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val calls = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]
    val attempts = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]
    server.createContext("/", { (ex: HttpExchange) =>
      val req = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val method = """"method":"(\w+)"""".r.findFirstMatchIn(req).get.group(1)
      val key = """"params":\["([^"]+)"""".r.findFirstMatchIn(req).get.group(1)
      val before = """"before":"([^"]+)"""".r.findFirstMatchIn(req).map(_.group(1))
      val until = """"until":"([^"]+)"""".r.findFirstMatchIn(req).map(_.group(1))
      val limit = """"limit":(\d+)""".r.findFirstMatchIn(req).map(_.group(1).toInt)
      val (status, resp) = method match {
        case "getSignaturesForAddress" =>
          val attemptKey = s"$key:${before.getOrElse("-")}"
          val a = attempts.computeIfAbsent(attemptKey, _ => new AtomicInteger)
            .getAndIncrement()
          if (flake.contains(key) && before.isEmpty && a == 0)
            (429, """{"error":"slow down"}""")
          else {
            calls.computeIfAbsent(key, _ => new AtomicInteger).incrementAndGet()
            val full = history(key, histories.getOrElse(key, 0))
            val afterBefore = before match {
              case Some(b) => full.dropWhile(_ != b).drop(1) // strictly older
              case None => full
            }
            val windowed = until match {
              case Some(u) => afterBefore.takeWhile(_ != u) // strictly newer
              case None => afterBefore
            }
            val pageEntries = windowed.take(limit.getOrElse(1000))
            (200, s"""{"jsonrpc":"2.0","id":1,"result":[${
              pageEntries.map(entry).mkString(",")}]}""")
          }
        case "getProgramAccounts" =>
          calls.computeIfAbsent(key, _ => new AtomicInteger).incrementAndGet()
          val withFilters = req.contains(""""filters":""")
          val n = if (key == "progP") (if (withFilters) 2 else 3) else 0
          (200, s"""{"jsonrpc":"2.0","id":1,"result":[${
            (0 until n).map(i =>
              s"""{"pubkey":"acc_${key}_$i","account":{"lamports":$i}}""")
              .mkString(",")}]}""")
        case other => (500, s"""{"error":"unexpected method $other"}""")
      }
      val bytes = resp.getBytes("UTF-8")
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    val r =
      try body(s"http://127.0.0.1:${server.getAddress.getPort}/")
      finally server.stop(0)
    (r, {
      import scala.jdk.CollectionConverters._
      calls.asScala.map { case (k, v) => k -> v.get() }.toMap
    })
  }

  test("keyset pagination walks an address history page by page, " +
      "one partition per address, 429 healed by the reader's retry") {
    val (rows, calls) = withStub(
      Map("walletA" -> 25, "walletB" -> 7), flake = Set("walletA")) { url =>
      val df = spark.read.format("graft.sources.SignaturesSource")
        .option("endpoint", url)
        .option("addresses", "walletA,walletB")
        .option("pageSize", 10)
        .option("retryBaseMs", 1)
        .load()
      assert(df.rdd.getNumPartitions == 2) // the address IS the partition
      df.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    }
    val byAddr = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    // full histories, every page stitched, nothing duplicated
    assert(byAddr("walletA") == history("walletA", 25))
    assert(byAddr("walletB") == history("walletB", 7))
    // page math: 25 @ 10 → 3 pages (last short); 7 @ 10 → 1 short page.
    // The 429 burned an attempt but never produced a served page.
    assert(calls("walletA") == 3 && calls("walletB") == 1)
  }

  test("until is the keyset floor; a full last page stops on the next " +
      "empty page") {
    // 25-entry history, until = the 5th-oldest → 20 newest entries:
    // exactly 2 full pages of 10, so the reader must fetch a 3rd,
    // EMPTY page to learn the history ended — the empty-page stop.
    val (rows, calls) = withStub(Map("walletA" -> 25)) { url =>
      spark.read.format("graft.sources.SignaturesSource")
        .option("endpoint", url)
        .option("addresses", "walletA")
        .option("pageSize", 10)
        .option("until", "swalletA_04")
        .load().collect().map(_.getString(1)).toSeq
    }
    assert(rows == history("walletA", 25).take(20))
    assert(calls("walletA") == 3)
  }

  test("a page entry without a signature fails loudly instead of " +
      "truncating or looping") {
    val err = intercept[org.apache.spark.SparkException] {
      withStub(Map.empty) { url =>
        // stub knows no such address → serve a malformed entry by hand
        val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
        server.createContext("/", { (ex: HttpExchange) =>
          val resp = """{"jsonrpc":"2.0","id":1,"result":[{"slot":1}]}"""
          val b = resp.getBytes("UTF-8")
          ex.sendResponseHeaders(200, b.length)
          ex.getResponseBody.write(b); ex.close()
        })
        server.start()
        try spark.read.format("graft.sources.SignaturesSource")
          .option("endpoint", s"http://127.0.0.1:${server.getAddress.getPort}/")
          .option("addresses", "walletX").option("pageSize", 10)
          .load().count()
        finally server.stop(0)
      }
    }
    assert(err.getMessage.contains("signature") ||
      Option(err.getCause).exists(_.getMessage.contains("signature")))
  }

  test("program accounts fan out one partition per program; filters " +
      "pass through verbatim (rpc.rs:189-208)") {
    val ((unfiltered, filtered), calls) = withStub(Map.empty) { url =>
      def read(filters: Option[String]) = {
        val r = spark.read.format("graft.sources.ProgramAccountsSource")
          .option("endpoint", url)
          .option("programIds", "progP,progQ")
        filters.foreach(f => r.option("filtersJson", f))
        r.load().collect().map(x => (x.getString(0), x.getString(1))).toSeq
      }
      (read(None), read(Some("""[{"dataSize":165}]""")))
    }
    // progP: 3 accounts bare, 2 with the filter applied server-side;
    // progQ: none — an empty program yields zero rows, not a failure
    assert(unfiltered.count(_._1 == "progP") == 3)
    assert(unfiltered.count(_._1 == "progQ") == 0)
    assert(filtered.count(_._1 == "progP") == 2)
    assert(unfiltered.forall { case (p, j) => !j.contains("signature") &&
      j.contains(s"acc_${p}_") })
    assert(calls("progP") == 2 && calls("progQ") == 2)
  }
}
