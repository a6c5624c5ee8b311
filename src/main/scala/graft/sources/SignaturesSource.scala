package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 address-history source — the LIVE form of the S4
  * keyset-paged scan (`getSignaturesForAddress`, rpc.rs:162-187),
  * through Spark: `before`/`until` ARE the keyset cursor, and the
  * reader walks pages of `pageSize` until a short page ends the
  * history (the reference exposes exactly these three knobs; the loop
  * is what any consumer of the endpoint writes around them).
  *
  * Partitioning axis: the ADDRESS. One address's history is inherently
  * sequential — each page's cursor is the previous page's last
  * signature, the same reason keyset pagination in the warehouse (T5)
  * cannot be split — so parallelism comes from scanning many addresses
  * at once: one input partition per address, the per-partition
  * rate/retry envelope identical to [[BlockSource]]'s (every page
  * attempt takes a limiter permit; permanent RPC errors fail fast).
  * At cluster scale a million-wallet enrichment fans out one task per
  * wallet with the req/s ceiling enforced per executor-partition,
  * exactly the reference's connection-per-worker scheme.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.SignaturesSource")
  *     .option("endpoint", url)
  *     .option("addresses", "walletA,walletB")
  *     .option("pageSize", 1000)          // RPC `limit` per page
  *     .option("until", sigLowWaterMark)  // optional keyset floor
  *     .load()   // → (address STRING, signature STRING, entry_json STRING)
  * }}}
  */
class SignaturesSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SignaturesSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SignaturesTable
  override def supportsExternalMetadata(): Boolean = false
}

object SignaturesSource {
  val schema: StructType = StructType(Seq(
    StructField("address", StringType, nullable = false),
    StructField("signature", StringType, nullable = false),
    StructField("entry_json", StringType)))
}

private[sources] class SignaturesTable extends Table with SupportsRead {
  override def name(): String = "graft_signatures"
  override def schema(): StructType = SignaturesSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val endpoint = Option(options.get("endpoint")).getOrElse(
      throw new IllegalArgumentException(
        "SignaturesSource needs an `endpoint` option (JSON-RPC URL)"))
    val addresses = Option(options.get("addresses")).map(_.split(",").toSeq
      .map(_.trim).filter(_.nonEmpty)).filter(_.nonEmpty).getOrElse(
      throw new IllegalArgumentException(
        "SignaturesSource needs a non-empty `addresses` option"))
    val scan = new SignaturesScan(
      addresses,
      options.getLong("pageSize", 1000L),
      Option(options.get("until")),
      options.getLong("maxPages", 0L),
      FetchPolicy(
        options.getDouble("ratePerSec", 0.0),
        options.getInt("maxRetries", 3),
        options.getLong("retryBaseMs", 10L),
        Some(endpoint)))
    () => scan
  }
}

private[sources] case class AddressPartition(address: String) extends InputPartition

private[sources] class SignaturesScan(addresses: Seq[String], pageSize: Long,
    until: Option[String], maxPages: Long, policy: FetchPolicy)
    extends Scan with Batch {
  override def readSchema(): StructType = SignaturesSource.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_signatures addresses=${addresses.size} pageSize=$pageSize"
  override def planInputPartitions(): Array[InputPartition] =
    addresses.map(AddressPartition(_): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new SignaturesReaderFactory(pageSize, until, maxPages, policy)
}

private[sources] class SignaturesReaderFactory(pageSize: Long,
    until: Option[String], maxPages: Long, policy: FetchPolicy)
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val AddressPartition(address) = p.asInstanceOf[AddressPartition]
    new PartitionReader[InternalRow] {
      private val limiter = new RateLimiter(policy.ratePerSec)
      private val client = LiveClients.forEndpoint(policy.endpoint.get)
      private val mapper = new com.fasterxml.jackson.databind.ObjectMapper

      /** Lazily walked keyset pages: each `next()` drains the current
        * page before fetching the following one behind the previous
        * page's LAST signature — memory is one page, never the
        * history. The loop ends on a short (or empty) page, the keyset
        * convention; a page entry without a `signature` field cannot
        * advance the cursor and fails LOUDLY (silently stopping would
        * truncate the history; reusing the old cursor would loop
        * forever re-fetching the same page). */
      private var cursor: Option[String] = None
      private var page: Iterator[String] = Iterator.empty
      private var lastSig: String = _
      private var pagesFetched = 0L
      private var exhausted = false
      private var current: (String, String) = _ // (signature, entry_json)

      private def fetchNextPage(): Unit = {
        if (maxPages > 0 && pagesFetched >= maxPages) { exhausted = true; return }
        val entries = FetchRetry.withRetry(policy.maxRetries, policy.retryBaseMs) {
          limiter.acquire()
          client.getSignaturesForAddress(address,
            limit = Some(pageSize), before = cursor, until = until)
        }
        pagesFetched += 1
        if (entries.size < pageSize) exhausted = true // short page = history end
        page = entries.iterator
      }

      override def next(): Boolean = {
        while (!page.hasNext && !exhausted) fetchNextPage()
        if (!page.hasNext) return false
        val entry = page.next()
        val sigNode = mapper.readTree(entry).get("signature")
        require(sigNode != null && sigNode.isTextual,
          s"getSignaturesForAddress($address) page entry carries no " +
            s"signature — cannot advance the keyset cursor: $entry")
        lastSig = sigNode.asText()
        if (!page.hasNext) cursor = Some(lastSig) // next page goes behind it
        current = (lastSig, entry)
        true
      }
      override def get(): InternalRow = InternalRow(
        UTF8String.fromString(address),
        UTF8String.fromString(current._1),
        UTF8String.fromString(current._2))
      override def close(): Unit = ()
    }
  }
}

/** DataSource V2 program-accounts source — the LIVE form of the S5
  * scan (`getProgramAccounts`, rpc.rs:189-208) through Spark. The RPC
  * returns a program's full account set in one response (the reference
  * exposes no pagination for it), so the partitioning axis is again
  * the key list: one partition per program id, `filtersJson` passed
  * through verbatim exactly as the reference passes its opaque Value.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.ProgramAccountsSource")
  *     .option("endpoint", url)
  *     .option("programIds", "Tokenkeg...,prog2")
  *     .option("filtersJson", """[{"dataSize":165}]""")  // optional
  *     .load()                 // → (program_id STRING, account_json STRING)
  * }}}
  */
class ProgramAccountsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ProgramAccountsSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ProgramAccountsTable
  override def supportsExternalMetadata(): Boolean = false
}

object ProgramAccountsSource {
  val schema: StructType = StructType(Seq(
    StructField("program_id", StringType, nullable = false),
    StructField("account_json", StringType)))
}

private[sources] class ProgramAccountsTable extends Table with SupportsRead {
  override def name(): String = "graft_program_accounts"
  override def schema(): StructType = ProgramAccountsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val endpoint = Option(options.get("endpoint")).getOrElse(
      throw new IllegalArgumentException(
        "ProgramAccountsSource needs an `endpoint` option (JSON-RPC URL)"))
    val programs = Option(options.get("programIds")).map(_.split(",").toSeq
      .map(_.trim).filter(_.nonEmpty)).filter(_.nonEmpty).getOrElse(
      throw new IllegalArgumentException(
        "ProgramAccountsSource needs a non-empty `programIds` option"))
    val scan = new ProgramAccountsScan(
      programs,
      Option(options.get("filtersJson")),
      FetchPolicy(
        options.getDouble("ratePerSec", 0.0),
        options.getInt("maxRetries", 3),
        options.getLong("retryBaseMs", 10L),
        Some(endpoint)))
    () => scan
  }
}

private[sources] case class ProgramPartition(programId: String) extends InputPartition

private[sources] class ProgramAccountsScan(programs: Seq[String],
    filtersJson: Option[String], policy: FetchPolicy) extends Scan with Batch {
  override def readSchema(): StructType = ProgramAccountsSource.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_program_accounts programs=${programs.size}"
  override def planInputPartitions(): Array[InputPartition] =
    programs.map(ProgramPartition(_): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new ProgramAccountsReaderFactory(filtersJson, policy)
}

private[sources] class ProgramAccountsReaderFactory(
    filtersJson: Option[String], policy: FetchPolicy)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val ProgramPartition(programId) = p.asInstanceOf[ProgramPartition]
    new PartitionReader[InternalRow] {
      private val limiter = new RateLimiter(policy.ratePerSec)
      private lazy val accounts = FetchRetry.withRetry(
        policy.maxRetries, policy.retryBaseMs) {
        limiter.acquire()
        LiveClients.forEndpoint(policy.endpoint.get)
          .getProgramAccounts(programId, filtersJson)
      }.iterator
      private var current: String = _
      override def next(): Boolean =
        if (accounts.hasNext) { current = accounts.next(); true } else false
      override def get(): InternalRow = InternalRow(
        UTF8String.fromString(programId),
        UTF8String.fromString(current))
      override def close(): Unit = ()
    }
  }
}
