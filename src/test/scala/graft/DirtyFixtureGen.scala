package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev harness: derive a DIRTY copy of a testdata scale factor — the
  * clean driver tables plus planted rows carrying exactly the hazards
  * the clean fixture can never exercise (NULL group/join/sort keys,
  * whitespace runs, CRLF/Unicode line terminators, missing JSON keys,
  * empty and NULL text) — so the full differential surface can be run
  * against it end-to-end:
  *
  * {{{
  * sbt 'Test/runMain graft.DirtyFixtureGen /root/testdata/sf0.001 /tmp/dirty_sf'
  * sbt 'runMain graft.Verify /tmp/dirty_sf /tmp/verify_dirty'
  * python3 tools/check_oracle.py /tmp/dirty_sf /tmp/verify_dirty
  * }}}
  *
  * Every NULL-key set-algebra bug (NOT IN vs left_anti), null-ordering
  * slip at a LIMIT boundary, and regex-dialect divergence the clean
  * fixture masks turns into a hard FAIL here. Rows are fixed literals —
  * the fixture is bit-reproducible run over run.
  *
  * Planted-row contract notes (what is deliberately NOT planted):
  *  - `props` is valid-JSON-or-NULL: the engine's parse layer emits only
  *    parseable payloads (ingest/Parse.scala), and DuckDB's strict
  *    `json_extract_string` ERRORS on malformed JSON while Spark's
  *    `get_json_object` returns NULL — malformed JSON is an ingest-layer
  *    concern (covered by ParseSpec), not a query-layer one.
  *  - `embedding` vectors are non-NULL and finite: the vector surface's
  *    contract is normalize-at-ingest (Similarity.scala scaladoc); NaN
  *    poison for the streaming vector paths is planted by the stream
  *    harness itself (StreamQueries).
  */
object DirtyFixtureGen {

  /** Dirty rows are built with string-typed ts/date columns and cast to
    * whatever the base parquet read produced (TIMESTAMP_NTZ today; the
    * cast is identity-safe under the pinned UTC session either way). */
  private def withPlanted(spark: SparkSession, base: DataFrame,
      schema: StructType, rows: Seq[Row]): DataFrame = {
    val dirty = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)
    base.unionByName(dirty.select(
      base.schema.fields.map(f => col(f.name).cast(f.dataType)).toIndexedSeq: _*))
  }

  /** Write as a SINGLE parquet file named `<table>.parquet` (the driver
    * layout: DuckDB's differ opens the path as one file, not a dir). */
  private def emit(outDir: String, name: String, df: DataFrame): Unit = {
    val tmp = Paths.get(outDir, s"_$name")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    // Files.list/walk hold a directory handle until closed — leak one
    // per emitted table otherwise
    val part = scala.util.Using.resource(Files.list(tmp)) {
      _.filter(p => p.toString.endsWith(".parquet")).findFirst.get
    }
    Files.move(part, Paths.get(outDir, s"$name.parquet"), StandardCopyOption.REPLACE_EXISTING)
    scala.util.Using.resource(Files.walk(tmp)) {
      _.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => Files.deleteIfExists(p))
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir) = args.take(2)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))

    // tables with no planted rows: byte-copy the clean single file
    for (t <- Seq("region", "nation", "supplier", "part", "embeddings"))
      Files.copy(Paths.get(s"$srcDir/$t.parquet"), Paths.get(s"$outDir/$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING)

    def base(name: String) = spark.read.parquet(s"$srcDir/$name.parquet")

    // ---- events: NULL user/type/props/value/ts + JSON edge payloads ----
    val evSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", StringType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val L = null.asInstanceOf[java.lang.Long] // typed NULLs for Row fields
    val D = null.asInstanceOf[java.lang.Double]
    val evRows = Seq(
      // NULL user_id across the churn windows: prev-week-only (churned),
      // cur-week-only (new), and both (retained) — left_anti/left_semi
      // vs the oracle's EXISTS forms must agree on every one
      Row(100000L, "2024-01-03 10:00:00", L, "purchase", 42.5, """{"k": 7}"""),
      Row(100001L, "2024-01-12 11:00:00", L, "purchase", 17.25, """{"k": 3}"""),
      Row(100002L, "2024-01-05 09:30:00", L, "error", 5.0, """{"k": 1}"""),
      Row(100003L, "2024-01-13 14:00:00", L, "error", 6.0, """{"k": 2}"""),
      // NULL event_type: a real NULL group through every groupBy/orderBy
      Row(100010L, "2024-01-02 08:00:00", java.lang.Long.valueOf(3L), null, 11.0, """{"k": 4}"""),
      Row(100011L, "2024-01-08 18:45:00", java.lang.Long.valueOf(5L), null, 12.5, """{"k": 9}"""),
      Row(100012L, "2024-01-14 22:10:00", java.lang.Long.valueOf(7L), null, 1.75, """{"k": 11}"""),
      Row(100013L, "2024-01-15 03:20:00", java.lang.Long.valueOf(9L), null, 8.0, """{"k": 13}"""),
      // JSON edges: NULL props, empty object (missing key), string-typed k
      Row(100020L, "2024-01-10 12:00:00", java.lang.Long.valueOf(2L), "purchase", 30.0, null),
      Row(100021L, "2024-01-10 13:00:00", java.lang.Long.valueOf(2L), "click", 3.0, "{}"),
      Row(100022L, "2024-01-11 07:15:00", java.lang.Long.valueOf(4L), "purchase", 9.5, """{"k": "5"}"""),
      // NULL value and NULL ts (timeless rows must fail every window
      // predicate identically on both engines)
      Row(100030L, "2024-01-09 16:40:00", java.lang.Long.valueOf(6L), "view", D, """{"k": 21}"""),
      Row(100031L, null, java.lang.Long.valueOf(8L), "purchase", 55.0, """{"k": 22}"""),
      Row(100032L, null, L, null, D, null))
    emit(outDir, "events", withPlanted(spark, base("events"), evSchema, evRows))

    // ---- documents: normalization dups, line terminators, empty/NULL ----
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val docRows = Seq(
      // whitespace-run + trim duplicates: all three normalize equal —
      // exact dedup must collapse them on BOTH engines (the bug class
      // where one side's regex dialect silently never matches)
      Row(100000L, "spark  query\tengine   test", "en", "srcD", java.lang.Long.valueOf(26L)),
      Row(100001L, "spark query engine test", "en", "srcD", java.lang.Long.valueOf(23L)),
      Row(100002L, " spark query engine test ", "en", "srcD", java.lang.Long.valueOf(25L)),
      // CRLF + NEL/LS/PS: the fingerprint contract skips ALL Unicode
      // line terminators; a '.'-dialect divergence reds this row
      Row(100003L, "line one\r\nline two\r\nline three", "en", "srcD", java.lang.Long.valueOf(30L)),
      Row(100004L, "ab c d", "xx", "srcD", java.lang.Long.valueOf(7L)),
      // empty text, NULL text (+ NULL n_chars), stopword-only text with
      // NULL lang/source (NULL group keys for the per-lang/source rollups)
      Row(100005L, "", "en", "srcD", java.lang.Long.valueOf(0L)),
      Row(100006L, null, "en", "srcD", L),
      Row(100007L, "the the the and and of", null, null, java.lang.Long.valueOf(22L)))
    emit(outDir, "documents", withPlanted(spark, base("documents"), docSchema, docRows))

    // ---- orders / customer / lineitem: NULL join + group + sort keys ----
    val ordSchema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", StringType), StructField("o_orderpriority", StringType)))
    val ordRows = Seq(
      // NULL o_custkey with an OPEN status: the NOT-IN killer — one such
      // row makes any null-unsafe anti-join oracle zero out engine-wide
      Row(9000001L, L, "O", 123.45, "1996-06-01 00:00:00", "1-URGENT"),
      Row(9000002L, L, "F", 50.0, "1994-03-15 00:00:00", "3-MEDIUM"),
      Row(9000003L, java.lang.Long.valueOf(7L), null, D, null, null))
    emit(outDir, "orders", withPlanted(spark, base("orders"), ordSchema, ordRows))

    val custSchema = StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))
    val I = null.asInstanceOf[java.lang.Integer]
    val custRows = Seq(
      Row(L, "Customer#null-key", java.lang.Integer.valueOf(3), 0.0, "BUILDING"),
      Row(9000002L, "Customer#null-nation", I, 10.5, "MACHINERY"))
    emit(outDir, "customer", withPlanted(spark, base("customer"), custSchema, custRows))

    val liSchema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
      StructField("l_shipdate", StringType)))
    val liRows = Seq(
      Row(9000001L, L, L, java.lang.Integer.valueOf(1), D, 100.0, 0.05, 0.02,
        null, "O", "1996-06-10 00:00:00"))
    emit(outDir, "lineitem", withPlanted(spark, base("lineitem"), liSchema, liRows))

    spark.stop()
  }
}
