package graft.ext

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star): media as opaque `binary`
  * columns with typed metadata structs, plus a partition-parallel decode /
  * feature-extract stage.
  *
  * The actual codecs (image/audio libs) are not in this container, so the
  * decode step is a clearly-marked deterministic fake
  * ([[Multimodal.fakeDecode]]); the Spark-side contract — schema, batch
  * shape, per-partition execution, metadata propagation — is real and
  * tested (MultimodalSpec). Swap `fakeDecode` for a real codec and
  * nothing else changes.
  */
object Multimodal extends QueryModule {

  /** A decoded media record: what a real image/audio decoder would emit. */
  final case class MediaFeature(
      doc_id: Long, mime: String, payload_len: Long,
      width: Int, height: Int, feature_hash: String)

  /** STUB: deterministic fake decode standing in for a real codec.
    * A production decoder would parse `payload` (e.g. PNG/WAV bytes) and
    * emit real dimensions/features; this derives them deterministically
    * from the bytes so the pipeline is testable end-to-end. */
  def fakeDecode(docId: Long, mime: String, payload: Array[Byte]): MediaFeature = {
    val sha = java.security.MessageDigest.getInstance("SHA-256").digest(payload)
    val hex = sha.map("%02x".format(_)).mkString
    MediaFeature(docId, mime, payload.length.toLong,
      width = 16 + (Math.floorMod(docId, 64L) * 16).toInt,
      height = 16 + (Math.floorMod(docId, 48L) * 16).toInt,
      feature_hash = hex)
  }

  /** The partition-parallel decode stage: binary column in, typed feature
    * rows out. `mapPartitions` keeps per-partition batching (the shape a
    * vectorized/Pandas-style decode UDF needs) without any driver
    * collect. Widened first: decode is the one stage whose per-row cost
    * (a real codec) dwarfs a shuffle of its input, so a narrow scan —
    * 10k videos in one split on a 1000-core cluster — must not serialize
    * it; on an already-wide scan the widen is a no-op. */
  def decodeMedia(media: DataFrame): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    graft.Tables.widen(media.select(col("doc_id").cast("long"), col("mime"), col("payload")))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, mime, payload) => fakeDecode(id, mime, payload) })
  }

  /** One sampled frame of a media payload. */
  final case class Frame(doc_id: Long, frame_idx: Int, offset: Long,
      frame_len: Long, frame_hash: String)

  /** STUB resize: a real impl rescales decoded pixels; this rewrites the
    * metadata contract (target dims + a content hash salted by them) so
    * the schema/propagation path is real. */
  def resize(feats: Dataset[MediaFeature], w: Int, h: Int): Dataset[MediaFeature] = {
    val spark = feats.sparkSession
    import spark.implicits._
    feats.mapPartitions(_.map { f =>
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"${f.feature_hash}:${w}x$h".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      f.copy(width = w, height = h, feature_hash = sha)
    })
  }

  /** STUB frame sampling: emits `n` evenly-spaced "frames" per payload
    * (byte slices standing in for decoded video frames) — the 1→N
    * partition-parallel fan-out stage (flatMap, no shuffle). */
  def frameSample(media: DataFrame, n: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val len = payload.length
        (0 until math.min(n, math.max(len, 1))).iterator.map { i =>
          val off = (len.toLong * i) / n
          val slice = payload.slice(off.toInt, math.min(off.toInt + 64, len))
          val sha = java.security.MessageDigest.getInstance("SHA-256")
            .digest(slice).map("%02x".format(_)).mkString
          Frame(id, i, off, slice.length.toLong, sha)
        }
      }
  }

  /** documents → opaque media table: payload = utf-8 bytes as the binary
    * stand-in, mime assigned deterministically. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, "image/png")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"),
      col("text").cast("binary").as("payload"))

  override val defs: Seq[(String, Q)] = Seq(

    // Binary-column metadata extraction — expression-only path (byte
    // length + content digest + mime classification), oracle-checkable.
    "mm_binary_meta" -> Q(
      (s, dir) =>
        mediaTable(s, dir)
          .select(
            col("doc_id"), col("mime"),
            octet_length(col("payload")).cast("long").as("payload_len"),
            sha2(col("payload"), 256).as("payload_sha"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             | CASE WHEN doc_id % 3 = 0 THEN 'image/png'
             |      WHEN doc_id % 3 = 1 THEN 'audio/wav'
             |      ELSE 'video/mp4' END AS mime,
             | octet_length(text::BLOB) AS payload_len,
             | sha256(text) AS payload_sha
             |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "multimodal binary column + typed metadata (north-star)"),

    // Decode / feature-extract over partitions (fake codec, real
    // plumbing), aggregated per mime so the output is compact.
    "mm_decode_features" -> Q(
      (s, dir) =>
        decodeMedia(mediaTable(s, dir)).toDF()
          .groupBy(col("mime"))
          .agg(
            count(lit(1)).as("n_media"),
            sum(col("payload_len")).as("total_bytes"),
            countDistinct(col("feature_hash")).as("uniq_features"),
            max(col("width")).cast("long").as("max_width"),
            max(col("height")).cast("long").as("max_height"))
          .orderBy(col("mime")),
      Some("""SELECT
             | CASE WHEN doc_id % 3 = 0 THEN 'image/png'
             |      WHEN doc_id % 3 = 1 THEN 'audio/wav'
             |      ELSE 'video/mp4' END AS mime,
             | count(*) AS n_media,
             | CAST(sum(octet_length(text::BLOB)) AS BIGINT) AS total_bytes,
             | count(DISTINCT sha256(text)) AS uniq_features,
             | CAST(max(16 + (doc_id % 64) * 16) AS BIGINT) AS max_width,
             | CAST(max(16 + (doc_id % 48) * 16) AS BIGINT) AS max_height
             |FROM documents GROUP BY 1 ORDER BY mime""".stripMargin),
      doc = "partition-parallel media decode stage (stubbed codec)"),

    // Frame sampling as a query: the 1→N partition-parallel fan-out
    // ([[frameSample]]: 8 evenly-spaced byte-slice "frames" per payload,
    // flatMap, no shuffle — the video-decode shape) rolled up per doc.
    // The oracle replays the byte arithmetic and slice digests exactly;
    // it slices VARCHAR where Spark slices payload BYTES, which agree
    // because this corpus is pure ASCII (octet_length == length,
    // asserted by the mm_binary_meta payload_len row already) — a real
    // deployment keeps the binary side as the source of truth.
    "mm_frame_sample" -> Q(
      (s, dir) =>
        frameSample(mediaTable(s, dir), 8).toDF()
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_frames"),
            countDistinct(col("frame_hash")).as("uniq_frames"),
            sum(col("frame_len")).as("bytes_sampled"),
            max(col("offset")).as("last_off"))
          .orderBy(col("doc_id")),
      Some("""WITH m AS (
             |  SELECT doc_id, text AS t, CAST(octet_length(text::BLOB) AS BIGINT) AS len
             |  FROM documents),
             |f AS (
             |  SELECT doc_id,
             |    (len * i) // 8 AS off,
             |    least((len * i) // 8 + 64, len) - (len * i) // 8 AS flen,
             |    sha256(substring(t, CAST((len * i) // 8 AS INTEGER) + 1,
             |      CAST(least((len * i) // 8 + 64, len) - (len * i) // 8 AS INTEGER))) AS fh
             |  FROM (SELECT doc_id, t, len,
             |          unnest(generate_series(0, least(8, greatest(len, 1)) - 1)) AS i
             |        FROM m))
             |SELECT doc_id, count(*) AS n_frames,
             |  count(DISTINCT fh) AS uniq_frames,
             |  CAST(sum(flen) AS BIGINT) AS bytes_sampled,
             |  max(off) AS last_off
             |FROM f GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "per-payload frame sampling (8 byte-slice frames), per-doc rollup"),
  )
}
