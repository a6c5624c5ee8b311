package graft.ext

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star): media as opaque `binary`
  * columns with typed metadata structs, plus a partition-parallel decode /
  * feature-extract stage.
  *
  * The decode step is a REAL container-header parser: byte-level PNG
  * (signature + IHDR), JFIF/JPEG (segment walk to SOF), RIFF/WAVE
  * (fmt chunk), and ISO-BMFF/MP4 (top-level box walk to moov/mvhd)
  * readers pull width/height (or sample-rate/channels, or
  * timescale/duration) and the post-header content stream straight
  * from the binary column — no
  * claimed-mime shortcuts, detection is by magic bytes. Full pixel/PCM
  * decoding would need codec libraries this container doesn't ship, so
  * payloads carry spec-correct HEADERS over a raw content body
  * ([[Multimodal.encodedMediaTable]] plants them with dimensions derived
  * from doc_id — the oracle's independently-computable ground truth);
  * the parser has no access to that arithmetic and must recover every
  * value, and the body offset, from the bytes alone.
  */
object Multimodal extends QueryModule {

  /** A decoded media record: `container` is the format DETECTED from the
    * bytes (png/jpeg/wav/mp4/unknown — never read from the mime
    * column); width/height are the parsed dimensions (for WAV:
    * sample-rate and channel count; for MP4: timescale and duration in
    * movie-time units); `feature_hash` digests the post-header content
    * stream, so a parser that mis-computes the header length produces a
    * wrong hash, not just wrong metadata. */
  final case class MediaFeature(
      doc_id: Long, mime: String, container: String, payload_len: Long,
      width: Int, height: Int, feature_hash: String)

  // ---- container-header codecs (byte-level, spec-conformant) ----

  private def be16(v: Int): Array[Byte] = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, (v >>> 24).toByte)

  /** PNG: 8-byte signature + IHDR chunk (length, type, 13 data bytes,
    * real CRC-32 over type+data) — 33 header bytes, then the body. */
  def pngBytes(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val data = be32(w) ++ be32(h) ++
      Array[Byte](8, 6, 0, 0, 0) // bit depth 8, RGBA, deflate, none, none
    val typed = "IHDR".getBytes("US-ASCII") ++ data
    val crc = new java.util.zip.CRC32; crc.update(typed)
    sig ++ be32(13) ++ typed ++ be32(crc.getValue.toInt) ++ body
  }

  /** JPEG/JFIF: SOI, APP0 "JFIF" segment, SOF0 frame header (precision,
    * height, width, 3 components) — 39 header bytes (SOI + APP0 + SOF0), then the body. */
  def jpegBytes(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val soi = Array(0xff, 0xd8).map(_.toByte)
    val app0 = Array(0xff, 0xe0).map(_.toByte) ++ be16(16) ++
      "JFIF".getBytes("US-ASCII") ++ Array[Byte](0, 1, 1, 0) ++
      be16(72) ++ be16(72) ++ Array[Byte](0, 0) // 72dpi, no thumbnail
    val sof0 = Array(0xff, 0xc0).map(_.toByte) ++ be16(8 + 3 * 3) ++
      Array[Byte](8) ++ be16(h) ++ be16(w) ++ Array[Byte](3) ++
      Array[Byte](1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1) // YCbCr 4:2:0
    soi ++ app0 ++ sof0 ++ body
  }

  /** Canonical 44-byte RIFF/WAVE header (PCM fmt chunk + data chunk
    * header), then the body as the PCM stream. */
  def wavBytes(sampleRate: Int, channels: Int, body: Array[Byte]): Array[Byte] = {
    val bits = 16
    val byteRate = sampleRate * channels * bits / 8
    "RIFF".getBytes("US-ASCII") ++ le32(36 + body.length) ++
      "WAVE".getBytes("US-ASCII") ++ "fmt ".getBytes("US-ASCII") ++
      le32(16) ++ le16(1) ++ le16(channels) ++ le32(sampleRate) ++
      le32(byteRate) ++ le16(channels * bits / 8) ++ le16(bits) ++
      "data".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  /** Parsed header: detected container, dimensions (WAV: sample-rate /
    * channels), and where the content stream starts. */
  final case class MediaHeader(container: String, width: Int, height: Int,
      bodyOffset: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def rBe16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def rBe32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def rLe16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def rLe32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
  private def ascii(b: Array[Byte], i: Int, n: Int): String =
    if (i + n <= b.length) new String(b, i, n, "US-ASCII") else ""

  /** ISO-BMFF (MP4): `ftyp` (20 B: isom major brand) + `moov` holding a
    * version-0 `mvhd` (116 B: timescale + duration in movie-time units,
    * unity rate/volume/matrix) + the `mdat` header (8 B) over the body
    * — 144 header bytes total, each box size a real big-endian field
    * the parser must walk. */
  def mp4Bytes(timescale: Int, duration: Int, body: Array[Byte]): Array[Byte] = {
    val a = "US-ASCII"
    val ftyp = be32(20) ++ "ftyp".getBytes(a) ++
      "isom".getBytes(a) ++ be32(0x200) ++ "isom".getBytes(a)
    val mvhd = be32(108) ++ "mvhd".getBytes(a) ++
      be32(0) ++             // version 0 + flags
      be32(0) ++ be32(0) ++  // creation / modification time
      be32(timescale) ++ be32(duration) ++
      be32(0x00010000) ++    // rate 1.0 (16.16 fixed)
      Array(0x01.toByte, 0x00.toByte) ++       // volume 1.0 (8.8 fixed)
      Array.fill(10)(0.toByte) ++               // reserved
      (be32(0x00010000) ++ be32(0) ++ be32(0) ++
        be32(0) ++ be32(0x00010000) ++ be32(0) ++
        be32(0) ++ be32(0) ++ be32(0x40000000)) ++ // unity matrix
      Array.fill(24)(0.toByte) ++               // pre_defined
      be32(2)                                   // next_track_ID
    val moov = be32(116) ++ "moov".getBytes(a) ++ mvhd
    ftyp ++ moov ++ (be32(8 + body.length) ++ "mdat".getBytes(a)) ++ body
  }

  /** Detect the container by MAGIC BYTES and parse its header. PNG: the
    * 8-byte signature, then the first chunk must be IHDR (per spec) —
    * width/height big-endian at 16/20, body after the chunk's CRC. JPEG:
    * SOI then a real segment walk — skip each FF-marker segment by its
    * declared length until a SOF frame header (C0–CF minus DHT/JPG/DAC),
    * read precision/height/width, body after that segment. WAV: RIFF +
    * WAVE + fmt chunk walk — channels/sample-rate little-endian, body at
    * the data chunk's payload. Anything else: `unknown`, dimensions −1,
    * body at 0 (the whole payload is the content stream).
    *
    * Defensive against MALFORMED containers, which is the real-world
    * input class for a corpus decoder: declared chunk/segment lengths
    * are untrusted 32-bit fields that can be oversized or sign-negative,
    * so any parse whose computed body offset leaves [0, len] degrades to
    * `unknown` (never an out-of-bounds slice or a task failure on one
    * corrupt row), and the JPEG walk steps over standalone markers
    * (RST0–7, TEM, EOI, FF fill bytes) that carry no length field. */
  def parseMediaHeader(b: Array[Byte]): MediaHeader = {
    val unknown = MediaHeader("unknown", -1, -1, 0)
    def bounded(h: MediaHeader): MediaHeader =
      if (h.bodyOffset >= 0 && h.bodyOffset <= b.length) h else unknown
    val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (b.length >= 33 && pngSig.indices.forall(i => u8(b, i) == pngSig(i)) &&
        ascii(b, 12, 4) == "IHDR") {
      val dataLen = rBe32(b, 8) // untrusted: corrupt values exceed len
      bounded(MediaHeader("png", rBe32(b, 16), rBe32(b, 20),
        8 + 4 + 4 + dataLen + 4))
    } else if (b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
      var i = 2
      while (i + 1 < b.length && u8(b, i) == 0xff) {
        val marker = u8(b, i + 1)
        if (marker == 0xff) i += 1         // FF fill byte: marker restarts
        else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7))
          i += 2                           // TEM / RSTn: standalone, no length
        else if (marker == 0xd9) return unknown // EOI before any SOF frame
        else if (i + 4 <= b.length) {
          val segLen = rBe16(b, i + 2)
          if (segLen < 2) return unknown   // length includes its own 2 bytes
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof && i + 9 <= b.length)
            return bounded(MediaHeader("jpeg", rBe16(b, i + 7), rBe16(b, i + 5),
              i + 2 + segLen))
          i += 2 + segLen
        } else return unknown
      }
      unknown
    } else if (b.length >= 44 && ascii(b, 0, 4) == "RIFF" &&
        ascii(b, 8, 4) == "WAVE" && ascii(b, 12, 4) == "fmt ") {
      val fmtLen = rLe32(b, 16) // untrusted, same discipline as PNG
      if (fmtLen < 0 || 20L + fmtLen > b.length) unknown
      else {
        val dataHdr = 20 + fmtLen // start of the next chunk header
        bounded(MediaHeader("wav", rLe32(b, 24), rLe16(b, 22),
          if (ascii(b, dataHdr, 4) == "data") dataHdr + 8 else dataHdr))
      }
    } else if (b.length >= 16 && ascii(b, 4, 4) == "ftyp") {
      // ISO-BMFF: walk the top-level boxes by their declared big-endian
      // sizes (untrusted 32-bit fields — a size below the 8-byte box
      // header, a sign-flipped size, or one past EOF degrades to
      // `unknown`; size 0 legally means to-EOF). Timescale/duration come
      // from `mvhd` inside `moov` (version 0: 32-bit fields at +20/+24;
      // version 1: 64-bit times push them to +28 and +32, where the low
      // word of the 64-bit duration is at +36). Body = mdat payload, or
      // EOF when no mdat box exists (headers-only file).
      // mvhd fields are UNSIGNED 32-bit: read via a long mask — a
      // duration of 0xFFFFFFFF is the spec's unknown-duration sentinel
      // (common in real files) and maps to 0, and a timescale/duration
      // ≥ 2^31 saturates to Int.MaxValue rather than flipping negative
      // and misclassifying an otherwise valid file as `unknown`.
      def u32(i: Int): Long = rBe32(b, i) & 0xffffffffL
      def sat(v: Long): Int = math.min(v, Int.MaxValue.toLong).toInt
      // the sentinel applies to DURATION only; timescale just saturates
      def durField(v: Long): Int = if (v == 0xffffffffL) 0 else sat(v)
      var i = 0
      var ts = -1; var dur = -1; var bodyOff = -1; var bad = false
      while (!bad && i + 8 <= b.length) {
        val declared = rBe32(b, i)
        val size = if (declared == 0) b.length - i else declared
        if (size < 8 || i.toLong + size > b.length) bad = true
        else {
          ascii(b, i + 4, 4) match {
            case "moov" =>
              var j = i + 8
              val end = i + size
              while (!bad && j + 8 <= end) {
                val cs = rBe32(b, j)
                if (cs < 8 || j.toLong + cs > end) bad = true
                else {
                  if (ascii(b, j + 4, 4) == "mvhd") {
                    // the version byte lives INSIDE the box: a declared
                    // size of exactly 8 (header only) ending at EOF
                    // would otherwise read one byte past the payload
                    if (cs < 9) bad = true
                    else u8(b, j + 8) match {
                      case 0 if cs >= 108 =>
                        ts = sat(u32(j + 20)); dur = durField(u32(j + 24))
                      case 1 if cs >= 120 =>
                        ts = sat(u32(j + 28)); dur = durField(u32(j + 36))
                      case _ => bad = true
                    }
                  }
                  j += cs
                }
              }
            case "mdat" => bodyOff = i + 8
            case _ => ()
          }
          i += size
        }
      }
      if (bad || ts < 0) unknown
      else bounded(MediaHeader("mp4", ts, dur,
        if (bodyOff >= 0) bodyOff else b.length))
    } else unknown
  }

  /** The partition-parallel decode stage: binary column in, typed feature
    * rows out, header values parsed from the BYTES ([[parseMediaHeader]]).
    * `mapPartitions` keeps per-partition batching (the shape a
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
      .mapPartitions(_.map { case (id, mime, rawPayload) =>
        // NULL payload ≡ empty media object (same contract as
        // [[frameSample]]): parses as `unknown`, digests the empty body
        val payload = if (rawPayload == null) Array.empty[Byte] else rawPayload
        val h = parseMediaHeader(payload)
        val bodySha = java.security.MessageDigest.getInstance("SHA-256")
          .digest(java.util.Arrays.copyOfRange(payload, h.bodyOffset, payload.length))
          .map("%02x".format(_)).mkString
        MediaFeature(id, mime, h.container, payload.length.toLong,
          h.width, h.height, bodySha)
      })
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
      .flatMap { case (id, rawPayload) =>
        // NULL payload ≡ empty media object: one empty frame, never an
        // NPE — a single null row must not kill a cluster-wide decode
        val payload = if (rawPayload == null) Array.empty[Byte] else rawPayload
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

  /** documents → media table with SPEC-CORRECT container headers over
    * the text bytes as the content body. Dimensions are planted from
    * doc_id arithmetic — the ground truth the oracle recomputes
    * independently while [[decodeMedia]] must recover it from the bytes:
    * PNG/JPEG w = 16+(id%64)·16, h = 16+(id%48)·16; WAV sample-rate =
    * 8000+(id%8)·4000, channels = 1+(id%2); MP4 timescale =
    * 600·(1+(id%5)), duration = 1000+(id%97)·250 movie-time units.
    * Header sizes are fixed by the encoders: PNG 33, JPEG 39, WAV 44,
    * MP4 144 bytes. */
  def encodedMediaTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        // NULL text ≡ empty content body (the header still encodes)
        val body = (if (text == null) "" else text).getBytes("UTF-8")
        val w = 16 + (Math.floorMod(id, 64L) * 16).toInt
        val h = 16 + (Math.floorMod(id, 48L) * 16).toInt
        Math.floorMod(id, 4L) match {
          case 0L => (id, "image/png", pngBytes(w, h, body))
          case 1L => (id, "image/jpeg", jpegBytes(w, h, body))
          case 2L => (id, "audio/wav",
            wavBytes(8000 + (Math.floorMod(id, 8L) * 4000).toInt,
              1 + Math.floorMod(id, 2L).toInt, body))
          case _ => (id, "video/mp4",
            mp4Bytes(600 * (1 + Math.floorMod(id, 5L).toInt),
              1000 + Math.floorMod(id, 97L).toInt * 250, body))
        }
      }).toDF("doc_id", "mime", "payload")
  }

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
             | -- encode(), not ::BLOB: the cast ERRORS on non-ASCII text
             | -- while encode is plain UTF-8 bytes (and NULL-safe)
             | octet_length(encode(text)) AS payload_len,
             | sha256(text) AS payload_sha
             |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "multimodal binary column + typed metadata (north-star)"),

    // Decode / feature-extract over partitions: REAL header parsing.
    // Every reported number crosses the byte boundary — total_bytes
    // prices the encoded headers, n_detected proves magic-byte format
    // detection matched the claimed mime, max_width/max_height are the
    // PARSED dimensions (oracle recomputes them from the planted
    // arithmetic it shares with the encoder, which the parser never
    // sees), and uniq_features digests the post-header content stream,
    // so a mis-computed header length breaks the hash match, not just
    // the metadata.
    "mm_decode_features" -> Q(
      (s, dir) =>
        decodeMedia(encodedMediaTable(s, dir)).toDF()
          .groupBy(col("mime"))
          .agg(
            count(lit(1)).as("n_media"),
            sum(when(element_at(split(col("mime"), "/"), 2) === col("container"),
              1L).otherwise(0L)).as("n_detected"),
            sum(col("payload_len")).as("total_bytes"),
            countDistinct(col("feature_hash")).as("uniq_features"),
            max(col("width")).cast("long").as("max_width"),
            max(col("height")).cast("long").as("max_height"))
          .orderBy(col("mime")),
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    CASE doc_id % 4 WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
             |         WHEN 2 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
             |    CASE doc_id % 4 WHEN 0 THEN 33 WHEN 1 THEN 39
             |         WHEN 2 THEN 44 ELSE 144 END AS hdr,
             |    CASE WHEN doc_id % 4 < 2 THEN 16 + (doc_id % 64) * 16
             |         WHEN doc_id % 4 = 2 THEN 8000 + (doc_id % 8) * 4000
             |         ELSE 600 * (1 + doc_id % 5) END AS w,
             |    CASE WHEN doc_id % 4 < 2 THEN 16 + (doc_id % 48) * 16
             |         WHEN doc_id % 4 = 2 THEN 1 + (doc_id % 2)
             |         ELSE 1000 + (doc_id % 97) * 250 END AS h,
             |    octet_length(encode(coalesce(text, ''))) AS body_len,
             |    sha256(coalesce(text, '')) AS fh
             |  FROM documents)
             |SELECT mime, count(*) AS n_media,
             |  CAST(count(*) AS BIGINT) AS n_detected,
             |  CAST(sum(hdr + body_len) AS BIGINT) AS total_bytes,
             |  count(DISTINCT fh) AS uniq_features,
             |  CAST(max(w) AS BIGINT) AS max_width,
             |  CAST(max(h) AS BIGINT) AS max_height
             |FROM m GROUP BY 1 ORDER BY mime""".stripMargin),
      doc = "partition-parallel media decode: real PNG/JFIF/RIFF/ISO-BMFF header parsing vs planted ground truth"),

    // Frame sampling as a query: the 1→N partition-parallel fan-out
    // ([[frameSample]]: 8 evenly-spaced byte-slice "frames" per payload,
    // flatMap, no shuffle — the video-decode shape) rolled up per doc.
    // The oracle replays the byte arithmetic BYTE-accurately on any
    // text (hex(encode(…)) is 2 hex chars per byte, so a hex-string
    // slice at (off·2, flen·2) is exactly the engine's byte slice —
    // no ASCII assumption); uniq_frames only needs DISTINCTNESS, so
    // the hex slices stand in for the engine's slice digests.
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
             |  SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx,
             |    CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS len
             |  FROM documents),
             |f AS (
             |  SELECT doc_id,
             |    (len * i) // 8 AS off,
             |    least((len * i) // 8 + 64, len) - (len * i) // 8 AS flen,
             |    substring(hx, CAST((len * i) // 8 AS INTEGER) * 2 + 1,
             |      CAST(least((len * i) // 8 + 64, len) - (len * i) // 8 AS INTEGER) * 2) AS fh
             |  FROM (SELECT doc_id, hx, len,
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
