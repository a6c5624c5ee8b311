package graft.functions

/** THE 60-bit md5-prefix hash over raw bytes — the byte-level twin of
  * `Dedup.h60` (DataFrame) and `('0x' || substr(md5(x), 1, 15))::BIGINT`
  * (DuckDB oracle): the first 15 hex nibbles of md5(bytes) as a Long.
  * One byte-twiddling implementation repo-wide; [[HllAggregate]] and
  * [[TextExpressions.simhash16Impl]] previously each carried their own
  * (with their own ThreadLocal digest), and a future edit to one would
  * have silently desynchronized the other's cross-engine parity.
  */
private[functions] object Md5Hash {

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits (15 hex nibbles) of md5(bytes). */
  def prefix60(bytes: Array[Byte]): Long = {
    val d = mdLocal.get()
    d.reset()
    val dig = d.digest(bytes)
    // accumulate the first 8 bytes (64 bits), then drop the low nibble
    // of byte 7 — exactly the leading 15 hex characters
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (dig(i) & 0xffL); i += 1 }
    h >>> 4
  }
}
