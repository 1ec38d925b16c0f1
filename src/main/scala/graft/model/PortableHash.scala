package graft.model

/** Driver-side md5-derived integers that must stay byte-identical to their
  * Spark/SQL twins — `md5(x)` / `conv(substring(md5(x),1,15),16,10)` in
  * Spark ([[graft.operators.Dedup.md5Hash60]]) and
  * `CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)` in DuckDB. Every
  * parity-sensitive derivation lives here, so a change cannot silently
  * break one of its copies (bucket routing, LSH plane signs).
  */
object PortableHash {

  def md5Hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }

  /** 60-bit positive integer from the first 15 hex digits of md5. */
  def md5Long60(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 15), 16)
}
