package graft.queries

/** Shared cross-engine SQL fragments. The md5-prefix digest idiom (see
  * README "Float determinism" notes): both engines produce identical md5
  * hex, and a 15-hex-char prefix (60 bits) fits BIGINT — Spark spells the
  * hex→int cast `conv(..., 16, 10)`, DuckDB casts a `'0x…'` string. One
  * definition here so a future change to the idiom edits one place.
  */
object CrossEngine {

  /** `width` hex chars of `md5(x)` as an integer of SQL type `castTo`. */
  def hexDigest(spark: Boolean, x: String, width: Int = 15, castTo: String = "BIGINT"): String =
    if (spark) s"CAST(conv(substring(md5($x), 1, $width), 16, 10) AS $castTo)"
    else s"CAST(('0x' || substring(md5($x), 1, $width)) AS $castTo)"

  /** The 60-bit non-negative BIGINT digest — the default spelling. */
  def hash60(spark: Boolean, x: String): String = hexDigest(spark, x)

  /** The engines' string type names diverge; digest inputs cast through
    * this so the md5 argument renders identically.
    */
  def strType(spark: Boolean): String = if (spark) "STRING" else "VARCHAR"
}
