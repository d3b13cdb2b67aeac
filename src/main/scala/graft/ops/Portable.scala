package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic primitives.
  *
  * The driver's correctness gate (SURVEY.md §5.2) hash-compares Spark
  * results against DuckDB, so every hash-like operator we expose must be
  * computable bit-identically by both engines. Spark's native `hash()`
  * (Murmur3, seed 42 — what the reference uses at COMP5349_2.py:197) has
  * no DuckDB twin, so the oracle-checkable ops are built on MD5, which
  * both engines implement per RFC 1321:
  *
  *   Spark :  conv(substring(md5(s), 1, 15), 16, 10) :: long
  *   DuckDB:  ('0x' || substring(md5(s), 1, 15)) :: BIGINT
  *
  * 15 hex digits = 60 bits, always positive, exact in an int64. All
  * derived arithmetic (MinHash permutations, SimHash bit tests) stays in
  * exact integer math < 2^63 on both sides.
  */
object Portable {

  /** 60-bit positive hash of a string column (same value as [[p60Sql]]).
    * Resolves to the codegen'd [[graft.functions.Portable60]] expression
    * (registered by Tables/GraftFunctions on every session) — identical
    * value to the composed conv(substring(md5(s),1,15),16,10) form, ~4x
    * cheaper on md5-heavy dedup queries. */
  def p60(c: Column): Column =
    call_function("p60", c)

  /** DuckDB SQL fragment computing the same 60-bit hash. */
  def p60Sql(expr: String): String =
    s"('0x' || substring(md5($expr), 1, 15))::BIGINT"

  /** Mersenne prime 2^31-1: modulus for MinHash permutations — keeps
    * `a*x+b` products < 2^63 for coefficients < 2^31. */
  val MinHashPrime: Long = 2147483647L

  /** Whitespace tokens of trimmed text (DuckDB:
    * `string_split_regex(trim(text), '\s+')`). */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Normalized document text for exact-dup fingerprinting: lowercase,
    * collapsed whitespace, trimmed. Collapse BEFORE trim: trim() strips
    * only ASCII spaces (both engines), so leading tabs would otherwise
    * survive as a space and break idempotency. */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Same normalization in DuckDB SQL (needs the 'g' flag — DuckDB
    * regexp_replace is first-match-only by default, Spark's is global). */
  def normTextSql(expr: String): String =
    s"trim(regexp_replace(lower($expr), '\\s+', ' ', 'g'))"
}
