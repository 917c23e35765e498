package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column helpers shared across operators.
  *
  * Cross-engine determinism convention (the DuckDB oracle must
  * hash-match, see Verify): money aggregates are summed as
  * DECIMAL (exact, order-independent) and only then cast to double;
  * plain double sums would differ in final ULPs because Spark's partial
  * aggregation order differs from DuckDB's.
  */
object Functions {

  /** Exact money sum: cast to decimal(18,2) per row, sum (exact), cast
    * the single result back to double. Oracle equivalent:
    * `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact sum for derived monetary expressions that need more scale
    * (e.g. price*(1-discount)). Oracle: DECIMAL(18,6).
    */
  def dsum6(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast("double")

  /** Whitespace tokenizer; oracle: string_split_regex(trim(x),'\s+'). */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Canonical text normalization used by fingerprint/exact-dedup:
    * lowercase, trim, collapse runs of whitespace to single spaces.
    */
  def normText(c: Column): Column =
    lower(regexp_replace(trim(c), "\\s+", " "))

  /** md5 hex of a string column (matches DuckDB md5(x)). */
  def md5Hex(c: Column): Column = md5(c.cast("binary"))

  /** Dot product of two float-array columns, accumulated left-to-right
    * in double (same fold order as the oracle's per-index sum up to
    * reassociation; see Dedup/Similarity notes on rounding).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))

  /** Cosine similarity between two float-array columns. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Deterministic cross-engine "hash" for seeded splits/sampling:
    * pure integer arithmetic, safe from bigint overflow on both
    * engines for keys < ~1e12 (SURVEY §2.7 U4 — numpy seeds cannot be
    * reproduced in SQL, so the split is re-keyed on a stable column).
    */
  def bucket10(key: Column, salt: Column): Column =
    ((key % 100003L) * 31L + salt * 97L) % 10L
}
