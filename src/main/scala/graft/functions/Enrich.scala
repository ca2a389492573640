package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar enrichment functions — SURVEY §2.C, re-expressed as pure
  * `Column → Column` combinators over Spark built-ins (codegen'd; no
  * UDFs anywhere, so every use stays inside whole-stage codegen).
  */
object Enrich {

  /** C1 — strict numeric cast: malformed input must abort the job.
    * Reference: `pd.to_numeric(errors="raise")`
    * (`/root/reference/src/transform/hn_transform.py:77-78`).
    * Spark 4 is ANSI-on by default, so `cast` itself raises
    * CAST_INVALID_INPUT; the guard below adds the same fail-fast for
    * non-ANSI sessions (where cast yields null). */
  def strictLong(c: Column): Column =
    when(c.isNotNull && c.try_cast("long").isNull,
      raise_error(concat(lit("strict cast to long failed: "), c.cast("string"))))
      .otherwise(c.cast("long"))

  /** C2 — lenient cast with default: `to_numeric(errors="coerce").fillna(0)`
    * (`hn_transform.py:79-82`). `try_cast` yields null on malformed input
    * regardless of ANSI mode (Spark 4 is ANSI-on by default). */
  def lenientLong(c: Column, default: Long = 0L): Column =
    coalesce(c.try_cast("long"), lit(default))

  /** C3 — array length with null→0 (NOT Spark's legacy −1):
    * `len(kids) if isinstance(kids, list) else 0` (`hn_transform.py:84-86`). */
  def arrayLen(c: Column): Column = coalesce(size(c), lit(0)).cast("int")

  /** C4 — epoch seconds → UTC timestamp (`hn_transform.py:88`). */
  def epochToTs(c: Column): Column = timestamp_seconds(c)

  /** C5 — batch timestamp parsed from a `..._YYYYMMDD_HHMMSS.ext` file
    * name (`hn_transform.py:29-36`), distributed via `input_file_name`. */
  def filenameTs(fileName: Column): Column =
    to_timestamp(
      regexp_extract(fileName, "(\\d{8}_\\d{6})", 1), "yyyyMMdd_HHmmss")

  /** C8+C9 — domain bucket: null/empty → '(no_domain)', else strip
    * http(s) scheme, take host segment, lowercase
    * (`/root/reference/sql/mart/02_marts.sql:56-65`). */
  def domainOf(url: Column): Column =
    when(url.isNull || url === "", lit("(no_domain)"))
      .otherwise(lower(split_part(
        regexp_replace(regexp_replace(url, "https://", ""), "http://", ""),
        lit("/"), lit(1))))

  /** C14 — error-message style truncation (`hn_load.py:151`). */
  def truncate(c: Column, n: Int): Column = substring(c, 1, n)

  /** Z-order (Morton) key: interleave the low `bits` bits of two
    * non-negative ints so rows sorted by the key cluster along BOTH
    * dimensions — the standard multi-column data-skipping layout (sort
    * by this before writing; parquet min/max stats then prune on either
    * column). Pure integer shifts: engine-portable. */
  def zorderKey(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      (shiftright(a, i).bitwiseAND(1) * (1L << (2 * i))) +
        (shiftright(b, i).bitwiseAND(1) * (1L << (2 * i + 1)))
    }.reduce(_ + _).cast("long")
}
