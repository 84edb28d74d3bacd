package graft

import org.apache.spark.sql.functions._

/** Pins the corpus properties the cross-engine text twins LOAD-BEAR on:
  *
  *  - documents.text is pure printable ASCII (0x20–0x7E). This makes
  *    (a) Java `\s`/Character.isWhitespace and DuckDB RE2 `\s` agree on
  *    tokenization (the only whitespace present is the space character —
  *    the ADVICE-flagged \x0B/unicode divergence cannot fire), and
  *    (b) `ord(substr(t,i,1))` in DuckDB equal the UTF-8 byte, which the
  *    OracleXxh XXH64 twin hashes.
  *  - every whitespace token is under 32 bytes: OracleXxh implements
  *    XXH64's sub-32-byte tail path only; ≥32-byte tokens hash to NULL
  *    there (a VISIBLE gate break). This spec turns that latent break
  *    into an immediate test failure naming the cause.
  *
  * If the driver's corpus generator ever changes, these fail first with a
  * precise message instead of an opaque hash mismatch in CORRECTNESS.
  */
class CorpusAssumptionsSpec extends SparkSpec {

  private def checks(sfDir: String): Unit = {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val row = docs.agg(
      sum(when(col("text").rlike("[^\\x20-\\x7e]"), 1).otherwise(0)).as("non_ascii_docs"),
      max(array_max(transform(split(trim(col("text")), "\\s+"), t => octet_length(t))))
        .as("max_tok_bytes"),
      count(lit(1)).as("n")).head()
    assert(row.getLong(0) == 0L,
      s"$sfDir: ${row.getLong(0)} documents contain non-printable-ASCII chars — " +
        "the DuckDB XXH64 twin (byte = ord(char)) and \\s tokenization parity no longer hold")
    assert(row.getInt(1) < 32,
      s"$sfDir: max token length ${row.getInt(1)} ≥ 32 bytes — OracleXxh's bounded " +
        "XXH64 tail path would yield NULL; implement the 4-lane stripe loop before relying on the gate")
    assert(row.getLong(2) > 0L, s"$sfDir: empty documents table")
  }

  test("documents corpus is printable ASCII with sub-32-byte tokens (sf0.001)") {
    checks("/root/testdata/sf0.001")
  }

  test("documents corpus is printable ASCII with sub-32-byte tokens (sf0.01)") {
    checks("/root/testdata/sf0.01")
  }
}
