package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text-shredding expressions for the dedup / text-analysis
  * extensions (SURVEY.md §7.5). All higher-order-function based — codegen'd,
  * no UDFs, no shuffles: every function here is a per-row projection, so the
  * operators composed from them scale embarrassingly-parallel.
  */
object TextFns {

  /** Non-empty whitespace tokens, lowercased. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  /** Distinct word n-gram shingles over `toks` (the MinHash/Jaccard unit).
    * Guarded for < n tokens: `sequence(0, -1)` would otherwise produce a
    * DESCENDING two-element array (Spark sequence semantics) and fabricate
    * phantom partial shingles that no oracle reproduces. */
  def shingles(toks: Column, n: Int = 3): Column = {
    val built = array_distinct(transform(
      sequence(lit(0), size(toks) - n), i =>
        concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*)))
    when(size(toks) >= n, built).otherwise(array().cast("array<string>"))
  }

  /** Exact word-set Jaccard: |A∩B| / (|A|+|B|-|A∩B|), 0 when both empty. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    when(union === 0.0, lit(0.0)).otherwise(round(inter / union, 6))
  }

  /** Portable 60-bit string hash: first 15 hex chars of md5 as a bigint.
    * The SAME value DuckDB computes as `('0x'||substr(md5(s),1,15))::BIGINT`
    * and `graft.plans.PortableHash.h60` computes natively — one hash
    * definition shared by the engine, the HOF reference impls below, and
    * the correctness oracles. */
  def portableH60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("bigint")

  /** MinHash signature, HOF reference implementation of
    * `graft.plans.MinHashSig` (same values, interpreter-bound — use the
    * native expression in the hot path). */
  def minhashSignature(shingleCol: Column, k: Int = 32): Column = {
    val P = graft.plans.PortableHash.P
    transform(sequence(lit(0), lit(k - 1)), i => {
      val hs = transform(shingleCol, s => portableH60(s) % P)
      coalesce(
        array_min(transform(hs, h =>
          (element_at(typedLit((0 until k).map(graft.plans.PortableHash.a)), i + 1) * h +
            element_at(typedLit((0 until k).map(graft.plans.PortableHash.b)), i + 1)) % P)),
        lit(P))
    })
  }

  /** LSH band hashes over a signature: `bands` portable hashes of
    * `rowsPerBand` consecutive signature slots each (comma-joined decimal
    * strings — the shape DuckDB's `array_to_string(sig[a:b], ',')`
    * reproduces exactly). */
  def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), j =>
      portableH60(concat_ws(",", (0 until rowsPerBand).map(r =>
        element_at(sig, j * rowsPerBand + r + 1).cast("string")): _*)))

  /** Per-token portable h60 values — materialize this ONCE as a column
    * before folding bits; hashing inside the per-bit loop would recompute
    * every token hash 60 times. */
  def tokenHashes(toks: Column): Column = transform(toks, t => portableH60(t))

  /** 60-bit SimHash from precomputed token hashes: per-bit ±1 votes,
    * sign-threshold, packed into a bigint. HOF reference implementation of
    * `graft.plans.SimHash60`. (`call_function` because the Scala
    * `shiftright`/`shiftleft` wrappers take Int literals, and the shift
    * amount here is a lambda variable.) */
  def simhash60(tokHashes: Column): Column =
    aggregate(sequence(lit(0), lit(59)), lit(0L),
      (acc, b) => acc + when(
        aggregate(tokHashes, lit(0L), (acc2, h) =>
          acc2 + when(
            call_function("shiftright", h, b)
              .bitwiseAND(lit(1L)) === 1L,
            lit(1L)).otherwise(lit(-1L))) >= 0L,
        call_function("shiftleft", lit(1L), b)).otherwise(lit(0L)))

  /** Normalized-text fingerprint: lower + whitespace-collapse + sha256. */
  def fingerprint(text: Column): Column =
    sha2(trim(regexp_replace(lower(text), "\\s+", " ")), 256)
}
