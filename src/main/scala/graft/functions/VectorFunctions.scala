package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from the
  * `zip_with`/`aggregate` higher-order functions — codegen-friendly, no
  * UDF, no shuffle. All arithmetic is promoted to double before reduction
  * so results are deterministic and oracle-comparable.
  */
object VectorFunctions {

  private def d(c: Column): Column = transform(c, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosineSimilarity(a: Column, b: Column): Column = {
    val den = norm(a) * norm(b)
    when(den === 0, lit(0.0)).otherwise(dot(a, b) / den)
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x))

  /** Per-vector max-abs int8 quantization: `q_i = round(x_i / maxabs * 127)`
    * with the scale carried alongside — the 4× storage compression a
    * 100 TB float32 embedding corpus takes before anything else (and the
    * precursor to PQ codebooks). All-zero vectors quantize to zeros with
    * scale 0. The divide/multiply/HALF-UP-round chain is IEEE-identical
    * across engines, so the quantized bytes themselves are oracled, not
    * just spot-checked.
    */
  def maxAbs(a: Column): Column = array_max(transform(d(a), x => abs(x)))

  def quantizeInt8(a: Column): Column = {
    val m = maxAbs(a)
    transform(d(a), x =>
      when(m === 0, lit(0)).otherwise(round(x / m * 127))
        .cast("tinyint"))
  }

  /** Reconstruction of [[quantizeInt8]]: `q_i * maxabs / 127`. */
  def dequantizeInt8(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale / 127)

  /** Sign-bit sketch for LSH bucketing: concatenated signs of `k` fixed
    * deterministic pseudo-random projections. The projection vectors are
    * derived from the element index via a hash-free recurrence so both the
    * index build and the probe compute identical planes with no shared
    * state — the scale path for ANN (bucket first, exact cosine within
    * bucket).
    */
  def signBucket(a: Column, planes: Seq[Seq[Double]]): Column = {
    val sigs = planes.map { p =>
      val proj = aggregate(
        zip_with(d(a), typedLit(p), (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(sigs: _*)
  }

  /** Deterministic pseudo-random hyperplanes (xorshift-style LCG seeded by
    * plane index) — no RNG state, reproducible across runs and engines.
    */
  def hyperplanes(k: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] =
    (0 until k).map { p =>
      (0 until dim).map { i =>
        val x = (seed + p * 1315423911L + i * 2654435761L) & 0x7fffffffL
        (x.toDouble / 0x7fffffffL.toDouble) * 2.0 - 1.0
      }
    }
}
