package graft.expressions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Deterministic per-(seed, table, dim) Gaussian projection directions,
  * cached per executor. Determinism contract: the direction for table `t`
  * is the first `dim` draws of `java.util.Random(seed * 1000003 + t)
  * .nextGaussian()` — a pure function of (seed, t, dim), independent of
  * which executor, task, or request order materializes it first. */
private[expressions] object RpMatrix {
  private val cache = new ConcurrentHashMap[(Long, Int, Int), Array[Array[Double]]]()

  def get(seed: Long, nTables: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((seed, nTables, dim), { case (s, nt, d) =>
      Array.tabulate(nt) { t =>
        val rng = new java.util.Random(s * 1000003L + t)
        Array.fill(d)(rng.nextGaussian())
      }
    })
}

/** Random-projection LSH bucket keys over an embedding column — the
  * engine-native replacement for an ML-pipeline LSH transform
  * (hyperplanes from a seeded fit + a per-row UDF over UDT-encoded
  * vectors; measured ~2.5 s of plan/UDF overhead at sf0.1 for a
  * candidate set the bucket math itself produces in ~0.2 s).
  *
  * Semantics (Datar et al., SoCG 2004 — p-stable Euclidean LSH, on
  * L2-NORMALIZED input so euclidean order == cosine order):
  * `bucket[t] = floor( dot(v, g_t) / (||v|| · w) )` for `nTables`
  * deterministic Gaussian directions g_t. Normalization happens INSIDE the
  * kernel (dot and norm in one pass), so callers feed raw embeddings — no
  * separate normalize projection, no UDT conversion anywhere.
  *
  * A zero vector has no direction: its buckets are all 0 (it collides with
  * everything near the origin slice, and the exact verify step every LSH
  * consumer runs discards false pairs).
  *
  * CodegenFallback like [[SimHash64]]: the per-row cost is the
  * nTables × dim multiply loop, not expression dispatch; the projection
  * matrix is a per-executor cache keyed by (seed, nTables, dim), so rows
  * pay one ConcurrentHashMap read, never a matrix rebuild. */
case class RpBucketKeys(child: Expression, nTables: Int,
    bucketLength: Double, seed: Long)
  extends UnaryExpression with CodegenFallback {

  require(nTables >= 1, "rp_bucket_keys needs at least one hash table")
  require(bucketLength > 0.0, "rp_bucket_keys bucketLength must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rp_bucket_keys"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeCheck.numericArrays(prettyName, Seq(child.dataType))

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val d = v.numElements()
    val mat = RpMatrix.get(seed, nTables, d)
    var norm2 = 0.0
    var i = 0
    while (i < d) {
      val x: Double = if (isFloat) v.getFloat(i) else v.getDouble(i)
      norm2 += x * x
      i += 1
    }
    val norm = math.sqrt(norm2)
    val out = new Array[Any](nTables)
    var t = 0
    while (t < nTables) {
      val g = mat(t)
      var dot = 0.0
      i = 0
      while (i < d) {
        dot += (if (isFloat) v.getFloat(i) else v.getDouble(i)) * g(i)
        i += 1
      }
      out(t) =
        if (norm == 0.0) 0L
        else math.floor(dot / (norm * bucketLength)).toLong
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): RpBucketKeys =
    copy(child = newChild)
}

/** Deterministic per-(table, dim) Rademacher (±1) directions from md5 —
  * engine-INDEPENDENT, unlike [[RpMatrix]]'s JVM Gaussian draws: the sign
  * for (t, i) is the top bit of md5("t|i"), reproducible in any engine
  * with an md5 (the same family trick as [[SimHash64]]). */
/** The md5-Rademacher sign family shared by [[RadBucketKeys]] (LSH
  * buckets) and `Similarity.radProject` (JL dimensionality reduction) —
  * ONE derivation, so the bucket path and the projection path can never
  * drift apart, and both stay reproducible in SQL. */
object RadSigns {
  /** +1 when the top bit of md5("t|i")'s first byte is set, else −1. */
  def sign(t: Int, i: Int): Double = RadMatrix.sign(t, i)
}

private[expressions] object RadMatrix {
  private val cache = new ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  def sign(t: Int, i: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$t|$i".getBytes("UTF-8"))
    if ((d(0) & 0x80) != 0) 1.0 else -1.0
  }

  def get(nTables: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((nTables, dim), { case (nt, d) =>
      Array.tabulate(nt, d)((t, i) => sign(t, i))
    })
}

/** Euclidean-LSH bucket keys like [[RpBucketKeys]], but over md5-derived
  * RADEMACHER (±1) directions instead of seeded JVM Gaussians:
  * `bucket[t] = floor( dot(v, r_t) / (||v|| · w) )` with
  * `r_t[i] = sign(md5("t|i"))`. By CLT, `dot(v̂, r_t)` over a unit vector
  * in d = 64 dims is as Gaussian as the p-stable theory needs (Achlioptas
  * 2003 established ±1 projections for JL/LSH use — public method), so
  * collision probabilities match the Gaussian family at the same bucket
  * width — but every byte of the key derivation is now reproducible in
  * SQL, which is what promotes the ANN candidate query from
  * rows-only-checked to full-oracle. Accumulation is left-to-right in
  * double, the repo-wide oracle discipline. */
case class RadBucketKeys(child: Expression, nTables: Int,
    bucketLength: Double)
  extends UnaryExpression with CodegenFallback {

  require(nTables >= 1, "rad_bucket_keys needs at least one hash table")
  require(bucketLength > 0.0, "rad_bucket_keys bucketLength must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rad_bucket_keys"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeCheck.numericArrays(prettyName, Seq(child.dataType))

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val d = v.numElements()
    val mat = RadMatrix.get(nTables, d)
    var norm2 = 0.0
    var i = 0
    while (i < d) {
      val x: Double = if (isFloat) v.getFloat(i) else v.getDouble(i)
      norm2 += x * x
      i += 1
    }
    val norm = math.sqrt(norm2)
    val out = new Array[Any](nTables)
    var t = 0
    while (t < nTables) {
      val g = mat(t)
      var dot = 0.0
      i = 0
      while (i < d) {
        dot += (if (isFloat) v.getFloat(i) else v.getDouble(i)) * g(i)
        i += 1
      }
      out(t) =
        if (norm == 0.0) 0L
        else math.floor(dot / (norm * bucketLength)).toLong
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): RadBucketKeys =
    copy(child = newChild)
}
