package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One-pass accumulation state for [[Pca.momentSums]]: row count, per-dim
  * sums, and the upper-triangular second-moment sums of the QUANTIZED
  * vectors — all integers, so partial merges are exact and order-free. */
case class MomentBuf(var n: Long, s1: Array[Long], s2: Array[Long])

/** Sums quantized vectors into O(d²) integer state per partition — the
  * covariance kernel of [[Pca]]. Partial-aggregated: each map task folds its
  * rows locally (d(d+1)/2 multiply-adds per row, no row explosion), the
  * shuffle carries ONE buffer per task, merges are elementwise long adds. */
class MomentAggregator(dim: Int)
    extends Aggregator[Array[Long], MomentBuf, MomentBuf] {
  private val tri = dim * (dim + 1) / 2
  def zero: MomentBuf = MomentBuf(0L, new Array[Long](dim), new Array[Long](tri))
  // All arithmetic is *Exact: a quantized component of |x|·scale ~ 10⁷
  // (|x| ~ 10³ at the default scale) gives per-row products ~ 10¹⁴ and a
  // silent Long wrap after ~10⁵ rows — unnormalized inputs must fail
  // LOUDLY (ArithmeticException surfaces as a task failure), never return
  // a wrong covariance. The exact intrinsics cost nothing on the hot path.
  def reduce(b: MomentBuf, q: Array[Long]): MomentBuf = {
    require(q.length == dim, s"vector dim ${q.length} != configured $dim")
    var i = 0; var t = 0
    while (i < dim) {
      b.s1(i) = Math.addExact(b.s1(i), q(i))
      var j = i
      while (j < dim) {
        b.s2(t) = Math.addExact(b.s2(t), Math.multiplyExact(q(i), q(j)))
        t += 1; j += 1
      }
      i += 1
    }
    b.n += 1
    b
  }
  def merge(a: MomentBuf, b: MomentBuf): MomentBuf = {
    var i = 0
    while (i < dim) { a.s1(i) = Math.addExact(a.s1(i), b.s1(i)); i += 1 }
    var t = 0
    while (t < tri) { a.s2(t) = Math.addExact(a.s2(t), b.s2(t)); t += 1 }
    a.n += b.n
    a
  }
  def finish(r: MomentBuf): MomentBuf = r
  def bufferEncoder: Encoder[MomentBuf] = Encoders.product[MomentBuf]
  def outputEncoder: Encoder[MomentBuf] = Encoders.product[MomentBuf]
}

/** Principal component analysis over an embedding column, the
  * MLlib-RowMatrix way re-expressed on the Dataset API: ONE distributed
  * pass accumulates the d-vector of sums and the d×d second-moment matrix
  * (O(d²) state per partition, map-side combined — never a row explosion,
  * never an n×d shuffle), the d×d eigenproblem is solved on the driver
  * (d ≤ a few hundred by contract — for d=64 that is a 64×64 Jacobi sweep,
  * microseconds), and projection is a broadcast matrix-vector product per
  * row. This is the standard decomposition for distributed PCA when
  * d² ≪ n·d: the cluster does the data-sized work, the driver does the
  * dimension-sized work.
  *
  * Training-data uses: embedding whitening/compression beside the other
  * dim-reduction ops ([[graft.functions.VectorFunctions]] matryoshka
  * truncation, Rademacher random projection), anisotropy diagnostics
  * (Ethayarajh 2019 — top-PC dominance of contextual embeddings), and
  * ABTT-style common-component removal (Mu & Viswanath 2018: subtract the
  * top PCs to improve retrieval cosine quality).
  *
  * Cross-engine exactness: float sums are partition-order-dependent, so the
  * accumulated moments are taken over vectors QUANTIZED to fixed point
  * (`q = ⌊x·scale⌋` per component, default scale 10⁴ — well beneath the
  * float32 input's own noise floor). Integer sums are exact and order-free:
  * the [[momentSums]] board row hashes identically on any engine and any
  * partitioning, and [[fit]]'s covariance is derived from those integers
  * deterministically. (The same fixed-point discipline as the repo-wide
  * rule: rank/hash on integers, never on a float fold.)
  */
object Pca {

  /** Quantized first/second moment sums, one output row per upper-triangle
    * (i, j), i ≤ j: (i, j, n, sx, sy, sxy) — everything a covariance needs,
    * all BIGINT-exact. cov(i,j) = (sxy/n − sx·sy/n²)/scale².
    *
    * Overflow contract: per-row products are (|x|·scale)² — Long holds
    * Σ over n rows while n · (max|x| · scale)² < 2⁶³ (e.g. unit-normalized
    * inputs at the default scale leave headroom for ~10⁵⁰ rows; |x| ~ 10³
    * overflows after ~10⁵). The aggregator uses Math.addExact/multiplyExact
    * throughout, so breaching the bound throws instead of silently
    * wrapping to a wrong covariance. */
  def momentSums(df: DataFrame, vecCol: String, dim: Int,
                 scale: Long = 10000L): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val spark = df.sparkSession
    import spark.implicits._
    val q = df
      .select(transform(col(vecCol),
        x => floor(x.cast("double") * scale).cast("long")).as("q"))
      .as[Array[Long]]
    // Dataset[MomentBuf] → its product fields flatten to (n, s1, s2).
    val m = q.select(new MomentAggregator(dim).toColumn).toDF("n", "s1", "s2")
    // Triangular buffer index for (i,j), i<=j, 0-based:
    //   t(i,j) = i·d − i(i−1)/2 + (j−i)   (1-based for element_at).
    m.select(col("n"), col("s1"), col("s2"),
        explode(sequence(lit(0), lit(dim - 1))).as("i"))
      .select(col("n"), col("s1"), col("s2"), col("i"),
        explode(sequence(col("i"), lit(dim - 1))).as("j"))
      .select(col("i").cast("int").as("i"), col("j").cast("int").as("j"),
        col("n"),
        element_at(col("s1"), col("i").cast("int") + 1).as("sx"),
        element_at(col("s1"), col("j").cast("int") + 1).as("sy"),
        element_at(col("s2"),
          expr(s"CAST(i * $dim - (i * (i - 1)) DIV 2 + j - i + 1 AS INT)"))
          .as("sxy"))
  }

  /** Fitted model: `components(k)` is the k-th principal axis (unit-norm
    * rows, eigenvalue-descending), `eigenvalues(k)` its variance (in the
    * UNQUANTIZED input units), `mean` the per-dim data mean. */
  case class PcaModel(n: Long, mean: Array[Double],
                      eigenvalues: Array[Double],
                      components: Array[Array[Double]])

  /** Eigendecompose the covariance implied by a [[momentSums]] frame.
    * Collects the d(d+1)/2 moment rows — driver state is O(d²) by contract
    * (the same bound as the aggregation buffer), NOT data-sized. */
  def fit(moments: DataFrame, dim: Int, scale: Long = 10000L): PcaModel = {
    val rows = moments.select("i", "j", "n", "sx", "sy", "sxy").collect()
    require(rows.nonEmpty, "fit: empty moments frame")
    val n = rows.head.getLong(2)
    require(n >= 2, s"fit: need >= 2 rows, got $n")
    val cov = Array.ofDim[Double](dim, dim)
    val mean = new Array[Double](dim)
    val s2 = scale.toDouble * scale.toDouble
    rows.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1)
      val sx = r.getLong(3); val sy = r.getLong(4); val sxy = r.getLong(5)
      val c = (sxy.toDouble / n - sx.toDouble * sy.toDouble / (n.toDouble * n)) / s2
      cov(i)(j) = c; cov(j)(i) = c
      if (i == j) mean(i) = sx.toDouble / n / scale
    }
    val (values, vectors) = jacobiEigen(cov)
    // Sign convention: largest-|component| entry positive (eigenvectors are
    // sign-ambiguous; pin one so fits are reproducible run-to-run).
    vectors.foreach { v =>
      var am = 0; var i = 1
      while (i < v.length) { if (math.abs(v(i)) > math.abs(v(am))) am = i; i += 1 }
      if (v(am) < 0) { var k = 0; while (k < v.length) { v(k) = -v(k); k += 1 } }
    }
    PcaModel(n, mean, values, vectors)
  }

  /** Project each row onto the top-k principal axes: (id, pc, value) —
    * value = (x − mean)·component_pc, divided by √eigenvalue when
    * `whiten` (unit-variance components — the PCA-whitening preprocessing
    * for downstream similarity/clustering). The model rides into the plan
    * as LITERAL arrays (k·d doubles — a broadcast-by-construction
    * constant); per row this is k codegen'd dot products, no shuffle, no
    * UDF. */
  def project(df: DataFrame, idCol: String, vecCol: String,
              model: PcaModel, k: Int, whiten: Boolean = false): DataFrame = {
    require(k >= 1 && k <= model.components.length,
      s"k must be in [1, ${model.components.length}], got $k")
    if (whiten) (0 until k).foreach(p => require(model.eigenvalues(p) > 0,
      s"whiten: eigenvalue $p is ${model.eigenvalues(p)} (not positive)"))
    val comps = (0 until k).map { p =>
      val v = model.components(p)
      val scaleBy = if (whiten) 1.0 / math.sqrt(model.eigenvalues(p)) else 1.0
      // (x − mean)·v = x·v − mean·v: fold the constant half on the driver.
      val bias = v.indices.map(i => v(i) * model.mean(i)).sum
      val vLit = array(v.toIndexedSeq.map(lit(_)): _*)
      struct(lit(p).as("pc"),
        ((graft.functions.VectorFunctions.dot(col(vecCol), vLit) - bias)
          * scaleBy).as("value"))
    }
    df.select(col(idCol), explode(array(comps: _*)).as("_p"))
      .select(col(idCol), col("_p.pc").as("pc"), col("_p.value").as("value"))
  }

  /** All-but-the-top common-component removal (Mu & Viswanath 2018): center
    * each vector and subtract its projection onto the top `k` principal
    * axes — the standard post-processing that strips the corpus-wide
    * "common direction" dominating contextual/averaged embeddings
    * (Ethayarajh 2019) and measurably improves retrieval cosine quality.
    * Composes [[fit]]'s model into a pure per-row map: the k axes and the
    * mean ride in as literals (broadcast-by-construction), each row pays
    * k+1 codegen'd dot products and one `zip_with` — no shuffle, no UDF,
    * embarrassingly parallel at any scale.
    *
    * Output: input columns with `vecCol` replaced by the corrected vector
    * (double array). Note ABTT does NOT re-add the mean (the paper's D=k
    * post-processing): downstream cosine is computed on the centered,
    * top-k-deflated residual. */
  def removeTopComponents(df: DataFrame, vecCol: String,
                          model: PcaModel, k: Int): DataFrame = {
    require(k >= 1 && k <= model.components.length,
      s"k must be in [1, ${model.components.length}], got $k")
    val meanLit = array(model.mean.toIndexedSeq.map(lit(_)): _*)
    val vLits = (0 until k).map(p =>
      array(model.components(p).toIndexedSeq.map(lit(_)): _*))
    // Staged through named columns so the expression tree stays LINEAR in k:
    // embedding each dot under the next zip_with would copy the centered
    // subtree O(3^k) times through the fold.
    val withC = df.withColumn("_abtt_c",
      zip_with(col(vecCol).cast("array<double>"), meanLit, (x, m) => x - m))
    // axes are orthonormal, so per-axis projections of the ORIGINAL centered
    // vector subtract independently (no sequential deflation needed)
    val withP = (0 until k).foldLeft(withC) { (d2, p) =>
      d2.withColumn(s"_abtt_p$p",
        graft.functions.VectorFunctions.dot(col("_abtt_c"), vLits(p)))
    }
    val corrected = (0 until k).foldLeft(col("_abtt_c")) { (acc, p) =>
      zip_with(acc, vLits(p), (a, vv) => a - col(s"_abtt_p$p") * vv)
    }
    withP.withColumn(vecCol, corrected)
      .drop("_abtt_c" +: (0 until k).map(p => s"_abtt_p$p"): _*)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix — returns
    * (eigenvalues desc, matching unit eigenvectors as rows). O(d³) per
    * sweep, converges quadratically; deterministic (fixed sweep order, no
    * pivot search randomness). Driver-side by design: d is the EMBEDDING
    * dimension, not the corpus size. */
  private[operators] def jacobiEigen(
      a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-14 && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val base = math.abs(theta) + math.sqrt(theta * theta + 1.0)
            val t = if (theta >= 0.0) 1.0 / base else -1.0 / base
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vpk = v(p)(k); val vqk = v(q)(k)
              v(p)(k) = c * vpk - s * vqk
              v(q)(k) = s * vpk + c * vqk
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)).toArray, order.map(i => v(i).clone()).toArray)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0; val d = a.length
    var i = 0
    while (i < d) {
      var j = i + 1
      while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }
}
