package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational 2-D convolution — the im2col-as-join spelling of the
  * reference's Conv2D (declared but stubbed there:
  * /root/reference/simulator/sim_reflex.py:93-97 `cim_conv2d ...
  * pass`; layer plumbing /root/reference/mlir_compiler/
  * codegen_cim.py:194-240). Implemented here because a user of the
  * engine expects the op to exist even though the reference never
  * finished it.
  *
  * Feature maps are COO rows `(img_id, c, y, x, v)` and the kernel is
  * a table `(oc, ic, ky, kx, w)` — the sparse-friendly relational
  * layout (zero pixels/weights can simply be absent, the same
  * density-adaptive trick as MatMul.cooSparse). The convolution is
  * one equi-join on channel plus an aggregation on the output
  * coordinate:
  *
  *   out(img, oc, oy, ox) = Σ_{ic,ky,kx} in(img, ic, oy+ky, ox+kx) · w(oc, ic, ky, kx)
  *
  * Scale shape: the join shuffles on the channel key (kernel side is
  * tiny → broadcast), the aggregation shuffles on (img, oc, oy, ox);
  * both distribute over images with no per-task state beyond the
  * aggregation buffer. Valid-mode bounds are a pushed-down filter. */
object Conv2d {

  /** Valid-mode convolution. `height`/`width` are the input map
    * bounds; `kh`/`kw` the kernel extent. */
  def conv2dValid(input: DataFrame, kernel: DataFrame,
                  height: Int, width: Int, kh: Int, kw: Int): DataFrame = {
    val joined = input.join(broadcast(kernel), col("c") === col("ic"))
    joined
      .select(col("img_id"), col("oc"),
        (col("y") - col("ky")).as("oy"),
        (col("x") - col("kx")).as("ox"),
        (col("v") * col("w")).as("p"))
      .filter(col("oy") >= 0 && col("oy") <= height - kh &&
        col("ox") >= 0 && col("ox") <= width - kw)
      .groupBy(col("img_id"), col("oc"), col("oy"), col("ox"))
      .agg(sum(col("p")).as("v"))
  }

  /** Kernel table from a dense weight array `w(oc)(ic)(ky)(kx)`. */
  def kernelTable(spark: org.apache.spark.sql.SparkSession,
                  w: Array[Array[Array[Array[Double]]]]): DataFrame = {
    import spark.implicits._
    (for {
      oc <- w.indices; ic <- w(oc).indices
      ky <- w(oc)(ic).indices; kx <- w(oc)(ic)(ky).indices
    } yield (oc, ic, ky, kx, w(oc)(ic)(ky)(kx)))
      .toDF("oc", "ic", "ky", "kx", "w")
  }
}
