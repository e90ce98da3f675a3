package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** eng_mlp_forward differential test: the distributed per-row forward
  * pass (FC+ReLU → FC → softmax → argmax/conf) must match an
  * independent plain-Scala implementation bit-for-bit on real
  * embedding rows — the same discipline as the transformer-block
  * specs. */
class MlpForwardSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Independent forward pass (no Spark expressions). */
  private def forward(x: Array[Double]): (Int, Double) = {
    def fc(v: Array[Double], w: Array[Array[Double]], b: Array[Double],
           relu: Boolean): Array[Double] =
      w.indices.map { o =>
        var s = 0.0
        var i = 0
        while (i < v.length) { s += v(i) * w(o)(i); i += 1 }
        val pre = s + b(o)
        if (relu) math.max(pre, 0.0) else pre
      }.toArray
    val z = fc(fc(x, MlpWeights.w1, MlpWeights.b1, relu = true),
      MlpWeights.w2, MlpWeights.b2, relu = false)
    // stable softmax, same composition as vecSoftmax
    val m = z.max
    val e = z.map(v => math.exp(v - m))
    val p = e.map(_ / e.sum)
    val best = p.max
    (p.indexOf(best) + 1, best) // 1-based like array_position
  }

  test("distributed forward pass matches plain Scala per row") {
    val rows = Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).limit(64).collect()
    val expected = rows.map { r =>
      val x = r.getSeq[Float](1).map(_.toDouble).toArray
      r.getLong(0) -> forward(x)
    }.toMap

    import graft.functions.VectorFunctions
    val emb = Tables.table(spark, dir, "embeddings").limit(64)
    val x = emb.select(col("vec_id"), VectorFunctions.vecToDouble(col("embedding")).as("x"))
    val h = operators.MatMul.fcLayer(x, "x", MlpWeights.w1, MlpWeights.b1, relu = true)
      .select(col("vec_id"), col("fc_out").as("h"))
    val z = operators.MatMul.fcLayer(h, "h", MlpWeights.w2, MlpWeights.b2, relu = false)
      .select(col("vec_id"), col("fc_out").as("z"))
    val got = z.select(col("vec_id"), VectorFunctions.vecSoftmax(col("z")).as("p"))
      .select(col("vec_id"),
        expr("array_position(p, array_max(p))").cast("int").as("cls"),
        expr("array_max(p)").as("conf"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap

    assert(got.keySet == expected.keySet)
    got.foreach { case (id, (cls, conf)) =>
      val (eCls, eConf) = expected(id)
      assert(cls == eCls, s"vec $id: class $cls != $eCls")
      assert(math.abs(conf - eConf) < 1e-12, s"vec $id: conf $conf != $eConf")
    }
  }

  /** Independent int8 forward pass (per-channel weight quant, per-row
    * activation quant, integer accumulate, dequant) — mirrors
    * eng_mlp_forward_int8's math exactly. */
  private def forwardInt8(x: Array[Double]): Array[Double] = {
    def chanQuant(w: Array[Array[Double]]) = {
      val s = w.map(r => math.max(r.map(math.abs).max, 1e-12) / 127.0)
      (w.zip(s).map { case (r, si) => r.map(v => math.rint(v / si)) }, s)
    }
    def layer(v: Array[Double], w: Array[Array[Double]], b: Array[Double],
              relu: Boolean): Array[Double] = {
      val (wq, sw) = chanQuant(w)
      val sx = math.max(v.map(math.abs).max, 1e-12) / 127.0
      val xq = v.map(e => math.max(-127.0, math.min(127.0, math.rint(e / sx))))
      wq.indices.map { o =>
        var acc = 0.0
        var i = 0
        while (i < xq.length) { acc += xq(i) * wq(o)(i); i += 1 }
        val pre = acc * sx * sw(o) + b(o)
        if (relu) math.max(pre, 0.0) else pre
      }.toArray
    }
    layer(layer(x, MlpWeights.w1, MlpWeights.b1, relu = true),
      MlpWeights.w2, MlpWeights.b2, relu = false)
  }

  test("int8 consistency report matches a plain-Scala quantized pass") {
    val rows = Tables.table(spark, dir, "embeddings")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    // expected report from the independent implementation
    def fwdFloat(x: Array[Double]): Array[Double] = {
      def fc(v: Array[Double], w: Array[Array[Double]], b: Array[Double], relu: Boolean) =
        w.indices.map { o =>
          val s = v.indices.map(i => v(i) * w(o)(i)).sum + b(o)
          if (relu) math.max(s, 0.0) else s
        }.toArray
      fc(fc(x, MlpWeights.w1, MlpWeights.b1, relu = true),
        MlpWeights.w2, MlpWeights.b2, relu = false)
    }
    val per = rows.map { x =>
      val zf = fwdFloat(x)
      val zq = forwardInt8(x)
      val agree = zf.indexOf(zf.max) == zq.indexOf(zq.max)
      val d = zf.zip(zq).map { case (a, b) => math.abs(a - b) }.max
      (agree, d)
    }
    val expAgree = math.rint(per.count(_._1).toDouble / per.length * 1e4) / 1e4
    val expMax = math.rint(per.map(_._2).max * 1e4) / 1e4

    val r = EngineOps.queries("eng_mlp_forward_int8")(spark, dir).collect()(0)
    assert(r.getAs[Long]("n") == rows.length)
    assert(r.getAs[Double]("class_agree") == expAgree,
      s"agree ${r.getAs[Double]("class_agree")} != $expAgree")
    assert(r.getAs[Double]("max_dlogit") == expMax,
      s"max_dlogit ${r.getAs[Double]("max_dlogit")} != $expMax")
    // the int8 path must be USEFULLY consistent, not just self-consistent
    assert(r.getAs[Double]("class_agree") >= 0.95)
  }

  test("eng_mlp_forward report covers every predicted class with sane confidences") {
    val rows = EngineOps.queries("eng_mlp_forward")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 4)
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == Tables.table(spark, dir, "embeddings").count())
    rows.foreach { r =>
      val avg = r.getAs[Double]("avg_conf")
      assert(avg >= 0.25 - 1e-9 && avg <= 1.0) // >= uniform over 4 classes
    }
  }
}
