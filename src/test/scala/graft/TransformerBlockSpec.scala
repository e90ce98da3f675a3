package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TransformerBlock

/** Differential test for the composed encoder block: the relational
  * pipeline must match an independent plain-Scala forward pass
  * (the reference's test style — test_sim_reflex.py asserts simulator
  * output against hand-rolled math). */
class TransformerBlockSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val d = 4
  private def mkW(seed: Int): Array[Array[Double]] =
    Array.tabulate(d, d)((o, i) => ((o * 7 + i * 13 + seed) % 11 - 5) / 10.0)
  private def mkB(seed: Int): Array[Double] =
    Array.tabulate(d)(o => ((o * 3 + seed) % 7 - 3) / 10.0)

  // plain-Scala forward pass -----------------------------------------
  private def ln(v: Array[Double]): Array[Double] = {
    val mu = v.sum / v.length
    val va = v.map(x => (x - mu) * (x - mu)).sum / v.length
    v.map(x => (x - mu) / math.sqrt(va + 1e-5))
  }
  private def fc(v: Array[Double], w: Array[Array[Double]], b: Array[Double]) =
    w.indices.map(o => w(o).zip(v).map { case (a, x) => a * x }.sum + b(o)).toArray
  private def gelu(x: Double) =
    0.5 * x * (1 + math.tanh(0.7978845608028654 * (x + 0.044715 * x * x * x)))

  private def forward(xs: Seq[Array[Double]], causal: Boolean): Seq[Array[Double]] = {
    val (wq, wk, wv, wo, wf) = (mkW(1), mkW(2), mkW(3), mkW(4), mkW(5))
    val (bq, bk, bv, bo, bf) = (mkB(1), mkB(2), mkB(3), mkB(4), mkB(5))
    val h = xs.map(ln)
    val q = h.map(fc(_, wq, bq)); val k = h.map(fc(_, wk, bk)); val v = h.map(fc(_, wv, bv))
    val attn = h.indices.map { i =>
      val js = if (causal) 0 to i else h.indices
      val raw = js.map(j => q(i).zip(k(j)).map { case (a, b) => a * b }.sum / math.sqrt(d))
      val mx = raw.max
      val ex = raw.map(r => math.exp(r - mx))
      val wgt = ex.map(_ / ex.sum)
      Array.tabulate(d)(dim => js.zipWithIndex.map { case (j, jj) => wgt(jj) * v(j)(dim) }.sum)
    }
    val h2 = h.indices.map(i => ln(h(i).zip(fc(attn(i), wo, bo)).map { case (a, b) => a + b }))
    h2.map(t => t.zip(fc(t, wf, bf).map(gelu)).map { case (a, b) => a + b })
  }

  private def runBlock(xs: Seq[Array[Double]], causal: Boolean): Seq[Array[Double]] = {
    val tokens = xs.zipWithIndex.map { case (v, p) => (1L, p, v) }.toDF("seq", "pos", "x")
    TransformerBlock.bertTinyBlock(tokens, "seq", "pos", "x",
        mkW(1), mkB(1), mkW(2), mkB(2), mkW(3), mkB(3), mkW(4), mkB(4), mkW(5), mkB(5),
        causal)
      .collect().map(r => r.getInt(1) -> r.getSeq[Double](2).toArray)
      .sortBy(_._1).map(_._2).toSeq
  }

  val xs = Seq(
    Array(0.5, -1.0, 2.0, 0.25),
    Array(-0.75, 0.1, 0.0, 1.5),
    Array(2.0, 2.0, -3.0, 0.5))

  test("block output matches the independent forward pass (full attention)") {
    val got = runBlock(xs, causal = false)
    val exp = forward(xs, causal = false)
    got.zip(exp).foreach { case (g, e) =>
      g.zip(e).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9, s"$a vs $b") }
    }
  }

  test("block output matches the independent forward pass (causal mask)") {
    val got = runBlock(xs, causal = true)
    val exp = forward(xs, causal = true)
    got.zip(exp).foreach { case (g, e) =>
      g.zip(e).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9, s"$a vs $b") }
    }
  }

  test("causal position 0 sees only itself: equals full attention at pos 0 of a 1-token seq") {
    val single = runBlock(xs.take(1), causal = false).head
    val causal0 = runBlock(xs, causal = true).head
    single.zip(causal0).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }

  // ---- NanoLlama decoder layer (multi-head + RMSNorm + SwiGLU) ----

  val hidden = 6
  private def mkRect(rows: Int, cols: Int, seed: Int): Array[Array[Double]] =
    Array.tabulate(rows, cols)((o, i) => ((o * 7 + i * 13 + seed) % 11 - 5) / 10.0)

  private def rms(v: Array[Double]): Array[Double] = {
    val ms = v.map(x => x * x).sum / v.length
    v.map(_ / math.sqrt(ms + 1e-6))
  }
  private def mv(w: Array[Array[Double]], v: Array[Double]): Array[Double] =
    w.map(row => row.zip(v).map { case (a, x) => a * x }.sum)
  private def silu(x: Double) = x / (1 + math.exp(-x))

  private def llamaForward(xs: Seq[Array[Double]], nH: Int,
                           causal: Boolean): Seq[Array[Double]] = {
    val (wq, wk, wv, wo) = (mkRect(d, d, 1), mkRect(d, d, 2), mkRect(d, d, 3), mkRect(d, d, 4))
    val (wg, wu, wd) = (mkRect(hidden, d, 5), mkRect(hidden, d, 6), mkRect(d, hidden, 7))
    val hd = d / nH
    val h = xs.map(rms)
    val q = h.map(mv(wq, _)); val k = h.map(mv(wk, _)); val v = h.map(mv(wv, _))
    val mh = h.indices.map { i =>
      (0 until nH).flatMap { hh =>
        val sl = (a: Array[Double]) => a.slice(hh * hd, (hh + 1) * hd)
        val js = if (causal) 0 to i else h.indices
        val raw = js.map(j => sl(q(i)).zip(sl(k(j))).map { case (a, b) => a * b }.sum / math.sqrt(hd))
        val mx = raw.max
        val ex = raw.map(r => math.exp(r - mx)); val sm = ex.sum
        Array.tabulate(hd)(dim =>
          js.zipWithIndex.map { case (j, jj) => ex(jj) / sm * sl(v(j))(dim) }.sum).toSeq
      }.toArray
    }
    val x1 = xs.indices.map(i => xs(i).zip(mv(wo, mh(i))).map { case (a, b) => a + b })
    x1.map { t =>
      val h2 = rms(t.toArray)
      val mlp = mv(wd, mv(wg, h2).map(silu).zip(mv(wu, h2)).map { case (a, b) => a * b })
      t.zip(mlp).map { case (a, b) => a + b }.toArray
    }
  }

  private def runLlama(xs: Seq[Array[Double]], nH: Int, causal: Boolean): Seq[Array[Double]] = {
    val tokens = xs.zipWithIndex.map { case (v, p) => (1L, p, v) }.toDF("seq", "pos", "x")
    TransformerBlock.llamaBlock(tokens, "seq", "pos", "x", nH,
        mkRect(d, d, 1), mkRect(d, d, 2), mkRect(d, d, 3), mkRect(d, d, 4),
        mkRect(hidden, d, 5), mkRect(hidden, d, 6), mkRect(d, hidden, 7), causal)
      .collect().map(r => r.getInt(1) -> r.getSeq[Double](2).toArray)
      .sortBy(_._1).map(_._2).toSeq
  }

  test("llama block matches the independent forward pass (2 heads, full)") {
    runLlama(xs, 2, causal = false).zip(llamaForward(xs, 2, causal = false)).foreach {
      case (g, e) => g.zip(e).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9, s"$a vs $b") }
    }
  }

  test("llama block matches the independent forward pass (2 heads, causal)") {
    runLlama(xs, 2, causal = true).zip(llamaForward(xs, 2, causal = true)).foreach {
      case (g, e) => g.zip(e).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9, s"$a vs $b") }
    }
  }

  test("single-head llama equals the multi-head spelling with numHeads=1") {
    // degenerate head split must be a no-op relative to full-width attention
    val one = runLlama(xs, 1, causal = true)
    val exp = llamaForward(xs, 1, causal = true)
    one.zip(exp).foreach { case (g, e) =>
      g.zip(e).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) } }
  }
}
