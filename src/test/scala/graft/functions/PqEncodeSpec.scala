package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** PqEncodeExpr behavior matrix: value identity with the driver-side
  * model of the exchange formulation it replaced (same fold order,
  * same r4 floor sequence, same (distance, codeword) argmin
  * tie-break), edge shapes (m=1, C=1), and the null/shape contract.
  * The s09/s18/s19 oracles certify the full pipeline end to end; this
  * spec pins the kernel in isolation so a regression localizes. */
class PqEncodeSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side model of the OLD enc/codes pipeline: per subspace j,
    * argmin over codewords of r4(Σ(sv_d − cw_d)² left-to-right), ties
    * to the lowest codeword id; vnorm2 = Σ_j norm2(j, code_j) in j
    * order. */
  private def model(emb: Array[Double], cw: Array[Double],
      n2: Array[Double], m: Int, cs: Int): (Seq[Long], Double) = {
    val w = cw.length / (m * cs)
    var vnorm2 = 0.0
    val codes = (0 until m).map { j =>
      var bestD = Double.PositiveInfinity
      var bestC = 0
      for (c <- 0 until cs) {
        var acc = 0.0
        for (d <- 0 until w) {
          val diff = emb(j * w + d) - cw((j * cs + c) * w + d)
          acc += diff * diff
        }
        val dr = math.floor(acc * 10000.0 + 0.5).toLong / 10000.0
        if (dr < bestD) { bestD = dr; bestC = c }
      }
      vnorm2 += n2(j * cs + bestC)
      bestC.toLong
    }
    (codes, vnorm2)
  }

  private def runKernel(rows: Seq[(Array[Double], Array[Double], Array[Double])],
      m: Int, cs: Int): Seq[Row] =
    rows.toDF("emb", "cw", "n2")
      .select(PqEncode(col("emb"), col("cw"), col("n2"), m, cs).as("pe"))
      .select(col("pe.codes"), col("pe.vnorm2"))
      .collect().toSeq

  test("matches the exchange-formulation model on randomized vectors") {
    val rnd = new scala.util.Random(42)
    for ((m, cs, w) <- Seq((8, 16, 8), (4, 3, 5), (2, 16, 1))) {
      val cw = Array.fill(m * cs * w)(rnd.nextDouble() * 2 - 1)
      val n2 = Array.fill(m * cs)(rnd.nextDouble() * 4)
      val rows = Seq.fill(20)(
        (Array.fill(m * w)(rnd.nextDouble() * 2 - 1), cw, n2))
      val got = runKernel(rows, m, cs)
      rows.zip(got).foreach { case ((emb, _, _), r) =>
        val (codes, vn) = model(emb, cw, n2, m, cs)
        assert(r.getSeq[Long](0) == codes, s"m=$m cs=$cs codes")
        assert(r.getDouble(1) == vn, s"m=$m cs=$cs vnorm2 (exact doubles)")
      }
    }
  }

  test("argmin ties break to the LOWEST codeword id") {
    // two identical codewords: equal r4 distance, c=0 must win;
    // a third, farther codeword must not interfere
    val cw = Array(1.0, 1.0, /* c=1 identical */ 1.0, 1.0, /* c=2 */ 9.0, 9.0)
    val n2 = Array(2.0, 3.0, 162.0)
    val got = runKernel(Seq((Array(1.1, 0.9), cw, n2)), 1, 3)
    assert(got.head.getSeq[Long](0) == Seq(0L))
    assert(got.head.getDouble(1) == 2.0)
  }

  test("m=1, codebookSize=1 degenerates to code 0 and that codeword's norm2") {
    val got = runKernel(Seq((Array(5.0, 6.0), Array(0.0, 0.0), Array(7.5))), 1, 1)
    assert(got.head.getSeq[Long](0) == Seq(0L) && got.head.getDouble(1) == 7.5)
  }

  test("null/shape contract: null inputs and mismatched dims yield null") {
    val df = Seq(
      (Some(Array(1.0, 2.0)), Some(Array(1.0, 2.0)), Some(Array(1.0))), // ok
      (None, Some(Array(1.0, 2.0)), Some(Array(1.0))),                  // null emb
      (Some(Array(1.0, 2.0, 3.0)), Some(Array(1.0, 2.0)), Some(Array(1.0))), // dim mismatch
      (Some(Array(1.0, 2.0)), Some(Array(1.0, 2.0)), Some(Array(1.0, 9.0)))  // |n2| != m·C
    ).toDF("emb", "cw", "n2")
      .select(PqEncode(col("emb"), col("cw"), col("n2"), 1, 1).as("pe"))
    val rows = df.collect()
    assert(!rows(0).isNullAt(0) && rows(1).isNullAt(0) &&
      rows(2).isNullAt(0) && rows(3).isNullAt(0))
  }

  test("float and double embeddings produce identical codes (exact cast)") {
    val rnd = new scala.util.Random(7)
    val cw = Array.fill(2 * 4 * 3)(rnd.nextDouble())
    val n2 = Array.fill(2 * 4)(rnd.nextDouble())
    val embF = Array.fill(2 * 3)(rnd.nextFloat())
    val fDf = Seq((embF, cw, n2)).toDF("emb", "cw", "n2")
      .select(PqEncode(col("emb"), col("cw"), col("n2"), 2, 4).as("pe"))
    val dDf = Seq((embF.map(_.toDouble), cw, n2)).toDF("emb", "cw", "n2")
      .select(PqEncode(col("emb"), col("cw"), col("n2"), 2, 4).as("pe"))
    assert(fDf.collect().toSeq == dDf.collect().toSeq)
  }
}
