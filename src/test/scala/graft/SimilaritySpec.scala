package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  test("cosine of unit vectors") {
    val df = Seq(
      (1L, vec(1, 0, 0), vec(1, 0, 0), 1.0),
      (2L, vec(1, 0, 0), vec(0, 1, 0), 0.0),
      (3L, vec(1, 1, 0), vec(1, 0, 0), 1.0 / math.sqrt(2))
    ).toDF("id", "a", "b", "expected")
    df.select(Similarity.cosine(col("a"), col("b")).as("c"), col("expected")).collect()
      .foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }

  test("brute-force top-k ranks by cosine with id tie-break") {
    val corpus = Seq(
      (1L, vec(1, 0)), (2L, vec(0.9, 0.1)), (3L, vec(0, 1)), (10L, vec(1, 0.01))
    ).toDF("vec_id", "embedding")
    val queries = Seq((10L, vec(1, 0.01))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(corpus, queries, 2)
      .orderBy("rank").select("vec_id").as[Long].collect()
    assert(top.toSeq === Seq(1L, 2L))
  }

  test("IVF top-k has high recall vs brute force on real embeddings") {
    val e = sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.where(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(e, q, 5)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(e, q, dim = 64, nCells = 8, nProbe = 4, k = 5)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall > 0.4, s"recall=$recall") // random noise embeddings; probing half the cells
    // full-probe IVF must equal brute force exactly
    val full = Similarity.ivfTopK(e, q, dim = 64, nCells = 8, nProbe = 8, k = 5)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full === brute)
  }

  test("LSH buckets identical vectors together") {
    val corpus = Seq((1L, vec(1, 0, 0, 0)), (2L, vec(1, 0, 0, 0)), (3L, vec(-1, 0, 0, 0)))
      .toDF("vec_id", "embedding")
    val sigs = corpus.withColumn("b", Similarity.hyperplaneSignature(col("embedding"), 4, 8))
      .select("vec_id", "b").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) !== sigs(3L))
  }
}
