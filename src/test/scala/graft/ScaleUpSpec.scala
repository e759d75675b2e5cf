package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Every rehearsal conclusion in SCALE.md rests on ScaleUp's declared
  * invariants — this spec makes them falsifiable at factor 3 on
  * sf0.001:
  *
  *  1. row counts scale ×factor (dims excepted),
  *  2. referential integrity: FK joins match exactly ×factor,
  *  3. replica 0 is the identity (literal ids keep resolving),
  *  4. replicas are not near-duplicates (disjoint token sets,
  *     norm-preserving rotated embeddings),
  *  5. timestamps keep their range (per-window density grows).
  */
class ScaleUpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val src = TestSpark.sf0001
  private lazy val dst = {
    val d = java.nio.file.Files.createTempDirectory("scaleup-spec").toString
    ScaleUp.run(spark, src, d, 3)
    d
  }

  private def t(dir: String, name: String) =
    spark.read.parquet(s"$dir/$name.parquet")

  test("row counts scale by the factor; dims stay fixed") {
    for (n <- Seq("customer", "orders", "lineitem", "events", "documents", "embeddings"))
      assert(t(dst, n).count() === 3 * t(src, n).count(), n)
    for (n <- Seq("region", "nation"))
      assert(t(dst, n).count() === t(src, n).count(), n)
  }

  test("referential integrity: FK joins match exactly x factor") {
    def joined(dir: String) = t(dir, "lineitem")
      .join(t(dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(t(dir, "customer"), $"o_custkey" === $"c_custkey")
      .count()
    assert(joined(dst) === 3 * joined(src))
    // no dangling keys in the scaled lineitem
    val dangling = t(dst, "lineitem")
      .join(t(dst, "orders"), $"l_orderkey" === $"o_orderkey", "left_anti").count()
    assert(dangling === 0L)
  }

  test("replica 0 is the identity") {
    val srcDocs = t(src, "documents").select($"doc_id", $"text")
      .as[(Long, String)].collect().toMap
    val maxId = srcDocs.keys.max
    val rep0 = t(dst, "documents").filter($"doc_id" <= maxId)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(rep0 === srcDocs)
  }

  test("replicas are not near-duplicates: disjoint vocabularies, rotated embeddings") {
    val docS = t(src, "documents").agg(max($"doc_id")).head.getLong(0) + 1
    val vocab = (r: Int) => t(dst, "documents")
      .filter($"doc_id" >= lit(r * docS) && $"doc_id" < lit((r + 1) * docS))
      .select(explode(split($"text", " ")).as("tok")).distinct()
    // replica 1's token set shares nothing with replica 0's
    assert(vocab(1).join(vocab(0), Seq("tok")).count() === 0L)
    // embeddings: norm preserved under the circular shift
    val vecS = t(src, "embeddings").agg(max($"vec_id")).head.getLong(0) + 1
    val norms = t(dst, "embeddings")
      .withColumn("rep", ($"vec_id" / lit(vecS)).cast("long"))
      .withColumn("base", $"vec_id" % lit(vecS))
      .groupBy($"base")
      .agg(countDistinct(expr(
        "CAST(aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS DECIMAL(20,6))"))
        .as("distinct_norms"))
    assert(norms.filter($"distinct_norms" =!= 1L).count() === 0L,
      "circular shift must preserve the vector norm")
  }

  test("time axes keep their range (density grows, not the calendar)") {
    def range(dir: String) = t(dir, "orders")
      .agg(min($"o_orderdate"), max($"o_orderdate")).head
    assert(range(dst) === range(src))
  }
}
