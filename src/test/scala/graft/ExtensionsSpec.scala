package graft

import graft.operators.Salting
import graft.plans.GraftFunctions
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("dot_product is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .as[Double].head()
    assert(got == 32.0)
    // works over float arrays from parquet too
    spark.read.parquet(sf("embeddings")).limit(3).createOrReplaceTempView("e")
    val self = spark.sql("SELECT dot_product(embedding, embedding) FROM e")
      .as[Double].collect()
    assert(self.forall(v => math.abs(v - 1.0) < 1e-5)) // unit vectors
  }

  test("cosine_sim is callable from SQL and matches the Column-level cosine") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS c").as[Double].head()
    assert(got == 0.0)
    val same = spark.sql(
      "SELECT cosine_sim(array(2.0D, 3.0D), array(4.0D, 6.0D)) AS c").as[Double].head()
    assert(math.abs(same - 1.0) < 1e-12)
    spark.read.parquet(sf("embeddings")).limit(5).createOrReplaceTempView("e2")
    val sqlSide = spark.sql("SELECT cosine_sim(embedding, embedding) FROM e2")
      .as[Double].collect()
    assert(sqlSide.forall(v => math.abs(v - 1.0) < 1e-6))
  }

  test("salted collect_set / count-distinct match the direct aggregates") {
    val df = (1 to 2000).map(i => (if (i % 10 == 0) "hot" else s"k${i % 50}", i % 97))
      .toDF("key", "v")
    val direct = df.groupBy("key")
      .agg(sort_array(collect_set(col("v"))).as("vs"), countDistinct(col("v")).as("n_v"))
      .collect().map(r => r.getString(0) -> (r.getSeq[Int](1), r.getLong(2))).toMap
    val salted = Salting.saltedCollectSet(df, "key", "v", buckets = 8)
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    val saltedN = Salting.saltedCountDistinct(df, "key", "v", buckets = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    direct.foreach { case (k, (vs, n)) =>
      assert(salted(k) == vs, s"key $k")
      assert(saltedN(k) == n, s"key $k")
    }
  }
}
