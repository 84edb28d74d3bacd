package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing (SURVEY.md §"Partitioning & shuffle"):
  * two tables bucketed by the join key with the same bucket count join
  * WITHOUT either side shuffling — the plan-level evidence that the
  * engine's big fact⋈fact joins can be made exchange-free at 100 TB by
  * bucketing the stored tables on their join keys.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-by-key tables join with no exchange; unbucketed ones shuffle") {
    // warehouse.dir is static — tables land in the default ./spark-warehouse
    // (gitignored) and are dropped at the end
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ/SHJ
    try {
      val fact = (1L to 1000L).map(i => (i % 50, i, i * 2.0)).toDF("k", "id", "v")
      val dim  = (1L to 200L).map(i => (i % 50, s"n$i")).toDF("k", "name")
      fact.write.bucketBy(4, "k").sortBy("k").mode("overwrite").saveAsTable("fact_b")
      dim.write.bucketBy(4, "k").sortBy("k").mode("overwrite").saveAsTable("dim_b")
      fact.write.mode("overwrite").saveAsTable("fact_u")
      dim.write.mode("overwrite").saveAsTable("dim_u")

      val bucketed = spark.table("fact_b").join(spark.table("dim_b"), Seq("k"))
      val plain    = spark.table("fact_u").join(spark.table("dim_u"), Seq("k"))
      val bPlan = bucketed.queryExecution.executedPlan.toString
      val uPlan = plain.queryExecution.executedPlan.toString
      assert(!bPlan.contains("Exchange"), s"bucketed join should not shuffle:\n$bPlan")
      assert(uPlan.contains("Exchange"), s"unbucketed join should shuffle:\n$uPlan")

      // identical results
      val b = bucketed.select("k", "id", "name").collect().map(_.toString).sorted
      val u = plain.select("k", "id", "name").collect().map(_.toString).sorted
      assert(b.toSeq === u.toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      Seq("fact_b", "dim_b", "fact_u", "dim_u").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
