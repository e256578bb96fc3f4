package graft

/** Dev utility: print the executed physical plan of one SparkEntry
  * query — `runMain graft.PlanDump <sfDir> <query>`. The fastest way to
  * audit a plan shape (pushdown, join strategy, exchange reuse) before
  * pinning it in PlanSpec.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config(new org.apache.spark.SparkConf().setAll(Tables.sessionConfs))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(SparkEntry.queries(args(1))(spark, args(0))
      .queryExecution.executedPlan.toString)
    spark.stop()
  }
}
