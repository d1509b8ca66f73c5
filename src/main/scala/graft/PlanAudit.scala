package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (q <- args) {
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      val ex = plan.linesIterator.count(_.contains("Exchange"))
      val bj = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
      val smj = plan.linesIterator.count(_.contains("SortMergeJoin"))
      val nl = plan.linesIterator.count(l => l.contains("BroadcastNestedLoop") || l.contains("CartesianProduct"))
      val scans = plan.linesIterator.count(_.contains("FileScan"))
      println(s"[plan] $q exchanges=$ex bhj=$bj smj=$smj nestedloop=$nl scans=$scans")
      if (nl > 0) println(plan.linesIterator.filter(l => l.contains("NestedLoop") || l.contains("Cartesian")).mkString("\n"))
    }
    spark.stop()
  }
}
