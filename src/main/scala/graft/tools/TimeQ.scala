package graft.tools
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    for (n <- graft.SparkEntry.queries.keys.toSeq.sorted if only.forall(_.contains(n))) {
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(n)(spark, dir).count()
      catch { case e: Throwable => println(s"$n ERROR ${e.getMessage.take(60)}") }
      println(f"$n%-26s ${(System.nanoTime()-t0)/1e9}%7.1f s")
    }
    spark.stop()
  }
}
