package graft.tools
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (n <- graft.SparkEntry.queries.keys.toSeq.sorted) {
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(n)(spark, dir).count()
      catch { case e: Throwable => println(s"$n ERROR ${e.getMessage.take(60)}") }
      println(f"$n%-26s ${(System.nanoTime()-t0)/1e9}%7.1f s")
    }
    spark.stop()
  }
}
