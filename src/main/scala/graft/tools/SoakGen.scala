package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Materializes a large soak input: the sf documents-derived turns
  * replicated `repl`× with distinct conv ids, written as a turns
  * parquet for `graft.Run` end-to-end drills. */
object SoakGen {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/soak_turns"
    val repl = if (args.length > 2) args(2).toInt else 20
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .appName("soak-gen")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = graft.Pipeline.turnsFromDocuments(spark, sfDir).repartition(64)
    base.withColumn("r", explode(sequence(lit(0), lit(repl - 1))))
      .withColumn("conv_id", concat(col("conv_id"), lit("-r"), col("r")))
      .drop("r")
      .write.mode("overwrite").parquet(out)
    println(s"wrote ${spark.read.parquet(out).count()} turns to $out")
    spark.stop()
  }
}
