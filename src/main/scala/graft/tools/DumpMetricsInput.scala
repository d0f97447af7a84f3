package graft.tools

import org.apache.spark.sql.SparkSession

/** Regenerates the committed x02 oracle golden: the NARROW per-turn
  * metric columns of the full extraction at sf0.01
  * (src/test/resources/x01_metrics_input_sf0.01.csv). x02's metrics
  * aggregation is pure relational over x01's output, so DuckDB can
  * oracle it by grouping this table (round-2 VERDICT next #6); x01
  * itself stays golden-verified against the reference (1,003 turns).
  * Deterministic: extraction is a pure function of the input, so the
  * file is stable across regenerations.
  *
  * Usage: runMain graft.tools.DumpMetricsInput /root/testdata/sf0.01 \
  *          src/test/resources/x01_metrics_input_sf0.01.csv
  */
object DumpMetricsInput {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outCsv) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = graft.Pipeline
      .extractTurns(graft.Pipeline.turnsFromDocuments(spark, sfDir))
      .collect()
      .sortBy(r => (r.conv_id, r.turn_idx))
    val sb = new StringBuilder(
      "conv_id,turn_idx,payload_kind,status,detected_language,n_chars,n_tokens\n")
    for (r <- rows)
      sb.append(s"${r.conv_id},${r.turn_idx},${r.payload_kind},${r.status}," +
        s"${r.detected_language},${r.n_chars},${r.n_tokens}\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outCsv), sb.toString)
    println(s"[dump] wrote ${rows.length} rows to $outCsv")
    spark.stop()
  }
}
