package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** One-off stage-by-stage timing probe for the x13 jaccard pipeline —
  * finds where the cold-path seconds go at sf0.1. */
object ProbeX13 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    import graft.ops.TrainingOps._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val k = 9
    val n = normText(col("text"))
    val sh = transform(
      sequence(lit(1), greatest(length(n) - (k - 1), lit(1))),
      i => substring(n, i.cast("int"), lit(k)))
    val base = docs.select(col("doc_id"), array_distinct(sh).as("sh"))
      .select(col("doc_id"), col("sh"),
        transform(col("sh"),
          s => conv(substring(md5(s), 1, 8), 16, 10).cast(LongType)).as("hl"))
      .persist()
    time("fill base cache")(base.count())
    val mhCols = JacA.indices.map { i =>
      array_min(transform(col("hl"),
        x => pmod(x * JacA(i) + JacB(i), lit(JacP)))).as(s"m$i")
    }
    val sigs = base.select((col("doc_id") +: mhCols): _*)
    time("sigs over cached base")(sigs.count())
    val bands = sigs.select(col("doc_id"),
      explode(array(
        struct(lit(0).as("band"),
          concat_ws(":", col("m0"), col("m1"), col("m2"), col("m3")).as("key")),
        struct(lit(1).as("band"),
          concat_ws(":", col("m4"), col("m5"), col("m6"), col("m7")).as("key"))
      )).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.key").as("key"))
    val cands = bands.select(col("band"), col("key"), col("doc_id").as("id_a"))
      .join(bands.select(col("band"), col("key"), col("doc_id").as("id_b")), Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    time("cands")(println("  cands=" + cands.count()))
    val shingleSets = base.select(col("doc_id"), col("sh"))
    val verified = cands
      .join(shingleSets.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(shingleSets.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
          / size(array_union(col("sh_a"), col("sh_b"))), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .orderBy("id_a", "id_b")
    time("verify+sort")(verified.count())
    time("full checkpoint of verified")(verified.localCheckpoint(true))
    base.unpersist()
    // end-to-end fresh, as the operator runs it
    time("e2e jaccardNearDupPairs")(jaccardNearDupPairs(docs).count())
    time("e2e again (cold cache)")(jaccardNearDupPairs(docs).count())
    spark.stop()
  }
}
