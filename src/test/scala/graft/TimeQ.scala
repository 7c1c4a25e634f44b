// quick timing harness: run named queries at a SF dir, print seconds
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", false)
      .appName("timeq").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.1")
    val names = args.toSeq
    // warmup
    graft.SparkEntry.queries("dd1_dedup_exact")(spark, dir).collect()
    names.foreach { n =>
      val t0 = System.nanoTime()
      // count, not collect: scale-smoke queries can emit tens of
      // millions of rows, which must execute but not sit in driver heap
      val c = graft.SparkEntry.queries(n)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"TIMEQ $n%-28s $sec%8.3f s  rows=$c")
    }
    spark.stop()
  }
}
