// dump ONE query's result + oracle sql for fast local iteration
import org.apache.spark.sql.SparkSession
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args.take(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", false).appName("verify1").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    // escape per RFC 8259: backslash, quote, and ALL control chars
    val sql = graft.SparkEntry.oracleSql(name).flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < 0x20 => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      s"""{"$name.parquet": "$sql"}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
