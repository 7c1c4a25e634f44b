package graft

/** Regenerates docs/QUERIES.md from the declared query maps
  * (`sbt "Test/runMain graft.GenQueriesDoc"`) so the inventory can't
  * drift from the code. */
object GenQueriesDoc {
  def main(args: Array[String]): Unit = {
    val groups = Seq(
      ("Aggregation & grouping", "q01|q06|q09|q10|q11|q12|q22|q34|q35|q36|q38|q47|q55|q56|q69|st5"),
      ("Filters & scans", "q02|share_scan|share_pipeline|share_stats|share_agg|share_list|share_changes|share_dv|share_cm|share_topn|share_offset"),
      ("Joins", "q03|q04|q05|q07|q08|q26|q27|q42|q43|q50"),
      ("Subqueries", "q23|q24|q32"),
      ("Window functions", "q13|q14|q15|q25|q37|q41|q48|q53|q63"),
      ("Event analytics", "q61|q64|q65|q66"),
      ("Sort / top-k / set ops", "q16|q17|q30"),
      ("Scalar functions", "q18|q19|q20|q21|q28|q29|q31|q33|q40|q44|q45|q51"),
      ("Sampling", "st6|q49"),
      ("Text analysis", "t01|t02|t03|t04|t05|t06|t07|t08|t09|t10|t11|t12|t13|t14|t15|t16|t17|t18|t19|t20|t22|t23|t24|t25|t26|t27|t28|t29|t30|t31|t32|t33|t34|t35|t36|t37|t38|t39|t40|t41"),
      ("Training-mix, splits & packing", "cr1|cr2|ds1|ds2|ds3|mx1|mx2|mx3|mx4|mx5|mx6|mx7|mx8|mx9|mx10|mx11|tp10|tp11|tp12|tp13|tp1|tp2|tp3|tp4|tp5|tp6|tp7|tp8|tp9"),
      ("Deduplication", "dd10|dd11|dd12|dd13|dd14|dd18|dd19|dd1|dd2|dd3|dd4|dd5|dd6|dd7|dd8|dd9|dd15|dd20|dd16|dd17|dc1|dc2|dc3|dc4|dc5|dc6|dc7"),
      ("Data layout & skew diagnostics", "q52|q54|q57|q59|q67|q68"),
      ("Graph analytics", "q58|q60|q62|q70|q71|q72"),
      ("Similarity search", "ss1|ss2|ss3|ss4|ss5|ss6|ss7|ss8|ss9|ss10|ss11|ss12|ss13|ss14|ss15|ss16|ss17|ss18|ss19|ss20|ss21|ss22|ss23|ss24|ss25|ss26|ss27|ss28|ss29|ss30|ss31"),
      ("Embedding analytics", "ve1|ve2|ve3|ve4|ve5|ve6|ve7|ve8|ve9|ve10|ve11|ve12"),
      ("Multimodal", "m10|m11|m12|m13|m14|m15|m1|m2|m3|m4|m5|m6|m7|m8|m9"),
      ("Streaming batch twins", "st1|st2|st3|st4|st7|st8|st9"))
    val all = SparkEntry.queries.keySet
    val oracle = SparkEntry.oracleSql.keySet
    val sb = new StringBuilder
    sb.append("# Declared query inventory (generated — `sbt \"Test/runMain graft.GenQueriesDoc\"`)\n\n")
    sb.append(s"${all.size} queries; ${oracle.size} oracle-checked against DuckDB")
    val rowsOnly = (all -- oracle).toSeq.sorted
    if (rowsOnly.isEmpty) sb.append(".\n")
    else sb.append(s", ${rowsOnly.size} rows-only " +
      s"(approximate/sampling by design: ${rowsOnly.mkString(", ")}).\n")
    var covered = Set.empty[String]
    groups.foreach { case (title, pat) =>
      val rx = s"^($pat)".r
      val qs = all.filter(q => rx.findFirstIn(q).isDefined).toSeq.sorted
      covered ++= qs
      sb.append(s"\n## $title\n\n")
      qs.foreach { q =>
        val gate = if (oracle.contains(q)) "oracle" else "rows-only"
        sb.append(s"- `$q` ($gate)\n")
      }
    }
    val missing = all -- covered
    require(missing.isEmpty, s"uncategorized queries: $missing")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("docs/QUERIES.md"), sb.toString)
    println(s"wrote docs/QUERIES.md with ${all.size} queries")
  }
}
