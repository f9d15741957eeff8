package graft

/** Dev tool: print the DuckDB oracle SQL for the named queries (or all) so
  * candidate SQL can be prototyped against DuckDB before a Verify run.
  * Usage: runMain graft.PrintSql [name...]
  */
object PrintSql {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.oracleSql.keys.toSeq.sorted
    names.foreach { n =>
      println(s"-- >>> $n")
      println(SparkEntry.oracleSql(n))
      println(s"-- <<< $n")
    }
  }
}
