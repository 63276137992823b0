package graft
object QCheck {
  def main(a: Array[String]): Unit = {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    println("queries: " + q.size + "  oracles: " + o.size)
    println("q-without-oracle: " + (q -- o).toSeq.sorted.mkString(", "))
    println("oracle-without-q: " + (o -- q).toSeq.sorted.mkString(", "))
  }
}
