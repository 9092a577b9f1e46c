object Counts extends App {
  val q = graft.SparkEntry.queries.keySet
  val o = graft.SparkEntry.oracleSql.keySet
  println(s"queries=${q.size} oracle=${o.size} noOracle=${(q--o).toList.sorted.mkString(",")}")
  println(s"oracleNotQuery=${(o--q).toList.sorted.mkString(",")}")
}
