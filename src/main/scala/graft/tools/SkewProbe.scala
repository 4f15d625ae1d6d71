package graft.tools
import org.apache.spark.sql.functions._
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.core.Sessions.local(32)
    s.sparkContext.setLogLevel("WARN")
    val n = args.headOption.map(_.toLong).getOrElse(400000L)
    val nlist = math.max(16, math.sqrt(n.toDouble).toInt)
    val vec = s.range(n).select(col("id").as("vec_id"), (col("id") - col("id") % 2).as("seed"))
      .withColumn("embedding", transform(sequence(lit(0), lit(63)),
        d => (pmod(xxhash64(col("seed"), d), lit(1000)).cast("double") / 1000.0).cast("float")))
      .select("vec_id", "embedding")
    val idx = graft.operators.Similarity.ivfIndex(vec, nlist)
    val sizes = idx.assigned.groupBy("cid").count()
    val st = sizes.agg(count(lit(1)), min("count"), max("count"), avg("count"),
      expr("percentile(count, 0.99)"), sum(col("count") * col("count"))).head()
    println(s"PROBE nonempty=${st.get(0)} min=${st.get(1)} max=${st.get(2)} avg=${st.get(3)} p99=${st.get(4)} sumsq=${st.get(5)}")
    s.stop()
  }
}
