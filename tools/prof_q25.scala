// Profiling scratch: stage-by-stage timing of q25 at sf0.1.
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

val dir = "/root/testdata/sf0.1"
spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.session.timeZone", "UTC")

def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
}

// warm
spark.read.parquet(s"$dir/documents.parquet").count()

val docs0 = spark.read.parquet(s"$dir/documents.parquet")
  .withColumn("arr", expr("split(text, ' ')"))
  .filter(expr("size(arr) >= 3"))
  .select(
    col("doc_id"),
    array_distinct(expr(
      "transform(sequence(1, size(arr) - 2), i -> concat_ws(' ', element_at(arr, i), element_at(arr, i+1), element_at(arr, i+2)))"
    )).as("sharr")
  )

for (rnd <- 1 to 2) {
  println(s"== round $rnd ==")
  spark.catalog.clearCache()
  val docs = docs0.cache()
  time("docs cache+count") { docs.count() }
  val sh = docs.select(col("doc_id"), explode(col("sharr")).as("s"))
  val withDigs = docs.withColumn(
    "digs", expr("transform(sharr, s -> concat(md5(s), md5(concat('x', s))))"))
  val sigCols = (0 until 8).map { i =>
    expr(s"array_min(transform(digs, d -> substring(d, ${1 + 8 * i}, 8)))").as(s"h$i")
  }
  val sig = withDigs.select((col("doc_id") +: sigCols): _*)
  time("sig count") { sig.count() }
  val bands = sig.select(
    col("doc_id"),
    explode(array(
      concat(lit("0"), col("h0"), col("h1")),
      concat(lit("1"), col("h2"), col("h3")),
      concat(lit("2"), col("h4"), col("h5")),
      concat(lit("3"), col("h6"), col("h7"))
    )).as("bk")
  )
  val cand = bands.as("x").join(bands.as("y"), col("x.bk") === col("y.bk") && col("x.doc_id") < col("y.doc_id"))
    .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
    .distinct()
  time("cand count") { cand.count() }
  val sizes = docs.select(col("doc_id"), size(col("sharr")).cast("long").as("n"))
  val common = broadcast(cand)
    .join(sh.as("sa"), col("sa.doc_id") === col("a"))
    .join(sh.as("sb"), col("sb.doc_id") === col("b") && col("sb.s") === col("sa.s"))
    .groupBy("a", "b").agg(count(lit(1)).as("cm"))
  val res = common
    .join(sizes.as("na"), col("na.doc_id") === col("a"))
    .join(sizes.as("nb"), col("nb.doc_id") === col("b"))
    .withColumn("j", col("cm").cast("double") / (col("na.n") + col("nb.n") - col("cm")))
    .filter(col("j") >= 0.5)
    .select(col("a"), col("b"), round(col("j"), 4).as("jaccard"))
    .orderBy("a", "b")
  time("full q25") { res.count() }
}
sys.exit(0)
