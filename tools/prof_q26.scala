// Stage-by-stage profile of the rewritten q26 at sf0.1.
import org.apache.spark.sql.functions._

val dir = "/root/testdata/sf0.1"
spark.conf.set("spark.sql.shuffle.partitions", "32")

def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"[prof] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
}

spark.read.parquet(s"$dir/documents.parquet").count()
graft.functions.VectorFunctions.register(spark)

for (rnd <- 1 to 3) {
  println(s"== round $rnd ==")
  spark.catalog.clearCache()
  val grams = spark.read.parquet(s"$dir/documents.parquet")
    .filter(length(col("text")) >= 4)
    .select(col("doc_id"), col("n_chars"),
      explode(expr("char_ngrams(text, 4)")).as("g"))
    .cache()
  time("grams cache+count") { grams.count() }
  val rare = grams.groupBy("g").agg(count(lit(1)).as("df")).filter(col("df") <= 200)
  time("rare count") { rare.count() }
  val pruned = grams.join(broadcast(rare), Seq("g"))
  val arrs = pruned.groupBy(col("doc_id"), col("n_chars"))
    .agg(sort_array(collect_list(struct(col("df"), col("g")))).as("sarr"))
    .select(col("doc_id"), col("n_chars"),
      expr("transform(sarr, x -> x.g)").as("garr"), size(col("sarr")).as("n"))
    .cache()
  time("arrs cache+count") { arrs.count() }
  val pref = arrs.select(col("doc_id"), col("n_chars"),
    explode(expr("slice(garr, 1, n - (3*n + 4) div 5 + 1)")).as("g"))
  time("pref count") { pref.count() }
  val cand = pref.as("x").join(pref.as("y"),
      col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id") &&
        abs(col("x.n_chars") - col("y.n_chars")) <= 10)
    .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
  time("cand count") { cand.count() }
  val withA = broadcast(cand)
    .join(arrs.select(col("doc_id").as("a"), col("garr").as("arr_a"), col("n").as("na")), Seq("a"))
  val pairs = broadcast(withA)
    .join(arrs.select(col("doc_id").as("b"), col("garr").as("arr_b"), col("n").as("nb")), Seq("b"))
  val res = pairs
    .withColumn("cm", size(array_intersect(col("arr_a"), col("arr_b"))).cast("long"))
    .withColumn("j", col("cm").cast("double") / (col("na").cast("long") + col("nb").cast("long") - col("cm")))
    .filter(col("j") >= 0.6)
    .select(col("a"), col("b"), round(col("j"), 4).as("jaccard"))
    .orderBy("a", "b")
  time("verify+full") { res.count() }
}
sys.exit(0)
