// Round-9 scaling check: the three VERDICT-r8 closures.
//
//  A. q28's NEW binding (embeddingDedupBlocked: label x derived-k IVF
//     cluster blocking) at 1x/10x/30x/100x replicas -- the label-only shape
//     it replaces was measured superlinear (14 s @30x, DNF @100x inside
//     q62, scale_check8f); this run is the "linear to 100x" evidence the
//     switched bench entry needs. Reuses the r8 signed-permutation replica
//     dirs (/tmp/scale8v): orthogonal transforms preserve within-replica
//     cosines exactly, cross-replica cosine ~0, so true pair count = k*base.
//
//  B. Hierarchical IVF assignment past the 65,536-centroid kernel cap
//     (AnnIndex.ivfAssignHierarchical, now what ivfAssign does beyond the
//     cap): k=70,000 centroids over the 200k-vector 100x corpus. The old
//     crossJoin + min_by fallback at this size is the shape the r8 sweep
//     measured at 52 s for 60k x 480 (n*k sorted rows with payload --
//     200k x 70k = 14e9 rows would not finish); the hierarchy's candidate
//     volume is n * cellsize * probedCells ~= 200k * 265 * ~few. Also runs
//     semanticDedupScaled(70000) end-to-end (assignment + pair join).
//
//  C. q26 (scaled df cap, r9) on a WIDE-ALPHABET cipher corpus: replica r
//     maps lower/upper/digit through seeded draws from an 87-char pool
//     (letters, digits, punctuation), so 100 replicas live in an ~87^4
//     4-gram space instead of 26^4 -- retiring the gram-space-saturation
//     residue that the r8 run could not separate from real superlinearity.
//     Length-preserving (translate), bijective per replica: true pair
//     count stays k * base.
//
// Protocol: warm discarded, min-of-2 cache-cold, GC settle; shuffle bytes
// from a stage listener.
//
// Run (AFTER sbt package):
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.shuffle.partitions=32 \
//     -i tools/scale_check9.scala 2>/dev/null | grep -o '\[s9\].*'
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

spark.conf.set("spark.sql.adaptive.enabled", "true")
spark.sparkContext.setLogLevel("ERROR")

object Shuf {
  @volatile var total = 0L
  def reset(): Unit = { total = 0L }
}
spark.sparkContext.addSparkListener(new SparkListener {
  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    Shuf.total += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
  }
})

def timed(label: String)(body: => Long): Unit = {
  val t0 = System.nanoTime()
  val warmRows = body
  val warm = (System.nanoTime() - t0) / 1e9
  val best = (1 to 2).map { _ =>
    spark.catalog.clearCache(); System.gc(); Shuf.reset()
    val t = System.nanoTime(); body; (System.nanoTime() - t) / 1e9
  }.min
  println(f"[s9] $label%-34s rows=$warmRows%10d warm=$warm%8.2f s best=$best%8.2f s shufMB=${Shuf.total / 1e6}%9.1f")
  spark.catalog.clearCache(); System.gc()
}

// ---- A: q28's new cluster-blocked binding over the r8 embedding replicas
val dim = 64
def signedPermExpr(r: Int): String = {
  if (r == 0) "embedding"
  else {
    val perm = new scala.util.Random(7000 + r).shuffle((1 to dim).toList)
    val terms = (0 until dim).map { d =>
      val s = if (new scala.util.Random(9000L + r * 64L + d).nextBoolean()) "-" else ""
      s"${s}element_at(embedding, ${perm(d)})"
    }
    s"array(${terms.mkString(", ")})"
  }
}
def mkVecDir(k: Int): String = {
  val dir = s"/tmp/scale8v/k$k"
  if (!new java.io.File(s"$dir/_DONE").exists) {
    val em0 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    (0 until k).foreach { r =>
      em0.select(
          (col("vec_id") * k + lit(r)).as("vec_id"),
          expr(signedPermExpr(r)).as("embedding"),
          col("label"))
        .coalesce(2)
        .write.mode(if (r == 0) "overwrite" else "append")
        .parquet(s"$dir/embeddings.parquet")
    }
    new java.io.File(s"$dir/_DONE").createNewFile()
  }
  dir
}
println("[s9] ==== A: q28 cluster-blocked embedding dedup ====")
for (k <- Seq(1, 10, 30, 100)) {
  val dir = mkVecDir(k)
  timed(s"q28_blocked k=$k") {
    graft.operators.VectorOps.embeddingDedupBlocked(spark, dir).count()
  }
}

// ---- B: assignment past the 65,536 kernel cap, k=70,000, 200k vectors.
// B1 (isotropic corpus -- the signed-perm replicas, where the r9 pruning
// probe measured 265/265 cells retained, i.e. triangle pruning is
// impossible): ivfAssign routes to the DIRECT kernel mid-tier (36 MB
// matrix, early-abandon scan) -- the optimal exact shape there, completing
// where the old crossJoin+min_by fallback did not.
println("[s9] ==== B1: k=70000 direct-kernel assignment, isotropic corpus ====")
locally {
  val dir = mkVecDir(100)
  val e = spark.read.parquet(s"$dir/embeddings.parquet")
    .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("emb"))
  val n = e.count()
  println(s"[s9] corpus n=$n, k=70000 (kernel cap=${graft.operators.AnnIndex.ArgminKernelMaxCentroids}, direct ceiling=${graft.operators.AnnIndex.ArgminDirectMaxBytes / 1024 / 1024} MB)")
  timed("direct_assign k=70000") {
    val cents = graft.operators.AnnIndex.ivfCentroids(e, "emb", "vec_id", 70000, n)
    graft.operators.AnnIndex.ivfAssign(e, "emb", "vec_id", cents)
      .groupBy("bucket").count().count()
  }
  timed("semdedup_scaled k=70000") {
    graft.operators.VectorOps.semanticDedupScaled(spark, dir, 70000).count()
  }
  // reference point: same corpus through the flat kernel at the derived k
  // (k=1600 at 200k vectors) -- the shape the official q88 runs
  timed("semdedup_autok (k=1600)") {
    graft.operators.VectorOps.semanticDedupScaled(spark, dir).count()
  }
}

// B2 (CLUSTERABLE corpus -- 200 tight hash-planted clusters, the geometry
// real embedding corpora have): the hierarchy's Lloyd+snap supers get
// compact cells, the probe keeps a handful of them, and the join-based
// shape becomes viable for k past the direct ceiling. Buckets must match
// the direct kernel bit-for-bit (exactness is geometry-independent).
println("[s9] ==== B2: k=70000 hierarchical vs direct, clusterable corpus ====")
locally {
  val dir = "/tmp/scale9b/planted"
  if (!new java.io.File(s"$dir/_DONE").exists) {
    spark.range(200000).select(col("id").as("vec_id"))
      .withColumn("emb", expr(
        """transform(sequence(0, 63), d ->
          |  cast(xxhash64(concat('c', cast(pmod(vec_id, 200) as string), '_', cast(d as string))) % 1000L as double) / 1000.0
          |  + cast(xxhash64(concat('n', cast(vec_id as string), '_', cast(d as string))) % 1000L as double) / 50000.0)""".stripMargin))
      .coalesce(8).write.mode("overwrite").parquet(dir)
    new java.io.File(s"$dir/_DONE").createNewFile()
  }
  val e = spark.read.parquet(dir).select(col("vec_id"), col("emb"))
  val n = e.count()
  val cents = graft.operators.AnnIndex.ivfCentroids(e, "emb", "vec_id", 70000, n)
  timed("planted direct k=70000") {
    graft.operators.AnnIndex.ivfAssign(e, "emb", "vec_id", cents)
      .groupBy("bucket").count().count()
  }
  timed("planted hier k=70000") {
    graft.operators.AnnIndex.ivfAssignHierarchical(e, "emb", Some("vec_id"), cents)
      .groupBy("bucket").count().count()
  }
  val direct = graft.operators.AnnIndex.ivfAssign(e, "emb", "vec_id", cents)
    .select(col("vec_id"), col("bucket").as("b1"))
  val hier = graft.operators.AnnIndex.ivfAssignHierarchical(e, "emb", Some("vec_id"), cents)
    .select(col("vec_id"), col("bucket").as("b2"))
  val diff = direct.join(hier, Seq("vec_id")).filter(col("b1") =!= col("b2")).count()
  println(s"[s9] planted bucket mismatches direct-vs-hier: $diff (MUST be 0)")
}

// ---- C: q26 with the scaled df cap on a wide-alphabet cipher corpus
val lower = "abcdefghijklmnopqrstuvwxyz"
val upper = lower.toUpperCase
val digit = "0123456789"
val punct = "!#$%&()*+,-:;<=>?@[]^_{}~"
val srcAlpha = lower + upper + digit
val pool = (lower + upper + digit + punct).toList // 87 chars
def wideCipher(r: Int): String = {
  if (r == 0) srcAlpha
  else {
    val sh = new scala.util.Random(41000 + r).shuffle(pool)
    sh.take(62).mkString // 26 lower-images + 26 upper-images + 10 digit-images
  }
}
def mkDocDir(k: Int): String = {
  val dir = s"/tmp/scale9c/k$k"
  if (!new java.io.File(s"$dir/_DONE").exists) {
    val dc0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    (0 until k).foreach { r =>
      dc0.select(
          (col("doc_id") * k + lit(r)).as("doc_id"),
          translate(col("text"), srcAlpha, wideCipher(r)).as("text"),
          col("lang"), col("source"), col("n_chars"))
        .coalesce(4)
        .write.mode(if (r == 0) "overwrite" else "append")
        .parquet(s"$dir/documents.parquet")
    }
    new java.io.File(s"$dir/_DONE").createNewFile()
  }
  dir
}
println("[s9] ==== C: q26 scaled-df-cap, wide-alphabet corpus ====")
for (k <- Seq(1, 10, 30, 100)) {
  val dir = mkDocDir(k)
  timed(s"q26_ngram_jaccard k=$k") {
    graft.operators.DedupOps.ngramJaccard(spark, dir).count()
  }
}
sys.exit(0)
