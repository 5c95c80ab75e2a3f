package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skewed-twin fixture generator (dev harness, like [[Verify]]/[[Bench]]).
  *
  * The skew-handling operators (saltedJoin, asofJoinBucketed,
  * topKPerGroup, capPerGroup, the LSH hot-bucket caps) exist FOR zipf
  * data, but the driver fixtures are near-uniform — their gates never
  * exercised a hot key. This main derives a deterministic skewed twin of
  * an SF dir and writes it alongside the repo (default
  * `testdata-skew/<sfname>`), after which the UNCHANGED correctness gate
  * runs against it (`tools/gate.sh <skew_dir>`): every oracle is
  * data-independent SQL over the same files, so the whole 124-query
  * registry doubles as a skew sweep.
  *
  * Transforms (all md5-derived — rerunning reproduces byte-identical
  * content):
  *  - events: `user_id := floor(U · u^4)`, u = 52-bit md5 uniform of
  *    event_id — a zipf-ish head where the hottest user takes ~U^(-1/4)
  *    of all events (~16% at U=1500) — the hot-session / hot-as-of-key
  *    / hot-group stress.
  *  - lineitem: 10% of rows point their l_orderkey at ONE existing hot
  *    order — the salted-join / skewed-shuffle stress (FKs stay intact:
  *    the hot key is a real order).
  *  - documents: 5% of docs carry the viral doc's text+n_chars (one hot
  *    shingle/minhash/simhash bucket and a dup clique); source is
  *    remapped zipf-ish so per-source caps and mixes see a dominant
  *    source.
  *  - embeddings: 5% of vectors are copies of vector 0 (one hot ANN/LSH
  *    bucket, a genuine semantic-dup clique).
  *  - region/nation/customer/supplier/part/orders: copied unchanged.
  *
  * Events are written as TIMESTAMP(MICROS) regardless of the source
  * storage (both engines read the twin's own files, so the truncation
  * is self-consistent).
  */
object SkewGen {

  /** 52-bit md5 uniform in [0,1) — 13 hex chars fit a double's mantissa
    * exactly, so the value is reproducible across engines and runs. */
  private def u01(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c.cast("string")), 1, 13), 16, 10)
      .cast("long").cast("double") / lit(4503599627370496.0) // 2^52

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sfName = src.stripSuffix("/").split('/').last
    val out = if (args.length > 1) args(1) else s"testdata-skew/$sfName"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // single-FILE layout, like the driver fixtures (the oracle harness
    // points DuckDB at '<dir>/<table>.parquet' as a file, not a dir):
    // write the one part to a scratch dir, then move it into place
    def write(df: DataFrame, name: String): Unit = {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val tmp = s"$out/_tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val listing = Files.list(Paths.get(tmp))
      val part = try listing.filter(_.toString.endsWith(".parquet"))
        .findFirst().orElseThrow(() => new IllegalStateException(s"no part in $tmp"))
      finally listing.close()
      Files.createDirectories(Paths.get(out))
      Files.move(part, Paths.get(s"$out/$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      val walk = Files.walk(Paths.get(tmp))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p): Unit)
      finally walk.close()
    }

    // unchanged dims/facts: rewrite through Spark (a file copy would
    // need filesystem layout assumptions; a scan-write is one pass)
    Seq("region", "nation", "customer", "supplier", "part", "orders")
      .foreach(t => write(Tables(spark, src, t), t))

    // events: zipf-ish user head (u^4 concentrates toward user 0)
    val ev = Tables(spark, src, "events") // canonical long-ns ts
    val nUsers = ev.agg(max("user_id")).head().getLong(0) + 1
    write(ev.withColumn("user_id",
        floor(lit(nUsers.toDouble) * pow(u01(col("event_id")), 4)).cast("long"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000"))), "events")

    // lineitem: 10% of rows join-key-pinned to one real hot order
    val li = Tables(spark, src, "lineitem")
    val hotOrder = li.agg(min("l_orderkey")).head().getLong(0)
    write(li.withColumn("l_orderkey",
      when(u01(col("l_orderkey") * lit(1000003L) + col("l_linenumber")) < 0.10,
        lit(hotOrder)).otherwise(col("l_orderkey"))), "lineitem")

    // documents: viral text clique + zipf-ish source head
    val docs = Tables(spark, src, "documents")
    val viral = docs.orderBy("doc_id").select("text", "n_chars").head()
    val srcs = docs.select("source").distinct().orderBy("source")
      .collect().map(_.getString(0))
    val srcMap = map(srcs.zipWithIndex.flatMap { case (s, i) =>
      Seq(lit(i), lit(s)) }: _*)
    write(docs
      .withColumn("_viral", u01(col("doc_id") + lit(17L)) < 0.05)
      .withColumn("text", when(col("_viral"), lit(viral.getString(0)))
        .otherwise(col("text")))
      .withColumn("n_chars", when(col("_viral"), lit(viral.getLong(1)))
        .otherwise(col("n_chars")))
      .withColumn("source", srcMap(
        floor(lit(srcs.length.toDouble) * pow(u01(col("doc_id") + lit(29L)), 4))
          .cast("int")))
      .drop("_viral"), "documents")

    // embeddings: 5% copies of vector 0 (hot bucket + dup clique)
    val emb = Tables(spark, src, "embeddings")
    val v0 = emb.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0)
    write(emb.withColumn("embedding",
      when(u01(col("vec_id") + lit(41L)) < 0.05, typedLit(v0))
        .otherwise(col("embedding"))), "embeddings")

    println(s"""{"skew_fixture":"$out","src":"$src","n_users":$nUsers}""")
    spark.stop()
  }
}
