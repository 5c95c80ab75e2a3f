package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._
object ProfileHot {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-22s ${(System.nanoTime()-t0)/1e9}%6.2f s"); r }
    val sf = "/root/testdata/sf0.1"
    // hadith layers
    val raw = Ingest.readBooks(spark, Queries.HadithBooks)
    t("hadith_json_scan")(raw.count())
    val valid = Ingest.validated(raw)
    t("hadith_validated")(valid.count())
    val silver = HadithSearch.silver(valid).cache()
    t("hadith_silver_cache")(silver.count())
    val idx = HadithSearch.buildIndex(silver, Queries.HadithDim)
    t("hadith_post")(idx.post.count())
    t("hadith_slots")(idx.slots.count())
    t("hadith_search_warm")(HadithSearch.searchWith(idx.materialize(), Queries.HadithQuery, 10, "balanced").collect())
    // ann
    val emb = Tables(spark, sf, "embeddings")
    t("emb_scan")(emb.count())
    t("ann_index")(Similarity.annIndex(emb, "vec_id", "embedding", Queries.Dim, 4).write.format("noop").mode("overwrite").save())
    t("ann_query_full")(Queries.all("ann_topk")(spark, sf).write.format("noop").mode("overwrite").save())
    // multimodal
    t("mm_synth")(Multimodal.syntheticMedia(Tables(spark, sf, "documents"), "doc_id", "text").write.format("noop").mode("overwrite").save())
    t("mm_enrich")(Queries.all("multimodal_enrich")(spark, sf).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
