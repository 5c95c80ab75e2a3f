package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch data probe — not part of the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = spark.read.parquet(s"$sf/events.parquet")
      ev.printSchema()
      ev.select(min("ts"), max("ts")).show(false)
      ev.limit(2).show(false)
    } catch { case e: Throwable => println("EVENTS FAIL: " + e) }
    val o = spark.read.parquet(s"$sf/orders.parquet")
    o.select(min("o_orderdate"), max("o_orderdate")).show(false)
    o.groupBy("o_orderstatus").count().show(false)
    o.groupBy("o_orderpriority").count().show(false)
    val c = spark.read.parquet(s"$sf/customer.parquet")
    c.groupBy("c_mktsegment").count().show(false)
    c.select(min("c_acctbal"), max("c_acctbal")).show(false)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    li.select(min("l_shipdate"), max("l_shipdate"), min("l_quantity"), max("l_quantity"),
      min("l_discount"), max("l_discount"), min("l_extendedprice"), max("l_extendedprice")).show(false)
    li.groupBy("l_returnflag").count().show(false)
    val d = spark.read.parquet(s"$sf/documents.parquet")
    d.groupBy("lang").count().show(false)
    d.select(min(length(col("text"))), max(length(col("text")))).show(false)
    // token vocab size
    d.select(explode(split(lower(col("text")), "[^a-z0-9]+")).as("t"))
      .where(length(col("t")) > 0).agg(countDistinct("t"), count("*")).show(false)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    e.select(min(size(col("embedding"))), max(size(col("embedding")))).show(false)
    e.groupBy("label").count().orderBy("label").show(false)
    spark.stop()
  }
}
