package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.ZipFile
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** NPZ (zip of .npy) embedding-cache import — S12 in SURVEY.md §2.1
  * (reference cache: quran_mcp/embeddings.py:48-98, stored as
  * vectors.npy float32 (n×d) + keys.npy fixed-width unicode).
  *
  * The parse is driver-side (an embedding cache is a model artifact, tens
  * of MB); the result is parallelized into a DataFrame so everything
  * downstream is distributed. Only the two layouts the reference writes
  * are supported: '<f4' C-order 2-D matrices and '<U…' 1-D key arrays.
  */
object Npz {

  private case class Header(descr: String, shape: Seq[Int], dataOffset: Int)

  private def parseHeader(bytes: Array[Byte]): Header = {
    require(bytes(0) == 0x93.toByte && new String(bytes, 1, 5, "ASCII") == "NUMPY",
      "not an npy payload")
    val headerLen = ((bytes(9) & 0xff) << 8) | (bytes(8) & 0xff) // v1.0 little-endian u16
    val header = new String(bytes, 10, headerLen, "ASCII")
    val descr = "'descr':\\s*'([^']+)'".r.findFirstMatchIn(header).get.group(1)
    require(!header.contains("'fortran_order': True"), "fortran order unsupported")
    val shape = "'shape':\\s*\\(([^)]*)\\)".r.findFirstMatchIn(header).get.group(1)
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    Header(descr, shape, 10 + headerLen)
  }

  private def entryBytes(zip: ZipFile, name: String): Array[Byte] = {
    val e = zip.getEntry(name)
    require(e != null, s"npz entry $name missing")
    zip.getInputStream(e).readAllBytes()
  }

  /** float32 matrix entry → Seq of rows (as float arrays). */
  def readFloatMatrix(path: String, entry: String): Seq[Array[Float]] = {
    val zip = new ZipFile(path)
    try {
      val bytes = entryBytes(zip, entry)
      val h = parseHeader(bytes)
      require(h.descr == "<f4" && h.shape.length == 2, s"unsupported layout $h")
      val Seq(n, d) = h.shape
      val buf = ByteBuffer.wrap(bytes, h.dataOffset, n * d * 4).order(ByteOrder.LITTLE_ENDIAN)
      (0 until n).map { _ =>
        val row = new Array[Float](d)
        var j = 0
        while (j < d) { row(j) = buf.getFloat(); j += 1 }
        row
      }
    } finally zip.close()
  }

  /** fixed-width unicode ('<U…', UTF-32LE) 1-D entry → strings. */
  def readStringVector(path: String, entry: String): Seq[String] = {
    val zip = new ZipFile(path)
    try {
      val bytes = entryBytes(zip, entry)
      val h = parseHeader(bytes)
      require(h.descr.startsWith("<U") && h.shape.length == 1, s"unsupported layout $h")
      val width = h.descr.drop(2).toInt
      val n = h.shape.head
      (0 until n).map { i =>
        new String(bytes, h.dataOffset + i * width * 4, width * 4, "UTF-32LE")
          .takeWhile(_ != 0.toChar)
      }
    } finally zip.close()
  }

  /** (key, embedding) DataFrame from the reference's npz cache layout. */
  def embeddings(spark: SparkSession, path: String,
                 vectorsEntry: String = "vectors.npy",
                 keysEntry: String = "keys.npy"): DataFrame = {
    val vecs = readFloatMatrix(path, vectorsEntry)
    val keys = readStringVector(path, keysEntry)
    require(vecs.length == keys.length, "keys/vectors length mismatch")
    val rows = keys.zip(vecs).map { case (k, v) => Row(k, v.toSeq) }
    val schema = StructType(Seq(
      StructField("verse_key", StringType),
      StructField("embedding", ArrayType(FloatType))))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 8), schema)
  }
}
