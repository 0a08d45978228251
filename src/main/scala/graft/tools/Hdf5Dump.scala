package graft.tools

import org.apache.spark.sql.types._

import graft.sources.hdf5.Hdf5Codec

/** Dev tool: write a small fixture HDF5 file (for external validation
  * of the byte layout) or dump the parsed metadata of an existing one.
  * `runMain graft.tools.Hdf5Dump write <path>` /
  * `runMain graft.tools.Hdf5Dump meta <path>`. */
object Hdf5Dump {
  def main(args: Array[String]): Unit = args match {
    case Array("write", path) =>
      Hdf5Codec.write(new java.io.File(path), Seq(
        "id" -> (LongType -> IndexedSeq[Any](10L, 20L, 30L, 40L)),
        "nm" -> (StringType -> IndexedSeq[Any]("aa", "b", "cccc", "dd")),
        "v" -> (DoubleType -> IndexedSeq[Any](0.5, 1.5, 2.5, -3.5))))
      println(s"wrote $path")
    case Array("meta", path) =>
      Hdf5Codec.meta(new java.io.File(path)).datasets.foreach(println)
    case _ =>
      System.err.println("usage: Hdf5Dump write|meta <path>")
      sys.exit(2)
  }
}
