package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Whole-small-file text reads (metadata jsons, version hints, commit
  * logs) — driver-side only; data files never come through here. */
object FsText {
  def read(fs: FileSystem, p: Path): String = {
    val len = fs.getFileStatus(p).getLen
    require(len < Int.MaxValue, s"$p: ${len}B is not a metadata file")
    val b = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, b) finally in.close()
    new String(b, "UTF-8")
  }
}
