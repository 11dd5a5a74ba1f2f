package graft.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Whole-file read into a byte array with an explicit 2 GB guard: the
  * callers (log files, timeline metadata, HFile bases) are small by
  * construction, but a pathological file must fail with a clear size
  * error instead of `getLen.toInt` wrapping negative and throwing an
  * opaque NegativeArraySizeException inside a task.
  */
object ReadFully {

  def apply(fs: FileSystem, path: Path): Array[Byte] = {
    val len = fs.getFileStatus(path).getLen
    require(len <= Int.MaxValue,
      s"$path is $len bytes — larger than the 2 GB whole-file read limit " +
        "(log/timeline/HFile artifacts are expected to be small)")
    val in = fs.open(path)
    try {
      val buf = new Array[Byte](len.toInt)
      in.readFully(0, buf)
      buf
    } finally in.close()
  }

  def apply(path: Path, conf: Configuration): Array[Byte] =
    apply(path.getFileSystem(conf), path)
}
