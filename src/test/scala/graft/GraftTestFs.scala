package graft

/** A Hadoop `FileSystem` with its OWN scheme (`graftfs://`), backed by
  * local disk: proves the publishing layer resolves filesystems from the
  * path scheme via the Hadoop API instead of assuming `java.nio.file` /
  * POSIX — the same registration mechanism (fs.<scheme>.impl) an s3a://
  * or gs:// connector uses in production. Instantiated reflectively by
  * Hadoop, so it must be a top-level class with a no-arg constructor. */
class GraftTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
}
