package graft

/** Test-scope Hadoop FileSystem registered under the `graftfs:` scheme —
  * a local-disk stand-in for S3AFileSystem that lets GraftConfigSpec drive
  * the endpoint-override + base-URI seam through a REAL non-file read in a
  * zero-egress sandbox: Spark resolves the scheme via `fs.graftfs.impl`
  * exactly as it resolves `s3a:` via `fs.s3a.impl`, and the instance
  * records what `fs.s3a.endpoint` said in the Configuration it was
  * initialized with — the same object S3AFileSystem would read its
  * endpoint from.
  *
  * Paths are authority-less (`graftfs:/abs/path`) so the inherited
  * FileSystem.checkPath accepts them; the local path is the URI path.
  */
class GraftTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
  override def initialize(uri: java.net.URI,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    GraftTestFs.seenEndpoint = Option(conf.get("fs.s3a.endpoint"))
    super.initialize(uri, conf)
  }
}

object GraftTestFs {
  @volatile var seenEndpoint: Option[String] = None
}
