package graft

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

import java.net.URI

/** Local FileSystem that REFUSES rename — the object-store contract (an
  * S3-style store has no atomic rename; visibility comes from whole-object
  * PUTs). GraftLakeSpec runs the lake's entire metadata path against it
  * under [[graft.table.GraftLake.Publish.Cas]] to prove the commit
  * protocol's only visibility primitive there is create-exclusive (the
  * conditional-PUT analog) — no rename reaches the store. Registered for
  * the `graftnr:` scheme via META-INF/services (test classpath only). */
class NoRenameFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftnr"
  override def getUri: URI = URI.create("graftnr:///")
  override def rename(src: Path, dst: Path): Boolean =
    throw new UnsupportedOperationException(
      s"rename($src -> $dst): this store has no rename (object-store contract)")
}
