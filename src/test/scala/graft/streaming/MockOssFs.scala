package graft.streaming

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, Path, RawLocalFileSystem}

/** CI stand-ins for an OBJECT-STORE scheme: `oss://bucket/...` paths
  * delegate to the machine-local filesystem, registered on the test
  * classpath via `src/test/resources/core-site.xml`. `oss` is on
  * [[StoreFs.NonAtomicRenameSchemes]]' blocklist and is NOT
  * [[StoreFs.isLocal]], so a store rooted here drives the two branches
  * the `file:`-based specs cannot reach end-to-end: the
  * `graft.store.allowNonAtomicRename` deliberate-override path of the
  * store-open refusal, and [[VersionedStore.withStoreLock]]'s remote-FS
  * LEASE branch (heartbeat, takeover fencing, [[LeaseLostException]]) —
  * executed against a second `FileContext` scheme resolved exactly the
  * way an `hdfs://` store resolves. Test-only; never on the main
  * classpath. */
class MockOssFileSystem extends RawLocalFileSystem {
  // FileSystem.checkPath matches scheme+authority against getUri — report
  // the mock bucket so oss://bucket:9000/... paths qualify; the delegated
  // ops read path.toUri.getPath, i.e. the real local path under the
  // authority. The explicit port exists because AbstractFileSystem
  // demands a resolvable port when an authority is required and the
  // local-FS delegate defines no default one.
  override def getUri: URI = URI.create("oss://bucket:9000")

  // AbstractFileSystem demands a resolvable port for authority-bearing
  // schemes (DelegateToFileSystem maps the local delegate's 0 to the
  // invalid -1) — declare one so the FileContext registration constructs
  override def getDefaultPort: Int = 9000
}

/** The `AbstractFileSystem` (FileContext) registration of
  * [[MockOssFileSystem]] — the resolver [[StoreFs]] actually uses. */
class MockOssFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new MockOssFileSystem, conf, "oss", true)
