package sparkgraft;

import java.io.IOException;
import java.net.URI;
import org.apache.hadoop.conf.Configuration;
import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;

/**
 * Test-only Hadoop FileSystem registered as the {@code mock://} scheme
 * (via {@code fs.mock.impl}): byte-for-byte RawLocalFileSystem storage,
 * but with a NON-{@code file} URI -- so every caller that dispatches on
 * scheme (local_form() returning null, qualified-path handling, the
 * CAS-vs-flock lock split) takes its genuinely-remote branch while
 * staying testable offline. Paths are {@code mock:///abs/local/path}
 * (empty authority). Rename refuses an existing destination, matching
 * HDFS/S3A semantics (RawLocal's POSIX rename would silently replace).
 */
public class MockRemoteFileSystem extends RawLocalFileSystem {
  private static final URI NAME = URI.create("mock:///");

  @Override
  public URI getUri() {
    return NAME;
  }

  @Override
  public void initialize(URI uri, Configuration conf) throws IOException {
    super.initialize(uri, conf);
  }

  @Override
  public String getScheme() {
    return "mock";
  }

  @Override
  public boolean rename(Path src, Path dst) throws IOException {
    if (exists(dst) && !getFileStatus(dst).isDirectory()) {
      return false;
    }
    return super.rename(src, dst);
  }
}
