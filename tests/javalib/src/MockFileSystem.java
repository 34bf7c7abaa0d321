import java.net.URI;
import org.apache.hadoop.fs.RawLocalFileSystem;

/**
 * Test-only Hadoop FileSystem registered under the scheme "mock":
 * byte-for-byte RawLocalFileSystem semantics, but paths carry a
 * non-"file" scheme -- so any engine code that falls back to os.*
 * filesystem calls on a state root breaks loudly instead of silently
 * passing because the test root happened to be local. Wired into
 * tests via spark.hadoop.fs.mock.impl=MockFileSystem.
 */
public class MockFileSystem extends RawLocalFileSystem {
  @Override
  public URI getUri() {
    return URI.create("mock:///");
  }

  @Override
  public String getScheme() {
    return "mock";
  }
}
