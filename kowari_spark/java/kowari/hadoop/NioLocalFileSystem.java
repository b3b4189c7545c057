package kowari.hadoop;

import java.io.File;
import java.io.IOException;
import java.nio.file.Files;
import java.nio.file.attribute.PosixFilePermission;
import java.util.EnumSet;
import java.util.Set;

import org.apache.hadoop.fs.LocalFileSystem;
import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;
import org.apache.hadoop.fs.permission.FsPermission;

/**
 * file:// FileSystem whose setPermission uses java.nio instead of
 * forking a shell.
 *
 * Without the libhadoop native library (absent from pip/conda Spark
 * distributions and most containerized clusters),
 * RawLocalFileSystem.setPermission falls back to
 * Shell.execCommand("chmod") -- one fork+exec per created file or
 * directory, and a ChecksumFileSystem write creates TWO files (data +
 * .crc). A 5120-directory partitioned layout write was measured
 * spending ~90% of its task wall inside ProcessImpl.forkAndExec
 * (thread dumps in OPTIMIZATION_r15.md). Files.setPosixFilePermissions
 * issues the same chmod(2) syscall in-process.
 *
 * Scope: the 9 rwx bits only -- the sticky/setuid/setgid bits a shell
 * chmod could set are not representable in PosixFilePermission and are
 * dropped; Spark/Parquet writers only ever request umask-filtered
 * rw-r--r-- / rwxr-xr-x modes, and layout correctness never depends on
 * the high bits. Registered by kowari_spark.session.get_session via
 * spark.hadoop.fs.file.impl when the packaged jar is present
 * (KOWARI_FAST_LOCALFS=false opts out).
 */
public class NioLocalFileSystem extends LocalFileSystem {
    public NioLocalFileSystem() {
        super(new NioRawLocalFileSystem());
    }

    public static class NioRawLocalFileSystem extends RawLocalFileSystem {
        private static final PosixFilePermission[] BITS = {
            PosixFilePermission.OTHERS_EXECUTE,
            PosixFilePermission.OTHERS_WRITE,
            PosixFilePermission.OTHERS_READ,
            PosixFilePermission.GROUP_EXECUTE,
            PosixFilePermission.GROUP_WRITE,
            PosixFilePermission.GROUP_READ,
            PosixFilePermission.OWNER_EXECUTE,
            PosixFilePermission.OWNER_WRITE,
            PosixFilePermission.OWNER_READ,
        };

        @Override
        public boolean rename(Path src, Path dst) throws IOException {
            // Spark's stock file:// implementation
            // (org.apache.hadoop.hive.ql.io.ProxyLocalFileSystem)
            // REFUSES a rename onto an existing destination, and the
            // engine's put-if-absent commit (fsutil.publish_exclusive)
            // and sibling-swap maintenance depend on that refusal;
            // stock RawLocalFileSystem would clobber via rename(2).
            if (exists(dst)) {
                return false;
            }
            return super.rename(src, dst);
        }

        @Override
        public void setPermission(Path p, FsPermission permission)
                throws IOException {
            File f = pathToFile(p);
            short mode = permission.toShort();
            Set<PosixFilePermission> perms =
                EnumSet.noneOf(PosixFilePermission.class);
            for (int i = 0; i < BITS.length; i++) {
                if (((mode >> i) & 1) == 1) {
                    perms.add(BITS[i]);
                }
            }
            try {
                Files.setPosixFilePermissions(f.toPath(), perms);
            } catch (UnsupportedOperationException e) {
                // non-POSIX store: take the stock (shell) path
                super.setPermission(p, permission);
            }
        }
    }
}
