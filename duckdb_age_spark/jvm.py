"""JVM-side age crypto path: build + registration helpers.

The pure-Python crypto path tops out at ~30-64 MB/s/core for >=1 MiB
payloads because every byte crosses JVM -> Arrow -> Python and back
(measured in BENCH_extra.json's payload sweep; the kernel itself does
~1 GB/s/core).  The escape hatch is running the cipher inside the executor
JVM: ``jvm/src/agespark/*.java`` implements the same public
age-encryption.org/v1 format on JDK 17 primitives (X25519 KeyAgreement,
ChaCha20-Poly1305, HmacSHA256 — no external deps), wire-compatible with
``crypto/format.py`` in both directions (pinned by tests/test_jvm_crypto.py).

Usage::

    jar = ensure_jar()                       # javac+jar once, mtime-cached
    spark = (SparkSession.builder
             .config("spark.jars", jar)
             .config("spark.driver.extraClassPath", jar)
             .getOrCreate())
    register_jvm_crypto(spark)               # age_encrypt_jvm / age_decrypt_jvm

The jar must be on the DRIVER classpath at JVM launch for
``registerJavaFunction`` to resolve the class, so registration cannot be
retrofitted onto a running session — which is why this is a separate opt-in
seam rather than part of ``register()``.  Scope (documented prototype):
bech32 key literals only (secret-name resolution stays Python-side where the
secrets snapshot lives), single-recipient encrypt.

Caveat vs the Python path: ``registerJavaFunction`` offers no
nondeterminism flag, so Catalyst MAY collapse two syntactically identical
``age_encrypt_jvm`` calls into one (same ciphertext where the Python path —
marked ``asNondeterministic()`` — would produce two).  Decryption treats
both as valid, but pipelines relying on distinct ciphertexts per call
should keep the Python path for encrypt or add a distinguishing column.
"""

from __future__ import annotations

import os
import subprocess
import sys

_JVM_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jvm")
JAR_PATH = os.path.join(_JVM_DIR, "age-spark-udf.jar")


def ensure_jar() -> str:
    """Compile jvm/src into the UDF jar if missing or stale (source newer
    than jar).  Requires javac (JDK 17); raises RuntimeError if absent so
    callers can gate cleanly.

    Concurrency-safe: parallel callers (pytest-xdist workers, a sweep next
    to the suite) serialize on an flock'd build lock, and build.sh renames
    a temp jar into place atomically — a concurrent reader never sees a
    half-written jar (code-review r8 finding)."""
    src_dir = os.path.join(_JVM_DIR, "src", "agespark")

    def _fresh() -> bool:
        srcs = [
            os.path.join(src_dir, f) for f in sorted(os.listdir(src_dir)) if f.endswith(".java")
        ]
        if not srcs:
            raise RuntimeError(f"no Java sources under {src_dir}")
        return os.path.exists(JAR_PATH) and all(
            os.path.getmtime(s) <= os.path.getmtime(JAR_PATH) for s in srcs
        )

    if _fresh():
        return JAR_PATH
    import fcntl

    with open(os.path.join(_JVM_DIR, ".build.lock"), "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        if _fresh():  # another process built it while we waited
            return JAR_PATH
        # hand build.sh THIS interpreter for the pyspark-jars classpath
        # fallback — `python` may be absent or a different env (code-review r8)
        env = dict(os.environ, PYTHON=sys.executable)
        proc = subprocess.run(
            ["sh", os.path.join(_JVM_DIR, "build.sh")],
            capture_output=True,
            text=True,
            env=env,
        )
        if proc.returncode != 0:
            raise RuntimeError(f"jvm build failed:\n{proc.stdout}\n{proc.stderr}")
    return JAR_PATH


def register_jvm_crypto(spark) -> None:
    """Register age_encrypt_jvm / age_decrypt_jvm SQL functions.  The jar
    must already be on the driver classpath (see module docstring)."""
    from pyspark.sql.types import BinaryType

    spark.udf.registerJavaFunction("age_encrypt_jvm", "agespark.AgeEncryptUDF", BinaryType())
    spark.udf.registerJavaFunction("age_decrypt_jvm", "agespark.AgeDecryptUDF", BinaryType())
