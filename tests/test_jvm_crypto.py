"""JVM-side age crypto path (jvm/src/agespark) — wire-format interop with
the Python path, and the Spark registerJavaFunction seam.

The Java implementation must be byte-compatible with crypto/format.py in
BOTH directions: Java-encrypted files decrypt under the Python path and
vice versa, including multi-chunk (>64 KiB) payloads.  The Spark-session
test runs in a subprocess because the jar must be on the driver classpath
at JVM launch (registerJavaFunction resolves the class on the driver), and
the suite's shared session was started without it.
"""

from __future__ import annotations

import base64
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PUB = "age1j2tqev8spvn9s9ktkr750ntl03sy20f7dck0mdyetway3cj2naasngwz3u"
PRIV = "AGE-SECRET-KEY-1DMYUTPVUSD3M7HMU4K5KXNZ65JZVC9J04MSVV2J8Y4NE8GZCVU6ST7DRT2"


@pytest.fixture(scope="module")
def jar():
    import shutil

    if shutil.which("javac") is None or shutil.which("java") is None:
        pytest.skip("JDK not available — JVM crypto path is opt-in")
    from duckdb_age_spark.jvm import ensure_jar

    try:
        return ensure_jar()
    except RuntimeError as e:
        pytest.skip(f"jvm jar build unavailable: {e}")


def _java(jar, *args: str) -> str:
    proc = subprocess.run(
        ["java", "-cp", jar, "agespark.SelfTest", *args],
        capture_output=True,
        text=True,
        check=True,
    )
    return proc.stdout.strip()


def test_java_encrypt_python_decrypt(jar):
    from duckdb_age_spark.crypto import format as agefmt, keys

    ct = base64.b64decode(_java(jar, "enc", PUB, "wire interop"))
    assert agefmt.decrypt(ct, keys.parse_identity(PRIV)) == b"wire interop"
    # ciphertext length matches the closed form the oracle uses
    assert len(ct) == agefmt.ciphertext_length(len(b"wire interop"), 1)


def test_python_encrypt_java_decrypt(jar):
    from duckdb_age_spark.crypto import format as agefmt, keys

    ct = agefmt.encrypt(b"python made this", [keys.parse_recipient(PUB)])
    out = _java(jar, "dec", PRIV, base64.b64encode(ct).decode())
    assert out == "python made this"


def test_multichunk_interop_both_directions(jar):
    """>64 KiB payloads span chunk boundaries — the chunked nonce counter
    and final-flag must agree between the two implementations."""
    from duckdb_age_spark.crypto import format as agefmt, keys

    pt = ("x" * (64 * 1024) + "TAIL" + "y" * 100)  # 2 chunks, odd tail
    ct = base64.b64decode(_java(jar, "enc", PUB, pt))
    assert agefmt.decrypt(ct, keys.parse_identity(PRIV)) == pt.encode()
    ct2 = agefmt.encrypt(pt.encode(), [keys.parse_recipient(PUB)])
    assert _java(jar, "dec", PRIV, base64.b64encode(ct2).decode()) == pt


def test_java_rejects_tampered_ciphertext(jar):
    ct = bytearray(base64.b64decode(_java(jar, "enc", PUB, "payload")))
    ct[-1] ^= 0x01  # flip a payload tag bit
    proc = subprocess.run(
        ["java", "-cp", jar, "agespark.SelfTest", "dec", PRIV,
         base64.b64encode(bytes(ct)).decode()],
        capture_output=True,
        text=True,
    )
    assert proc.returncode != 0
    assert "payload authentication failed" in proc.stderr


def test_java_header_parser_rejects_malformed(jar):
    """Adversarial parity with the Python parser's fuzz hardening: every
    malformed variant must fail cleanly (non-zero exit, no wrong-plaintext
    success, no hang).  Cases mirror the classes tests/test_crypto.py pins
    for the Python path."""
    from duckdb_age_spark.crypto import format as agefmt, keys

    ct = agefmt.encrypt(b"victim", [keys.parse_recipient(PUB)])
    nl1 = ct.index(b"\n")
    mac_at = ct.index(b"--- ")
    cases = {
        "empty": b"",
        "bad_version": b"age-encryption.org/v2" + ct[nl1:],
        "truncated_header": ct[: nl1 + 5],
        "truncated_after_stanza": ct[:mac_at],
        "no_arrow_stanza": ct[: nl1 + 1] + b"X25519 junk\n" + ct[nl1 + 1 :],
        "padded_b64_share": ct.replace(b"-> X25519 ", b"-> X25519 AAA= ", 1),
        "flipped_mac": ct[: mac_at + 6]
        + bytes([ct[mac_at + 6] ^ 1])
        + ct[mac_at + 7 :],
        "truncated_payload_nonce": ct[: mac_at + 48 + 4],
        "garbage": b"\x00\xff" * 40,
    }
    for name, bad in cases.items():
        proc = subprocess.run(
            ["java", "-cp", jar, "agespark.SelfTest", "dec", PRIV,
             base64.b64encode(bad).decode()],
            capture_output=True,
            text=True,
            timeout=60,
        )
        assert proc.returncode != 0, f"{name}: malformed input decrypted successfully"
        assert "victim" not in proc.stdout, f"{name}: leaked plaintext"


_SPARK_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
import duckdb_age_spark as age
from duckdb_age_spark.jvm import register_jvm_crypto

jar = {jar!r}
spark = (SparkSession.builder.master("local[2]")
         .config("spark.jars", jar)
         .config("spark.driver.extraClassPath", jar)
         .config("spark.executor.extraClassPath", jar)
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false").getOrCreate())
age.register(spark)
register_jvm_crypto(spark)
PUB, PRIV = {pub!r}, {priv!r}

# cross-path inside ONE query: JVM encrypt -> Python decrypt, and the reverse
row = spark.sql(
    "SELECT age_decrypt(age_encrypt_jvm(CAST('a2p' AS BINARY), '" + PUB + "'), '" + PRIV + "') AS jp, "
    "age_decrypt_jvm(age_encrypt(CAST('p2a' AS BINARY), '" + PUB + "'), '" + PRIV + "') AS pj, "
    "age_encrypt_jvm(CAST(NULL AS BINARY), '" + PUB + "') AS nn"
).first()
assert bytes(row.jp) == b"a2p", row.jp
assert bytes(row.pj) == b"p2a", row.pj
assert row.nn is None
print("CROSS-PATH-OK")

# error taxonomy at the SQL surface
try:
    spark.sql("SELECT age_encrypt_jvm(CAST('x' AS BINARY), 'invalid_key')").collect()
    print("NO-ERROR")
except Exception as e:
    assert "Invalid age recipient key: invalid_key (not a valid age key or secret name)" in str(e)
    print("ERRMSG-OK")
spark.stop()
"""


def test_spark_registered_jvm_udfs_cross_path(jar):
    script = _SPARK_SCRIPT.format(repo=REPO, jar=jar, pub=PUB, priv=PRIV)
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, cwd=REPO, timeout=300
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "CROSS-PATH-OK" in proc.stdout
    assert "ERRMSG-OK" in proc.stdout
