"""Ported reference secret-lifecycle tests (reference:
test/sql/age_secret.test) against SecretManager — both the Python API and the
``sql()`` front-end.  Pure Python, no Spark."""

from __future__ import annotations

import pytest

from duckdb_age_spark import errors
from duckdb_age_spark.secrets import SecretManager
from tests.conftest import PRIV2, PUB2


@pytest.fixture()
def mgr():
    return SecretManager()


@pytest.fixture()
def key_files(tmp_path):
    pub = tmp_path / "test_public_key.txt"
    priv = tmp_path / "test_private_key.txt"
    bad = tmp_path / "invalid_public_key.txt"
    pub.write_text(PUB2 + "\n")  # loader must trim (reference: src/age_extension.cpp:68)
    priv.write_text(PRIV2 + "\n")
    bad.write_text("this is not an age key\n")
    return {"pub": str(pub), "priv": str(priv), "bad": str(bad), "missing": str(tmp_path / "nope.txt")}


# reference: test/sql/age_secret.test:14-26
def test_create_and_list(mgr):
    mgr.create_secret("test_age_key", public_key=PUB2, private_key=PRIV2)
    rows = mgr.secrets()
    assert [(r["name"], r["type"], r["provider"]) for r in rows] == [("test_age_key", "age", "config")]
    assert rows[0]["private_key"] == "***REDACTED***"
    assert rows[0]["public_key"] == PUB2  # public keys not redacted


# reference: test/sql/age_secret.test:28-41
def test_key_id_and_count(mgr):
    mgr.create_secret("test_age_key", public_key=PUB2, private_key=PRIV2)
    mgr.create_secret("my_age_key", public_key=PUB2, private_key=PRIV2, key_id="personal_key")
    rows = mgr.secrets()
    assert len([r for r in rows if r["type"] == "age"]) == 2
    assert {r["key_id"] for r in rows} == {None, "personal_key"}


# reference: test/sql/age_secret.test:43-61
def test_validation_prefixes(mgr):
    with pytest.raises(errors.AgeError, match="Age public key must start with 'age1'"):
        mgr.create_secret("bad_public_key", public_key="invalid_key", private_key=PRIV2)
    with pytest.raises(errors.AgeError, match="Age private key must start with 'AGE-SECRET-KEY-1'"):
        mgr.create_secret("bad_private_key", public_key=PUB2, private_key="invalid_private_key")


# reference: test/sql/age_secret.test:63-76
def test_file_based_keys(mgr, key_files):
    mgr.create_secret(
        "file_based_key",
        public_key_file=key_files["pub"],
        private_key_file=key_files["priv"],
        key_id="file_key",
    )
    s = mgr.get("file_based_key")
    assert s.public_key == PUB2 and s.private_key == PRIV2  # trimmed


# reference: test/sql/age_secret.test:78-86
def test_inline_and_file_exclusive(mgr, key_files):
    with pytest.raises(errors.AgeError, match="Cannot specify both 'public_key' and 'public_key_file'"):
        mgr.create_secret("mixed_key", public_key=PUB2, public_key_file=key_files["pub"])
    with pytest.raises(errors.AgeError, match="Cannot specify both 'private_key' and 'private_key_file'"):
        mgr.create_secret("mixed_key2", private_key=PRIV2, private_key_file=key_files["priv"])


# reference: test/sql/age_secret.test:88-96
def test_invalid_key_format_in_file(mgr, key_files):
    with pytest.raises(errors.AgeError, match="Age public key from file must start with 'age1'"):
        mgr.create_secret("invalid_file_key", public_key_file=key_files["bad"], private_key_file=key_files["priv"])


# reference: test/sql/age_secret.test:98-106
def test_missing_file(mgr, key_files):
    with pytest.raises(errors.AgeError, match="Failed to read public key file"):
        mgr.create_secret("missing_file_key", public_key_file=key_files["missing"], private_key_file=key_files["priv"])


def test_file_too_large(mgr, tmp_path):
    big = tmp_path / "big.txt"
    big.write_text("x" * (1024 * 1024 + 1))
    with pytest.raises(errors.AgeError, match=r"Key file too large \(max 1MB\)"):
        mgr.create_secret("big_key", public_key_file=str(big))


# reference: test/sql/age_secret.test:108-122
def test_drop_and_verify_empty(mgr):
    for n in ("test_age_key", "my_age_key", "file_based_key"):
        mgr.create_secret(n, public_key=PUB2, private_key=PRIV2)
    for n in ("test_age_key", "my_age_key", "file_based_key"):
        mgr.drop_secret(n)
    assert mgr.secrets() == []
    with pytest.raises(errors.AgeError, match="does not exist"):
        mgr.drop_secret("test_age_key")


def test_duplicate_create_errors(mgr):
    mgr.create_secret("dup", public_key=PUB2)
    with pytest.raises(errors.AgeError, match="already exists"):
        mgr.create_secret("dup", public_key=PUB2)
    mgr.create_secret("dup", public_key=PUB2, replace=True)  # OR REPLACE path


# --- the SQL front-end runs the reference's literal statements --------------


def test_sql_create_list_drop(mgr):
    mgr.sql(
        f"""CREATE SECRET test_age_key (
        TYPE 'age',
        public_key '{PUB2}',
        private_key '{PRIV2}'
    );"""
    )
    mgr.sql(
        f"""CREATE SECRET my_age_key (
        TYPE 'age',
        public_key '{PUB2}',
        private_key '{PRIV2}',
        key_id 'personal_key'
    );"""
    )
    assert len(mgr.secrets()) == 2
    with pytest.raises(errors.AgeError, match="Age public key must start with 'age1'"):
        mgr.sql(f"CREATE SECRET bad (TYPE 'age', public_key 'invalid_key', private_key '{PRIV2}');")
    mgr.sql("DROP SECRET test_age_key;")
    mgr.sql("DROP SECRET my_age_key;")
    assert mgr.secrets() == []


def test_sql_unquoted_type_and_caps(mgr):
    # reference: test/sql/age.test:44 uses TYPE age (unquoted) + PUBLIC_KEY caps
    mgr.sql(f"CREATE SECRET test_secret (TYPE age, PUBLIC_KEY '{PUB2}', PRIVATE_KEY '{PRIV2}')")
    assert mgr.get("test_secret").public_key == PUB2
