"""SecretManager — PySpark analog of ``CREATE SECRET (TYPE age, ...)``.

The reference registers a DuckDB secret type "age" with a "config" provider
and five VARCHAR named params (reference: src/age_extension.cpp:144-162), with
validation + file loading in CreateAgeSecretFromConfig (reference:
src/age_extension.cpp:73-142) and ReadKeyFromFile (reference:
src/age_extension.cpp:47-71).  PySpark cannot extend the SQL parser, so the
surface is a Python API with identical validation and error strings, plus a
tiny ``sql()`` front-end that accepts the reference's CREATE/DROP SECRET
statements for test parity (SURVEY.md §7.5-6).

Secrets live driver-side.  The UDF layer captures an immutable snapshot of
the resolved ``{name: {public_key, private_key}}`` map at registration time
and re-registers the UDFs after every mutation so executors always see the
current state (SURVEY.md §4.2 — the analog of DuckDB's per-row catalog
lookup, minus the per-row cost).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable

from . import errors

MAX_KEY_FILE_BYTES = 1024 * 1024  # reference: src/age_extension.cpp:58-60


@dataclass
class AgeSecret:
    name: str
    type: str = "age"
    provider: str = "config"
    scope: str = ""
    public_key: str | None = None
    private_key: str | None = None
    key_id: str | None = None

    def as_row(self, redact: bool = True) -> dict:
        return {
            "name": self.name,
            "type": self.type,
            "provider": self.provider,
            "scope": self.scope,
            "key_id": self.key_id,
            "public_key": self.public_key,
            "private_key": ("***REDACTED***" if self.private_key is not None else None)
            if redact
            else self.private_key,
        }


def _read_key_from_file(path: str) -> str:
    """Reference: src/age_extension.cpp:47-71 — exists, ≤1 MB, trimmed."""
    p = Path(path)
    try:
        if not p.is_file():
            raise errors.AgeError(errors.key_file_missing(path))
        if p.stat().st_size > MAX_KEY_FILE_BYTES:
            raise errors.AgeError(errors.key_file_too_large(path))
        return p.read_text().strip()
    except errors.AgeError:
        raise
    except OSError:
        raise errors.AgeError(errors.key_file_missing(path)) from None


class SecretManager:
    """Driver-side registry of age secrets with reference-parity validation."""

    def __init__(self) -> None:
        self._secrets: dict[str, AgeSecret] = {}
        self._listeners: list[Callable[[], None]] = []

    # -- mutation ---------------------------------------------------------

    def create_secret(
        self,
        name: str,
        type: str = "age",
        provider: str = "config",
        scope: str = "",
        public_key: str | None = None,
        private_key: str | None = None,
        public_key_file: str | None = None,
        private_key_file: str | None = None,
        key_id: str | None = None,
        replace: bool = False,
    ) -> AgeSecret:
        if type.lower() != "age":
            raise errors.AgeError(f"Secret type '{type}' not found")
        if not replace and name in self._secrets:
            # DuckDB core behavior for duplicate CREATE SECRET
            raise errors.AgeError(f"Temporary secret with name '{name}' already exists!")

        secret = AgeSecret(name=name, provider=provider, scope=scope, key_id=key_id)

        # public key: inline xor file (reference: src/age_extension.cpp:81-106)
        if public_key is not None and public_key_file is not None:
            raise errors.AgeError(errors.BOTH_PUBLIC_ERR)
        if public_key is not None:
            if not public_key.startswith("age1"):
                raise errors.AgeError(errors.PUBLIC_KEY_PREFIX_ERR)
            secret.public_key = public_key
        elif public_key_file is not None:
            try:
                loaded = _read_key_from_file(public_key_file)
                if not loaded.startswith("age1"):
                    raise errors.AgeError(errors.PUBLIC_KEY_FILE_PREFIX_ERR)
                secret.public_key = loaded
            except errors.AgeError as e:
                raise errors.AgeError(errors.failed_to_read_key_file("public", str(e))) from None

        # private key: inline xor file (reference: src/age_extension.cpp:108-135)
        if private_key is not None and private_key_file is not None:
            raise errors.AgeError(errors.BOTH_PRIVATE_ERR)
        if private_key is not None:
            if not private_key.startswith("AGE-SECRET-KEY-1"):
                raise errors.AgeError(errors.PRIVATE_KEY_PREFIX_ERR)
            secret.private_key = private_key
        elif private_key_file is not None:
            try:
                loaded = _read_key_from_file(private_key_file)
                if not loaded.startswith("AGE-SECRET-KEY-1"):
                    raise errors.AgeError(errors.PRIVATE_KEY_FILE_PREFIX_ERR)
                secret.private_key = loaded
            except errors.AgeError as e:
                raise errors.AgeError(errors.failed_to_read_key_file("private", str(e))) from None

        self._secrets[name] = secret
        self._notify()
        return secret

    def drop_secret(self, name: str, if_exists: bool = False) -> None:
        if name not in self._secrets:
            if if_exists:
                return
            raise errors.AgeError(
                f"Failed to drop secret: secret with name '{name}' does not exist"
            )
        del self._secrets[name]
        self._notify()

    # -- inspection -------------------------------------------------------

    def get(self, name: str) -> AgeSecret | None:
        return self._secrets.get(name)

    def snapshot(self) -> dict[str, dict[str, str | None]]:
        """Picklable {name: {public_key, private_key}} map for UDF closures."""
        return {
            n: {"public_key": s.public_key, "private_key": s.private_key}
            for n, s in self._secrets.items()
        }

    def secrets(self, spark=None):
        """Analog of ``duckdb_secrets()`` (reference:
        test/sql/age_secret.test:23-26) — private keys redacted."""
        rows = [s.as_row(redact=True) for s in self._secrets.values()]
        if spark is None:
            return rows
        from pyspark.sql.types import StringType, StructField, StructType

        schema = StructType(
            [
                StructField(c, StringType())
                for c in ("name", "type", "provider", "scope", "key_id", "public_key", "private_key")
            ]
        )
        return spark.createDataFrame(rows, schema=schema)

    # -- change propagation ----------------------------------------------

    def add_listener(self, fn: Callable[[], None]) -> None:
        self._listeners.append(fn)

    def remove_listener(self, fn: Callable[[], None]) -> None:
        """Discard semantics: unknown listeners are a no-op, so callers can
        unconditionally drop a stale handle (ADVICE r11 — re-binding a
        session to a previously used manager must not accumulate dead
        listeners that pin stopped sessions and duplicate re-stage work)."""
        try:
            self._listeners.remove(fn)
        except ValueError:
            pass

    def _notify(self) -> None:
        for fn in self._listeners:
            fn()

    # -- SQL front-end for test parity ------------------------------------

    _CREATE_RE = re.compile(
        r"^\s*CREATE\s+(?:(OR\s+REPLACE)\s+)?SECRET\s+(?:(IF\s+NOT\s+EXISTS)\s+)?"
        r"(\w+)\s*\(\s*(.*)\)\s*;?\s*$",
        re.IGNORECASE | re.DOTALL,
    )
    _DROP_RE = re.compile(
        r"^\s*DROP\s+SECRET\s+(?:(IF\s+EXISTS)\s+)?(\w+)\s*;?\s*$", re.IGNORECASE
    )
    _PARAM_RE = re.compile(r"(\w+)\s+'((?:[^']|'')*)'", re.DOTALL)

    def sql(self, statement: str):
        """Accept the reference's ``CREATE SECRET`` / ``DROP SECRET`` SQL
        (reference: test/sql/age_secret.test) against this manager."""
        m = self._CREATE_RE.match(statement)
        if m:
            replace, if_not_exists, name, body = m.groups()
            params: dict[str, str] = {}
            for key, val in self._PARAM_RE.findall(body):
                params[key.lower()] = val.replace("''", "'")
            if if_not_exists and name in self._secrets:
                return None
            secret_type = params.pop("type", "age")
            allowed = {"public_key", "private_key", "public_key_file", "private_key_file", "key_id"}
            unknown = set(params) - allowed
            if unknown:
                raise errors.AgeError(
                    f"Unknown parameter '{sorted(unknown)[0]}' for secret type 'age'"
                )
            return self.create_secret(
                name, type=secret_type, replace=bool(replace), **params
            )
        m = self._DROP_RE.match(statement)
        if m:
            if_exists, name = m.groups()
            self.drop_secret(name, if_exists=bool(if_exists))
            return None
        raise errors.AgeError(f"Cannot parse secret statement: {statement!r}")


# Module-level default manager (the analog of DuckDB's per-database secret
# catalog; one per driver process).
default_manager = SecretManager()
