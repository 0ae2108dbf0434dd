#!/usr/bin/env python
"""Recompute the driver-attestation rotation (`_PRIORITY_50`) for a round.

The driver records CORRECTNESS rows for only the FIRST 50 `queries()`
entries, so `contract._PRIORITY_50` is rotated each round to bound
attestation staleness.  This script implements the documented greedy
(ROADMAP r12 item 2, VERDICT r12 next-round item 1):

1. parse CORRECTNESS_r01..rN.json → last round each query was attested
   (a query counts as attested in round r when its row exists, err is
   null, and all three checks pass);
2. pin the 9 permanent crypto slots (SURVEY §2a re-attests every round);
3. pin FORCED slots passed on the command line (never-attested widenings
   and queries whose implementation changed this round);
4. fill the remaining slots oldest-first (ascending last-attested round,
   alphabetical tiebreak);
5. iterate family gates against the CHOSEN set: while some family in
   duckdb_age_spark.families.FAMILIES has no chosen member, swap in that
   family's oldest-attested member and evict the newest-attested
   non-pinned choice whose family keeps another representative.

Usage:  python scripts/rotation.py [--force name ...]
Prints the new list as a ready-to-paste Python block plus diagnostics
(staleness histogram, evictions vs the current list).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CRYPTO_CORE = [
    "age_roundtrip",
    "age_multi_roundtrip",
    "age_keygen_check",
    "age_seeded_keygen",
    "age_error_dispatch",
    "age_secret_roundtrip",
    "age_secrets_listing",
    "age_version",
    "age_secret_files",
]


def last_attested(repo: str) -> dict[str, int]:
    """Map query name → newest round whose CORRECTNESS row fully passed."""
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        for name, row in json.load(open(path)).items():
            ok = (
                row.get("err") is None
                and row.get("rows_match")
                and row.get("schema_match")
                # rows-only checks have no hash; treat explicit False as fail
                and row.get("hash_match") is not False
            )
            if ok:
                out[name] = max(out.get(name, 0), rnd)
    return out


def compute(forced: list[str]) -> tuple[list[str], dict]:
    from duckdb_age_spark import contract
    from duckdb_age_spark.families import FAMILIES

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    att = last_attested(repo)
    all_names = [n for n in contract.QUERIES if n in contract.ORACLE_SQL]
    # queries without an oracle row can't produce a full three-check driver
    # row; they are attested rows-only and never occupy a priority slot
    rows_only = [n for n in contract.QUERIES if n not in contract.ORACLE_SQL]

    pinned = list(CRYPTO_CORE) + [f for f in forced if f not in CRYPTO_CORE]
    unknown = [f for f in forced if f not in contract.QUERIES]
    assert not unknown, f"--force names unknown queries: {unknown}"

    def age_key(n: str) -> tuple[int, str]:
        return (att.get(n, 0), n)  # never-attested (0) sorts oldest

    pool = sorted((n for n in all_names if n not in pinned), key=age_key)
    chosen = pinned + pool[: 50 - len(pinned)]

    # family gates, iterated against the CHOSEN set
    def uncovered() -> list[str]:
        cs = set(chosen)
        return [f for f, mem in FAMILIES.items() if not cs & set(mem)]

    swaps = []
    while fams := uncovered():
        fam = fams[0]
        cands = sorted(
            (n for n in FAMILIES[fam] if n in contract.ORACLE_SQL and n not in chosen),
            key=age_key,
        )
        assert cands, f"family {fam} has no oracle-gated member to pin"
        incoming = cands[0]
        # evict the newest-attested non-pinned choice whose own family
        # keeps another representative after the eviction
        cs = set(chosen)
        for victim in sorted(chosen, key=age_key, reverse=True):
            if victim in pinned:
                continue
            vfams = [f for f, mem in FAMILIES.items() if victim in mem]
            if all(len((cs - {victim}) & set(FAMILIES[f])) >= 1 for f in vfams):
                chosen.remove(victim)
                chosen.append(incoming)
                swaps.append((incoming, victim))
                break
        else:
            raise AssertionError(f"no evictable slot for family gate {fam}")

    assert len(chosen) == len(set(chosen)) == 50
    ordered = pinned + sorted((n for n in chosen if n not in pinned), key=age_key)
    info = {
        "attested_rounds": {n: att.get(n, 0) for n in ordered},
        "staleness_after": sorted(
            {n: att.get(n, 0) for n in all_names if n not in ordered}.items(),
            key=lambda kv: kv[1],
        )[:15],
        "gate_swaps": swaps,
        "rows_only_queries": rows_only,
        "evicted_vs_current": [n for n in contract._PRIORITY_50 if n not in ordered],
        "added_vs_current": [n for n in ordered if n not in contract._PRIORITY_50],
    }
    return ordered, info


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--force", nargs="*", default=[], help="extra pinned slots")
    args = ap.parse_args()
    ordered, info = compute(args.force)
    print("_PRIORITY_50 = [")
    for n in ordered:
        print(f'    "{n}",  # last attested r{info["attested_rounds"][n]}')
    print("]")
    print("\n# diagnostics", file=sys.stderr)
    print(json.dumps(info, indent=2), file=sys.stderr)


if __name__ == "__main__":
    main()
