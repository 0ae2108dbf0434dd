"""Pin the statistics of the minhash sf10 crosscheck (VERDICT r13 item 3).

The crosscheck compares engine recall over PLANTED near-dup pairs against
the exact closed-form detection probability of the 8-hash/4-band/est>=0.5
LSH scheme.  Its first sf10 run failed a naive binomial gate because the
sf10 fixture is 100 single-token-tagged replicas per base doc — detection
outcomes within a replica cluster are nearly comonotone, so independence-
based tolerances understate the variance by ~the cluster size.  These
tests pin (a) the closed form against independent bounds and (b) the
clustered tolerance model, including the exact failure shape the naive
gate produced (so a regression back to per-pair binomial math fails here
before it fails a 4-minute sf10 run).

No Spark session required — pure functions from the script module.
"""

from __future__ import annotations

import importlib.util
import math
import os

import pytest

_SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "minhash_sf10_crosscheck.py",
)
_spec = importlib.util.spec_from_file_location("minhash_sf10_crosscheck", _SCRIPT)
xc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(xc)


def _binom_tail_ge(n: int, k: int, s: float) -> float:
    return sum(math.comb(n, i) * s**i * (1 - s) ** (n - i) for i in range(k, n + 1))


class TestDetectionProbability:
    def test_edges(self):
        assert xc.detection_probability(0.0) == 0.0
        assert xc.detection_probability(1.0) == 1.0
        # negatives / overshoot clamp rather than extrapolate
        assert xc.detection_probability(-0.1) == 0.0
        assert xc.detection_probability(1.3) == 1.0

    def test_monotone_in_s(self):
        grid = [i / 50 for i in range(51)]
        ps = [xc.detection_probability(s) for s in grid]
        assert all(b >= a - 1e-12 for a, b in zip(ps, ps[1:]))

    def test_bounded_by_banding_and_est_filter(self):
        """Detected = [some band fully matches] AND [>=4 of 8 elements
        match], so p(s) is bounded by each event's own closed form:
        banding 1-(1-s^r)^b with r=2,b=4, and the binomial tail
        P[Bin(8,s)>=4] — and from below by their union-bound overlap."""
        for s in (0.1, 0.25, 0.4, 0.55, 0.7, 0.85, 0.95):
            p = xc.detection_probability(s)
            banding = 1.0 - (1.0 - s**2) ** 4
            tail = _binom_tail_ge(8, 4, s)
            assert p <= banding + 1e-12
            assert p <= tail + 1e-12
            assert p >= banding + tail - 1.0 - 1e-12  # P[A∩B] >= P[A]+P[B]-1

    def test_matches_independent_enumeration(self):
        """Independent re-derivation: sum over the 8-bit pattern lattice
        written with itertools instead of bit twiddling."""
        import itertools

        for s in (0.3, 0.6):
            p = 0.0
            for bits in itertools.product((0, 1), repeat=8):
                if sum(bits) < 4:
                    continue
                if not any(bits[2 * b] and bits[2 * b + 1] for b in range(4)):
                    continue
                k = sum(bits)
                p += s**k * (1 - s) ** (8 - k)
            assert xc.detection_probability(s) == pytest.approx(p, abs=1e-12)


class TestClusteredTolerance:
    def test_singleton_clusters_reduce_to_binomial(self):
        """At sf0.1 (no replicas) every cluster is one pair — the
        comonotone bound must equal the plain binomial tolerance, so the
        same script gates both scales without a mode switch."""
        ps = [0.1, 0.35, 0.5, 0.77, 0.92]
        assert xc.comonotone_tolerance([[p] for p in ps]) == pytest.approx(
            xc.binomial_tolerance(ps)
        )

    def test_cluster_scaling_is_linear_not_sqrt(self):
        """m clusters of k identical pairs: comonotone sd is k·sqrt(m)·σ
        (each cluster moves as one unit), binomial sd is sqrt(mk)·σ —
        ratio sqrt(k).  This is the whole r14 finding in one identity."""
        m, k, p = 31, 100, 0.149
        sigma = math.sqrt(p * (1 - p))
        clustered = xc.comonotone_tolerance([[p] * k] * m)
        naive = xc.binomial_tolerance([p] * (m * k))
        assert clustered == pytest.approx(6.0 * k * math.sqrt(m) * sigma + 2.0)
        assert naive == pytest.approx(6.0 * math.sqrt(m * k) * sigma + 2.0)
        assert (clustered - 2.0) / (naive - 2.0) == pytest.approx(math.sqrt(k))

    def test_r14_failure_shape_regression(self):
        """The observed first-run sf10 deviation in the [0.2,0.3) decile:
        3,100 pairs in 31 hundred-replica clusters, mean p 0.149, engine
        observed 134 BELOW expectation.  A per-pair binomial gate refuses
        it (the bug this test guards against re-introducing); the
        comonotone cluster bound accepts it with room — the deviation is
        ~0.7 cluster-sigma, i.e. ordinary sampling noise at 31
        independent draws."""
        m, k, p, deviation = 31, 100, 0.149, 134.0
        assert deviation > xc.binomial_tolerance([p] * (m * k))
        assert deviation < xc.comonotone_tolerance([[p] * k] * m)

    def test_mixed_cluster_sizes(self):
        """Variance adds across clusters whatever their sizes; a split
        cluster (decile boundary) only ever TIGHTENS the bound, never
        loosens it, so per-bucket grouping stays conservative."""
        whole = xc.comonotone_tolerance([[0.4] * 10])
        split = xc.comonotone_tolerance([[0.4] * 6, [0.4] * 4])
        assert split < whole
