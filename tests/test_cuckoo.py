"""Cuckoo-filter URL-seen variant (EngineConfig.seen_filter="cuckoo"):
no false negatives ever, sane FPP, order-independent determinism, and
engine equality with the bloom path."""

from __future__ import annotations

import numpy as np
import pytest

from crawlfront import cuckoo


def _keys(n, seed):
    rng = np.random.RandomState(seed)
    h32 = rng.randint(-(2**31), 2**31 - 1, size=n).astype(np.int32)
    h64 = rng.randint(-(2**62), 2**62, size=n).astype(np.int64)
    return h32, h64


def test_no_false_negatives_and_sane_fpp():
    n = 20_000
    nb = cuckoo.cuckoo_params(n)
    table = np.zeros(nb * cuckoo.SLOTS, dtype=np.uint16)
    h32, h64 = _keys(n, seed=1)
    assert cuckoo.insert_keys(table, h32, h64, nb) == n
    assert cuckoo.contains(table, h32, h64, nb).all()  # zero false negatives
    o32, o64 = _keys(n, seed=2)
    fpp = cuckoo.contains(table, o32, o64, nb).mean()
    # 16-bit fingerprints, 2 buckets x 4 slots: FPP ~ 8/2^16 ≈ 0.012%
    assert fpp < 0.005, fpp


def test_insert_order_independent():
    """Arrow chunk order must not leak into filter state: inserts are
    internally sorted, so any permutation yields identical bytes."""
    nb = cuckoo.cuckoo_params(5000)
    h32, h64 = _keys(5000, seed=3)
    t1 = np.zeros(nb * cuckoo.SLOTS, dtype=np.uint16)
    cuckoo.insert_keys(t1, h32, h64, nb)
    perm = np.random.RandomState(0).permutation(5000)
    t2 = np.zeros(nb * cuckoo.SLOTS, dtype=np.uint16)
    cuckoo.insert_keys(t2, h32[perm], h64[perm], nb)
    assert (t1 == t2).all()


def test_sharded_keys_fill_to_nominal_capacity():
    """Regression: within one shard every key agrees on its low
    log2(n_shards) bits of h32 (shard = pmod(h32, n_shards)).  The
    primary bucket must therefore NOT be derived from h32 — doing so
    collapsed the shard to n_buckets/n_shards primary buckets and raised
    'overfull' at ~42% of nominal capacity."""
    n = 50_000
    nb = cuckoo.cuckoo_params(n)
    h32, h64 = _keys(n, seed=5)
    h32 = (h32 - (h32 % 64) + 7).astype(np.int32)  # shard key: h32 % 64 == 7
    table = np.zeros(nb * cuckoo.SLOTS, dtype=np.uint16)
    assert cuckoo.insert_keys(table, h32, h64, nb) == n  # no overfull raise
    assert cuckoo.contains(table, h32, h64, nb).all()


def test_overfull_raises_not_drops():
    nb = 8  # 32 slots
    h32, h64 = _keys(64, seed=4)
    table = np.zeros(nb * cuckoo.SLOTS, dtype=np.uint16)
    with pytest.raises(RuntimeError, match="overfull"):
        cuckoo.insert_keys(table, h32, h64, nb)


def test_engine_cuckoo_equals_bloom(spark, fixture_dir, tmp_path):
    """The prefilter choice must be invisible in every committed table
    (the J4 exact confirm makes correctness FPP-independent)."""
    from crawlfront.frontier import CrawlEngine, EngineConfig

    outs = {}
    for filt in ("bloom", "cuckoo"):
        eng = CrawlEngine(spark, fixture_dir, tmp_path / filt,
                          EngineConfig(seen_filter=filt))
        eng.run(3)
        outs[filt] = {
            w: sorted(tuple(r) for r in getattr(eng, w)().collect())
            for w in ("results", "frontier", "seen_keys", "counters")
        }
    for w in outs["bloom"]:
        assert outs["bloom"][w] == outs["cuckoo"][w], w
