"""simhash_pairs signature_column path: precomputed fingerprints feed the
banding directly — incl. uint64 signatures with the top bit set (a checked
int64 cast would raise; the path must bit-reinterpret)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _pairs(ds, **kw):
    from mismo_ray.dedupe import simhash_pairs

    out = simhash_pairs(ds, None, signature_column="sig", **kw).links_ds
    return {
        (r["record_id_l"], r["record_id_r"]) for r in out.take_all()
    }


def test_uint64_signatures_top_bit(ray_session):
    base = np.uint64(0x9E3779B97F4A7C15)  # top bit set
    sigs = np.array(
        [base, base ^ np.uint64(0b11), base ^ np.uint64(0xFF), np.uint64(7)],
        dtype=np.uint64,
    )
    ds = ray.data.from_arrow(
        pa.table(
            {
                "record_id": pa.array(np.arange(4, dtype=np.int64)),
                "sig": pa.array(sigs, type=pa.uint64()),
            }
        )
    )
    got = _pairs(ds, max_hamming=3)
    # hamming(0,1)=2 <= 3; hamming(0,2)=8, hamming(1,2)=8|^2.. > 3; id 3 far
    assert got == {(0, 1)}


def test_int64_signatures_match_uint64_bits(ray_session):
    """The same BIT PATTERNS given as int64 and uint64 must pair
    identically (the cast is a reinterpret, not a value conversion)."""
    raw = np.array(
        [0x8000000000000001, 0x8000000000000003, 0x0123456789ABCDEF],
        dtype=np.uint64,
    )
    rid = pa.array(np.arange(3, dtype=np.int64))
    as_u = ray.data.from_arrow(
        pa.table({"record_id": rid, "sig": pa.array(raw, type=pa.uint64())})
    )
    as_i = ray.data.from_arrow(
        pa.table(
            {
                "record_id": rid,
                "sig": pa.array(raw.view(np.int64), type=pa.int64()),
            }
        )
    )
    assert _pairs(as_u) == _pairs(as_i) == {(0, 1)}


def test_null_signatures_pair_with_nothing(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "record_id": pa.array([0, 1, 2], type=pa.int64()),
                "sig": pa.array([5, None, 5], type=pa.int64()),
            }
        )
    )
    assert _pairs(ds) == {(0, 2)}


def test_simhash_charhash_kernel():
    """The SQL-expressible charhash simhash: definition parity with a
    direct python recomputation, plus null/empty/short handling."""
    import numpy as np

    from mismo_ray.dedupe import charshingle_hashes, simhash64_charhash_batch

    texts = ["the quick brown fox jumps", "the quick brown fox jumpy",
             "completely different words here", None, "", "abc"]
    got = simhash64_charhash_batch(texts, shingle_w=6, seed=7)
    assert got[3] is None and got[4] == 0
    for i in (0, 1, 2, 5):
        base = charshingle_hashes(texts[i], 6, seed=7)
        sig = 0
        for k in range(64):
            pm = sum(1 if (int(h) >> k) & 1 else -1 for h in base)
            if pm > 0:
                sig |= 1 << k
        want = sig - (1 << 64) if sig >= (1 << 63) else sig
        assert got[i] == want, i
    # near-identical docs land near in hamming space; unrelated docs far
    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    assert ham(got[0], got[1]) < ham(got[0], got[2])
