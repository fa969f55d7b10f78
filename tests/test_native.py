"""Native C++ kernels vs their numpy reference implementations."""

import numpy as np
import pytest

from soap_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _hilbert_numpy(ijk, bits):
    # the pure-numpy path inside parallel.domain (fallback branch)
    from soap_tpu.parallel import domain

    x = ijk.astype(np.uint64).copy()
    n = 3
    m = np.uint64(1) << np.uint64(bits - 1)
    q = m
    while q > np.uint64(1):
        p = q - np.uint64(1)
        for i in range(n):
            mask = (x[:, i] & q) != 0
            x[mask, 0] ^= p
            t = (x[:, 0] ^ x[:, i]) & p
            x[~mask, 0] ^= t[~mask]
            x[~mask, i] ^= t[~mask]
        q >>= np.uint64(1)
    for i in range(1, n):
        x[:, i] ^= x[:, i - 1]
    t = np.zeros(len(x), dtype=np.uint64)
    q = m
    while q > np.uint64(1):
        mask = (x[:, n - 1] & q) != 0
        t[mask] ^= q - np.uint64(1)
        q >>= np.uint64(1)
    for i in range(n):
        x[:, i] ^= t
    key = np.zeros(len(x), dtype=np.uint64)
    for b in range(bits - 1, -1, -1):
        for i in range(n):
            key = (key << np.uint64(1)) | ((x[:, i] >> np.uint64(b)) & np.uint64(1))
    return key


def test_hilbert_native_matches_numpy(rng):
    bits = 10
    ijk = rng.integers(0, 1 << bits, (5000, 3)).astype(np.int64)
    native_keys = native.hilbert_keys_3d(ijk, bits)
    numpy_keys = _hilbert_numpy(ijk, bits)
    np.testing.assert_array_equal(native_keys, numpy_keys)


def test_match_ids(rng):
    haystack = rng.permutation(np.arange(1, 20001)).astype(np.uint64)
    needles = np.concatenate(
        [haystack[rng.integers(0, 20000, 5000)], np.array([99999999], np.uint64)]
    )
    rows = native.match_ids(needles, haystack)
    assert rows[-1] == -1
    hit = rows[:-1]
    np.testing.assert_array_equal(haystack[hit], needles[:-1])


def test_split_hi_lo(rng):
    x = rng.uniform(0, 1000.0, (1000, 3)) + rng.normal(0, 1e-7, (1000, 3))
    hi, lo = native.split_hi_lo(x)
    np.testing.assert_array_equal(hi, x.astype(np.float32))
    np.testing.assert_allclose(
        hi.astype(np.float64) + lo.astype(np.float64), x, rtol=0, atol=1e-9
    )
