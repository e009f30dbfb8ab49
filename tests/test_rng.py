"""Counter-based RNG tests (reference RNG subsystem: SURVEY.md C3).

The reference's closest analogue is the shared pre-generated random array
consumed by both CPU and GPU pricers (inc/testing.cuh:17-42); here the
invariants are stronger: known-answer vectors, backend/tiling invariance,
and statistical quality of the Box-Muller normals.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mc_tpu import rng

# Official Random123 known-answer vectors for threefry2x32, 20 rounds.
KAT = [
    ((0, 0), (0, 0), (0x6B200159, 0x99BA4EFE)),
    ((0xFFFFFFFF, 0xFFFFFFFF), (0xFFFFFFFF, 0xFFFFFFFF),
     (0x1CB996FC, 0xBB002BE7)),
    ((0x243F6A88, 0x85A308D3), (0x13198A2E, 0x03707344),
     (0xC4923A9C, 0x483DF7A0)),
]


@pytest.mark.parametrize("ctr,key,expected", KAT)
def test_threefry_known_answers(ctr, key, expected):
    a, b = rng.threefry2x32(jnp.uint32(key[0]), jnp.uint32(key[1]),
                            jnp.uint32(ctr[0]), jnp.uint32(ctr[1]))
    assert (int(a), int(b)) == expected


@pytest.mark.parametrize("ctr,key,expected", KAT)
def test_threefry_numpy_mirror(ctr, key, expected):
    a, b = rng._threefry_scalar_np(np.uint32(key[0]), np.uint32(key[1]),
                                   np.uint32(ctr[0]), np.uint32(ctr[1]))
    assert (int(a), int(b)) == expected


def test_derive_key_streams_differ():
    root = rng.derive_key(1234)
    outer = rng.derive_key(1234, 0)
    inner = rng.derive_key(1234, 1)
    assert root != outer != inner
    assert rng.derive_key(1234, 0) == outer  # deterministic


def test_fold_key_matches_derive_key():
    k = rng.derive_key(77)
    folded = rng.fold_key(jnp.uint32(k[0]), jnp.uint32(k[1]), 5)
    host = rng.derive_key(77, 5)
    assert (int(folded[0]), int(folded[1])) == (int(host[0]), int(host[1]))


def test_bits_to_unit_range_and_determinism():
    bits = jnp.arange(0, 2**32 - 1, 65537, dtype=jnp.uint32)
    u = rng.bits_to_unit(bits)
    assert float(jnp.min(u)) >= 0.0
    assert float(jnp.max(u)) < 1.0
    # Mean of the mapped uniforms over an arithmetic bit progression ~ 0.5.
    assert float(jnp.mean(u)) == pytest.approx(0.5, abs=1e-3)


def test_normals_moments():
    key = rng.derive_key(1234)
    ids = jnp.arange(1 << 14, dtype=jnp.uint32)
    z = rng.normals(key, ids, n_draws=8)  # 8 * 16384 draws
    z = np.asarray(z).ravel()
    assert z.mean() == pytest.approx(0.0, abs=0.01)
    assert z.std() == pytest.approx(1.0, abs=0.01)
    assert abs(((z**3).mean())) < 0.05  # skewness
    assert (z**4).mean() == pytest.approx(3.0, abs=0.15)  # kurtosis


def test_normals_tiling_invariance():
    """Draw (path i, draw j) is identical no matter the array shape."""
    key = rng.derive_key(9)
    ids_flat = jnp.arange(1024, dtype=jnp.uint32)
    ids_2d = ids_flat.reshape(8, 128)
    z_flat = rng.normals(key, ids_flat, n_draws=2)
    z_2d = rng.normals(key, ids_2d, n_draws=2)
    np.testing.assert_array_equal(np.asarray(z_flat),
                                  np.asarray(z_2d).reshape(2, -1))


def test_normals_draw_offset():
    """Draws [2,4) equal draws [0,4)[2:] — resumable streams."""
    key = rng.derive_key(5)
    ids = jnp.arange(256, dtype=jnp.uint32)
    z_all = rng.normals(key, ids, n_draws=4)
    z_tail = rng.normals(key, ids, n_draws=2, draw_offset=2)
    np.testing.assert_array_equal(np.asarray(z_all[2:]), np.asarray(z_tail))


def test_independent_streams_uncorrelated():
    k_outer = rng.derive_key(1234, 0)
    k_inner = rng.derive_key(1234, 1)
    ids = jnp.arange(1 << 13, dtype=jnp.uint32)
    z0 = np.asarray(rng.normals(k_outer, ids, n_draws=1)[0])
    z1 = np.asarray(rng.normals(k_inner, ids, n_draws=1)[0])
    corr = np.corrcoef(z0, z1)[0, 1]
    assert abs(corr) < 0.05


def test_derive_key_negative_seed():
    """Regression (advisor): negative seeds raised OverflowError in
    NumPy 2; they now wrap mod 2^64 like any uint64 literal."""
    assert rng.derive_key(-1) == rng.derive_key(2**64 - 1)
    assert rng.derive_key(5, -3) == rng.derive_key(5, 2**64 - 3)
