"""Bit-parity tests for ops.selection.blocked_top_k vs jax.lax.top_k.

The module's docstring argues blocked selection reproduces ``lax.top_k``
exactly, tie order included; these tests fuzz that claim, leaning on dense
tie spectra (few distinct values over many candidates) where any tie-break
deviation would surface immediately.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpudet.ops.selection import blocked_top_k


def _assert_bitparity(scores, k, block_size):
    ev, ei = jax.lax.top_k(scores, k)
    bv, bi = blocked_top_k(scores, k, block_size=block_size)
    np.testing.assert_array_equal(np.asarray(ev), np.asarray(bv))
    np.testing.assert_array_equal(np.asarray(ei), np.asarray(bi))


@pytest.mark.parametrize("n,k,block", [
    (20000, 1000, 4096),   # multi-block, pad-free-ish FPN-like shape
    (129792, 1000, 8192),  # the real P2 grid at 832^2 (ragged last block)
    (5000, 1000, 4096),    # falls back: merge operand not smaller
    (4096, 64, 4096),      # single block: direct fallback
    (300, 300, 128),       # k == n
])
def test_random_scores(n, k, block):
    scores = jax.random.normal(jax.random.key(n + k), (n,), jnp.float32)
    _assert_bitparity(scores, k, block)


@pytest.mark.parametrize("distinct", [1, 2, 7])
def test_dense_ties(distinct):
    """Few distinct values over 40k candidates: selection is decided almost
    entirely by tie order, which must match lax.top_k (ascending index)."""
    rng = np.random.default_rng(distinct)
    vals = np.linspace(-1.0, 1.0, distinct, dtype=np.float32)
    scores = jnp.asarray(rng.choice(vals, size=40000))
    _assert_bitparity(scores, 1000, 4096)


def test_boundary_ties_cross_block():
    """The k-th value ties across many blocks; lowest global indices win."""
    n, k, block = 32768, 512, 4096
    scores = np.full(n, 0.25, np.float32)
    # 100 strictly-greater entries scattered across blocks.
    rng = np.random.default_rng(0)
    hi = rng.choice(n, size=100, replace=False)
    scores[hi] = 1.0
    _assert_bitparity(jnp.asarray(scores), k, block)


def test_dtype_min_values_never_displaced_by_padding():
    """Real entries at the dtype minimum must still beat the pad fill."""
    n, k, block = 10000, 4000, 2048  # ragged: pad = 6*2048 - 10000
    fill = np.float32(np.finfo(np.float32).min)
    scores = np.full(n, fill, np.float32)
    scores[:10] = 0.0
    bv, bi = blocked_top_k(jnp.asarray(scores), k, block_size=block)
    assert int(jnp.max(bi)) < n  # no out-of-range (padded) index leaks out
    _assert_bitparity(jnp.asarray(scores), k, block)


def test_bfloat16():
    scores = jax.random.normal(jax.random.key(3), (30000,), jnp.bfloat16)
    _assert_bitparity(scores, 1000, 4096)


def test_under_jit_and_grad_free_path():
    f = jax.jit(lambda s: blocked_top_k(s, 1000, block_size=4096))
    scores = jax.random.normal(jax.random.key(9), (50000,), jnp.float32)
    bv, bi = f(scores)
    ev, ei = jax.lax.top_k(scores, 1000)
    np.testing.assert_array_equal(np.asarray(ev), np.asarray(bv))
    np.testing.assert_array_equal(np.asarray(ei), np.asarray(bi))
