"""One-hot MXU deformable-attention kernel (kernels/deform_attn_mxu.py):
interpret-mode equivalence against the flat-gather formulation (the
numerical oracle, itself oracle-fuzzed in test_deformable_detr.py), forward
and backward, including out-of-grid zero-padding cases and query padding.

Tolerance design (round-5 hybrid kernels, with the error bound): the
kernel represents every f32 MXU data operand as hi + lo bf16 parts (the
chip's MXU rounds single-pass operands to bf16 — KERNELS.md "Deformable
attention, part 4"), so each split value carries relative error
<= 2^-9 * 2^-9 = 2^-18 (~3.8e-6); products are then exact and
accumulation is f32. The round-5 formulations fold the bilinear weights
into the selector, so the select stage is a third 2^-18 source (banded:
WyT split; flat: W2T split, whose wy*wx f32 corner products add a
negligible 2^-24) on top of the segment-sum and point-sum splits. An
output element sums 4 corner terms per point over P points with |term|
bounded by ~|v|max * w <= ~4 on these unit-normal cases, giving abs
error <= ~3 * P*4*4*2^-18 ~ 4e-4 worst-case (~1e-5 observed). The
asserts use atol within the derived worst-case bound (so a reseed of
the fuzz data cannot produce a spurious failure) / rtol=1e-3 (relative
blows up only under cancellation, which atol covers). Interpret mode
executes the SAME hi/lo splits as the chip, so these tolerances are the
design contract, not a hardware fudge.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpudet.kernels.deform_attn_mxu import ms_deform_attn_mxu
from tpudet.ops.deform_attn import ms_deform_attn_batched


def _rand_case(seed, b=2, q=13, heads=2, p=3, d=8,
               level_shapes=((6, 8), (3, 4), (2, 2)), span=0.4):
    rng = np.random.RandomState(seed)
    n = sum(h * w for h, w in level_shapes)
    values = rng.randn(b, n, heads, d).astype(np.float32)
    locations = rng.uniform(
        -span, 1.0 + span, size=(b, q, heads, len(level_shapes), p, 2)
    ).astype(np.float32)
    weights = rng.rand(b, q, heads, len(level_shapes), p).astype(np.float32)
    return level_shapes, values, locations, weights


def test_mxu_forward_matches_flat():
    """Forward equality incl. boundary and fully out-of-grid samples, and a
    query count that forces tile padding (q=13 with the default tile)."""
    level_shapes, values, locations, weights = _rand_case(0)
    want = np.asarray(ms_deform_attn_batched(
        jnp.asarray(values), level_shapes, jnp.asarray(locations),
        jnp.asarray(weights),
    ))
    got = np.asarray(ms_deform_attn_mxu(
        jnp.asarray(values), level_shapes, jnp.asarray(locations),
        jnp.asarray(weights), interpret=True,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_mxu_forward_bf16_values():
    """bf16 values: the 0/1 selection is exact in bf16, so the kernel must
    agree with the flat path run on the same bf16 values at f32-weight
    tolerances (not bf16 tolerances)."""
    level_shapes, values, locations, weights = _rand_case(1)
    vb = jnp.asarray(values, jnp.bfloat16)
    want = np.asarray(ms_deform_attn_batched(
        vb, level_shapes, jnp.asarray(locations), jnp.asarray(weights),
    ))
    got = np.asarray(ms_deform_attn_mxu(
        vb, level_shapes, jnp.asarray(locations), jnp.asarray(weights),
        interpret=True,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_mxu_small_tile_multiple_tiles():
    """query_tile smaller than Q exercises the grid's query axis and the
    backward's cross-tile dV accumulation."""
    level_shapes, values, locations, weights = _rand_case(2, q=11)
    want = np.asarray(ms_deform_attn_batched(
        jnp.asarray(values), level_shapes, jnp.asarray(locations),
        jnp.asarray(weights),
    ))
    got = np.asarray(ms_deform_attn_mxu(
        jnp.asarray(values), level_shapes, jnp.asarray(locations),
        jnp.asarray(weights), query_tile=8, interpret=True,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_mxu_gradients_match_flat():
    """Full VJP (values, locations, weights) against jax.grad of the flat
    formulation — the kernel's backward recomputes selections on the MXU
    and chains through the XLA weight prologue."""
    level_shapes, values, locations, weights = _rand_case(
        3, b=1, q=7, heads=2, p=2, d=8, level_shapes=((5, 6), (3, 3))
    )
    vj = jnp.asarray(values)
    lj = jnp.asarray(locations)
    wj = jnp.asarray(weights)

    def loss_flat(v, l, w):
        out = ms_deform_attn_batched(v, level_shapes, l, w)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    def loss_mxu(v, l, w):
        out = ms_deform_attn_mxu(
            v, level_shapes, l, w, query_tile=8, interpret=True
        )
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    gv_f, gl_f, gw_f = jax.grad(loss_flat, argnums=(0, 1, 2))(vj, lj, wj)
    gv_m, gl_m, gw_m = jax.grad(loss_mxu, argnums=(0, 1, 2))(vj, lj, wj)
    np.testing.assert_allclose(
        np.asarray(gv_m), np.asarray(gv_f), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gw_m), np.asarray(gw_f), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gl_m), np.asarray(gl_f), rtol=1e-4, atol=1e-4
    )


def test_mxu_banded_path_matches_flat_gather():
    """A tall level (hlpad > max(32, d)) forces the BANDED transposed
    formulation (kernels/deform_attn_mxu.py::_flat_level) — the small fuzz
    shapes above all dispatch to the flat kernel, so this is the banded
    kernel's interpret-mode equivalence + gradient proof."""
    from tpudet.kernels import deform_attn_mxu as mod
    level_shapes = ((40, 6), (3, 4))
    assert not mod._flat_level(-(-(40 + 1) // 16) * 16, 8)
    assert mod._flat_level(-(-(3 + 1) // 16) * 16, 8)
    _, values, locations, weights = _rand_case(
        7, b=1, q=9, heads=2, p=2, d=8, level_shapes=level_shapes)
    vj = jnp.asarray(values)
    lj = jnp.asarray(locations)
    wj = jnp.asarray(weights)
    want = np.asarray(ms_deform_attn_batched(vj, level_shapes, lj, wj))
    got = np.asarray(ms_deform_attn_mxu(
        vj, level_shapes, lj, wj, query_tile=8, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=4e-4)

    def loss_of(fn, **kw):
        def f(v, l, w):
            out = fn(v, level_shapes, l, w, **kw)
            return jnp.sum(
                out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))
        return f

    gf = jax.grad(loss_of(ms_deform_attn_batched), argnums=(0, 1, 2))(
        vj, lj, wj)
    gm = jax.grad(
        loss_of(ms_deform_attn_mxu, query_tile=8, interpret=True),
        argnums=(0, 1, 2))(vj, lj, wj)
    for a, b_, tol in zip(gm, gf, (3e-5, 3e-4, 3e-4)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-3, atol=tol)


def test_mxu_flat_and_banded_kernels_agree():
    """The two formulations compute the same contraction: force each in
    turn on identical mid-size inputs and compare them to each other at
    the bf16x2 bound (they share every error source except the select
    stage's shape)."""
    from tpudet.kernels import deform_attn_mxu as mod
    level_shapes = ((20, 7),)
    _, values, locations, weights = _rand_case(
        11, b=1, q=10, heads=2, p=3, d=8, level_shapes=level_shapes)
    args = (jnp.asarray(values), level_shapes, jnp.asarray(locations),
            jnp.asarray(weights))
    orig = mod._flat_level
    try:
        mod._flat_level = lambda hlpad, d: True
        got_flat = np.asarray(ms_deform_attn_mxu(
            *args, query_tile=8, interpret=True))
        mod._flat_level = lambda hlpad, d: False
        got_banded = np.asarray(ms_deform_attn_mxu(
            *args, query_tile=8, interpret=True))
    finally:
        mod._flat_level = orig
    np.testing.assert_allclose(got_flat, got_banded, rtol=1e-3, atol=4e-4)
