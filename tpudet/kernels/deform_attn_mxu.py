"""Multi-scale deformable attention as one-hot MXU matmuls — the TPU-native
answer to an op the canonical implementation writes as a CUDA gather kernel
(Deformable DETR, arXiv:2010.04159 §4.1; reference repo has no counterpart —
this family is a build extra, SURVEY.md §9).

Why this kernel exists (measured, KERNELS.md "Deformable attention" 1–3):
XLA's TPU gather lowers the sampling lookup to scalar-granularity access at
~1–2 GB/s effective regardless of formulation — flat 64 B rows 6.56 s,
2x2-patch slices 8.94 s, head-shared 512 B rows 3.14 s for ONE encoder
layer's reads at COCO b=16 (uncontended chip microbench,
scripts/gather_microbench.py). Pallas cannot vectorize a random in-VMEM
gather either (Mosaic has no vector gather op — scalar dynamic slices
only). The one unit this chip DOES reward is the MXU, so this kernel
reformulates bilinear sampling as dense 0/1(-weighted) matmuls. Two
formulations, chosen per level by a measured crossover (KERNELS.md
"Deformable attention, part 7" has the A/B table):

BANDED (large levels, ``hlpad > max(32, d)``), fully transposed so every
per-sample field is consumed as the [1, sp] lane-row it arrives as (the
round-5 fix for the VPU row->column floor that dominated small levels):

    WyT[y, s] = wy0[s]*(y==y0[s]) + wy1[s]*(y==y0[s]+1)   [hlpad, sp]
                built on the VPU from a sublane iota and lane rows
    RyT       = V^T-contract(WyT)                         A^T B matmul,
                dims ((0,),(0,)): [hlpad,WD]x[hlpad,sp] -> [WD, sp]
    xexpT     = broadcast of the [wlpad, sp] per-x weight rows over the
                d sublanes of each x (exact reshape-merge, no compares
                on the [WD, sp] array)
    pmT       = RyT . xexpT
    tT        = M^T-contract(pmT)    M[j, dd] = (j % d == dd) 0/1
    outT[q]   = tT @ M2T             M2T[s, q] = (s // P == q) 0/1

FLAT (small levels): the whole (y, x) grid fits the contraction, so the
four bilinear corners collapse into ONE weighted one-hot matmul over the
flattened level:

    W2T[yx, s] = the four corner weights at yx0[s] + {0, 1, W, W+1}
                 (u = yx - yx0 nested selects; wrap targets provably
                 carry zero weight — see ``_pack_fields``)
    tT         = V2^T-contract(W2T)  [hw2, d] x [hw2, sp] -> [d, sp]
    outT[q]    = tT @ M2T

Numerics — the round-4 hardware lesson (KERNELS.md "Deformable attention,
part 4"): the MXU's default single-pass matmul rounds BOTH operands to
bf16, so every matmul whose data operand is f32 goes through a two-pass
bf16x2 split (x = hi + lo, both products exact against a bf16 0/1 or
value operand, f32 accumulation, relative error ~2^-18 per split). The
round-5 formulations fold the f32 bilinear weights INTO the selector
(WyT / W2T above), which adds one more 2^-18-relative source on the
select stage that round 4's unweighted 0/1 selects did not have; the
flat kernel's corner products wy*wx add one f32 rounding (2^-24,
negligible). Per-element worst case is derived in
tests/test_deform_attn_mxu.py (atol 4e-4); the on-chip tier test uses
the same bound.

Memory — the second round-4 hardware lesson: per-sample index/weight
operands shaped [.., sp, 1]/[.., sp, 2] force XLA's tiled layouts to pad
the minor dim to 128 lanes (64x expansion, 3.52 GB temps, HBM OOM at
COCO b=16). All seven per-sample fields ship as ONE field-stacked array
F[bh, nqt, 8, sp] (fields along SUBLANES, samples along LANES — zero
padding waste). The transposed formulations consume the field ROWS
directly; nothing converts rows to columns any more (round 4's eye-mask
trick and its per-grid-step VPU floor are gone).

Cost model (why this beats the gather by ~20x, not by 1000x): the banded
select burns hlpad*wl*D MACs per sample against 4*D useful ones, the flat
select hlpad*wlpad*D — the MXU waste factor IS the formulation. The
measured per-level crossover (banded wins where the y-band is tall, flat
wins where the whole grid is barely larger than the band) is in
KERNELS.md part 7 with the chip A/B that set the ``hlpad <= max(32, d)``
rule. The remaining gap to the FLOP roofline is the price of random
sampling on hardware with no vector gather/scatter datapath.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpudet.ops.deform_attn import level_start_offsets

# Scoped-VMEM budget for both kernels. The backward keeps several
# [sp, WDpad] f32 intermediates live (~5.5 MB each at sp=512 / COCO
# level-0 widths) — the compiler's default 16 MB scoped limit OOM'd on
# the real chip (KERNELS.md part 4). v5e has 128 MiB of physical VMEM.
_VMEM_LIMIT = 100 * 1024 * 1024

# Field-row indices inside the stacked F[.., 8, sp] operand.
_F_Y0, _F_X0, _F_WY0, _F_WY1, _F_WX0, _F_WX1, _F_YX0 = range(7)
_F_ROWS = 8  # padded to the f32 sublane tile

_F32 = jnp.float32
_BF16 = jnp.bfloat16


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _flat_level(hlpad: int, d: int) -> bool:
    """Measured crossover (KERNELS.md part 7 A/B): the flat formulation
    wins when the level's padded height is comparable to the head dim."""
    return hlpad <= max(32, d)


def _split(x):
    """bf16x2 split of f32 data: x = hi + lo with both parts exact MXU
    operands; hi + lo carries relative error <= 2^-18."""
    hi = x.astype(_BF16)
    lo = (x - hi.astype(_F32)).astype(_BF16)
    return hi, lo


def _dot01_rhs(x, m01):
    """dot(x_f32_data, m01) with two bf16 passes — exact 0/1 rhs."""
    hi, lo = _split(x)
    mb = m01.astype(_BF16)
    return (jnp.dot(hi, mb, preferred_element_type=_F32)
            + jnp.dot(lo, mb, preferred_element_type=_F32))


def _dot01_lhs(m01, x):
    """dot(m01, x_f32_data) with two bf16 passes (0/1 lhs)."""
    hi, lo = _split(x)
    mb = m01.astype(_BF16)
    return (jnp.dot(mb, hi, preferred_element_type=_F32)
            + jnp.dot(mb, lo, preferred_element_type=_F32))


def _dot_data_data(x, y):
    """dot(x_f32_data, y_f32_data) as three bf16 passes (hi@hi + hi@lo +
    lo@hi; the dropped lo@lo term is O(2^-36) relative)."""
    xh, xl = _split(x)
    yh, yl = _split(y)
    return (jnp.dot(xh, yh, preferred_element_type=_F32)
            + jnp.dot(xh, yl, preferred_element_type=_F32)
            + jnp.dot(xl, yh, preferred_element_type=_F32))


def _dotg00(a, b):
    """A^T B on the MXU: contract dim 0 of both operands (sublanes) —
    the orientation Mosaic lowers natively, chip-probed round 5."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=_F32)


def _dotg00_data(a_vals, b_data):
    """A^T B where a is bf16 values (or f32 test data) and b is f32 data:
    split the data side; split the value side too iff it is f32."""
    bh, bl = _split(b_data)
    if a_vals.dtype == _F32:
        ah, al = _split(a_vals)
        return (_dotg00(ah, bh) + _dotg00(ah, bl) + _dotg00(al, bh))
    return _dotg00(a_vals, bh) + _dotg00(a_vals, bl)


def _m2t(sp, qt, p, dtype=_BF16):
    """M2T[s, q] = (s // P == q) — the point-sum matmul operand."""
    scol = jax.lax.broadcasted_iota(jnp.int32, (sp, qt), 0) // p
    qcol = jax.lax.broadcasted_iota(jnp.int32, (sp, qt), 1)
    return (scol == qcol).astype(dtype)


# --------------------------------------------------------------- kernels


def _fwd_banded_kernel(v_ref, f_ref, out_ref, *, sp, qt, p, hlpad, wdpad, d):
    """One (bh, query-tile) grid step of a banded level's sampling, fully
    transposed (samples stay on lanes end to end)."""
    wlpad = wdpad // d
    v = v_ref[0]                                   # [hlpad, WDpad] value dt
    f = f_ref[0, 0]                                # [8, sp] f32 field rows
    y0r = f[_F_Y0:_F_Y0 + 1].astype(jnp.int32)     # [1, sp]
    x0r = f[_F_X0:_F_X0 + 1].astype(jnp.int32)
    wy0r = f[_F_WY0:_F_WY0 + 1]
    wy1r = f[_F_WY1:_F_WY1 + 1]
    wx0r = f[_F_WX0:_F_WX0 + 1]
    wx1r = f[_F_WX1:_F_WX1 + 1]

    # Weighted transposed y-selector, built on the small [hlpad, sp] array.
    col_y = jax.lax.broadcasted_iota(jnp.int32, (hlpad, sp), 0)
    wyT = (jnp.where(col_y == y0r, wy0r, 0.0)
           + jnp.where(col_y == y0r + 1, wy1r, 0.0))
    ryT = _dotg00_data(v, wyT)                     # [WDpad, sp] f32

    # Per-x weight rows on [wlpad, sp], expanded exactly over each x's d
    # sublanes by a broadcast reshape-merge (no compares on [WD, sp]).
    sub_x = jax.lax.broadcasted_iota(jnp.int32, (wlpad, sp), 0)
    xs = (jnp.where(sub_x == x0r, wx0r, 0.0)
          + jnp.where(sub_x == x0r + 1, wx1r, 0.0))
    xexpT = jnp.broadcast_to(
        xs[:, None, :], (wlpad, d, sp)).reshape(wdpad, sp)
    pmT = ryT * xexpT                              # [WDpad, sp]

    # Lane segment-sum over x via a 0/1 A^T B: M[j, dd] = (j % d == dd).
    mj = jax.lax.broadcasted_iota(jnp.int32, (wdpad, d), 0) % d
    md = jax.lax.broadcasted_iota(jnp.int32, (wdpad, d), 1)
    mb = (mj == md).astype(_BF16)
    ph, plo = _split(pmT)
    tT = _dotg00(mb, ph) + _dotg00(mb, plo)        # [d, sp]

    # Sum the P points of each query; emit the transposed [d, qt] block.
    th, tl = _split(tT)
    m2tb = _m2t(sp, qt, p)
    out_ref[0, 0] = (jnp.dot(th, m2tb, preferred_element_type=_F32)
                     + jnp.dot(tl, m2tb, preferred_element_type=_F32))


def _fwd_flat_kernel(v_ref, f_ref, out_ref, *, sp, qt, p, hw2, wlpad, d):
    """One (bh, query-tile) grid step of a flat level's sampling: the four
    bilinear corners as ONE weighted one-hot over the flattened grid."""
    v2 = v_ref[0]                                  # [hw2, d] value dt
    f = f_ref[0, 0]
    yx0 = f[_F_YX0:_F_YX0 + 1].astype(jnp.int32)   # [1, sp] flat corner idx
    wy0r = f[_F_WY0:_F_WY0 + 1]
    wy1r = f[_F_WY1:_F_WY1 + 1]
    wx0r = f[_F_WX0:_F_WX0 + 1]
    wx1r = f[_F_WX1:_F_WX1 + 1]
    w00 = wy0r * wx0r
    w01 = wy0r * wx1r
    w10 = wy1r * wx0r
    w11 = wy1r * wx1r

    j = jax.lax.broadcasted_iota(jnp.int32, (hw2, sp), 0)
    u = j - yx0
    w2T = jnp.where(
        u == 0, w00, jnp.where(
            u == 1, w01, jnp.where(
                u == wlpad, w10, jnp.where(u == wlpad + 1, w11, 0.0))))
    tT = _dotg00_data(v2, w2T)                     # [d, sp]

    th, tl = _split(tT)
    m2tb = _m2t(sp, qt, p)
    out_ref[0, 0] = (jnp.dot(th, m2tb, preferred_element_type=_F32)
                     + jnp.dot(tl, m2tb, preferred_element_type=_F32))


def _bwd_banded_kernel(v_ref, f_ref, g_ref, dv_ref, df_ref,
                       *, sp, qt, p, hlpad, wdpad, d):
    """Backward of one banded (bh, query-tile) grid step: recomputes the
    forward's selections (cheaper than saving [sp, WDpad] residuals to
    HBM) and emits dV (accumulated across query tiles — the output
    block's index map is constant in qt, so sequential grid steps
    revisit it) and the dwy/dwx rows of dF (dy0/dx0/dyx0 rows stay
    zero — selector coords are not differentiable). Runs in the
    UNtransposed orientation: the dV contraction is only a standard
    matmul when samples sit on the contracted lane/sublane pair, and
    lane-dim broadcast merges do not lower (round-5 Mosaic probes)."""
    wlpad = wdpad // d
    v = v_ref[0]
    f = f_ref[0, 0]                                # [8, sp]
    gT = g_ref[0, 0]                               # [d, qt] f32 (transposed)
    g = jnp.transpose(gT, (1, 0))                  # [qt, d] — exact
    ft = jnp.transpose(f, (1, 0))                  # [sp, 8] — exact
    y0 = ft[:, _F_Y0:_F_Y0 + 1].astype(jnp.int32)  # [sp, 1]
    x0 = ft[:, _F_X0:_F_X0 + 1].astype(jnp.int32)
    wy0 = ft[:, _F_WY0:_F_WY0 + 1]
    wy1 = ft[:, _F_WY1:_F_WY1 + 1]
    wx0 = ft[:, _F_WX0:_F_WX0 + 1]
    wx1 = ft[:, _F_WX1:_F_WX1 + 1]

    qtile = pl.program_id(1)

    @pl.when(qtile == 0)
    def _():
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    row_y = jax.lax.broadcasted_iota(jnp.int32, (sp, hlpad), 1)
    s0 = row_y == y0
    s1 = row_y == y0 + 1
    if v.dtype == _F32:
        r0 = _dot01_lhs(s0.astype(_F32), v)
        r1 = _dot01_lhs(s1.astype(_F32), v)
    else:
        r0 = jnp.dot(s0.astype(v.dtype), v, preferred_element_type=_F32)
        r1 = jnp.dot(s1.astype(v.dtype), v, preferred_element_type=_F32)
    ry = wy0 * r0 + wy1 * r1

    lane_x = jax.lax.broadcasted_iota(jnp.int32, (sp, wdpad), 1) // d
    h0 = lane_x == x0
    h1 = lane_x == x0 + 1
    xexp = jnp.where(h0, wx0, jnp.where(h1, wx1, 0.0))

    # dT[s, dd] = g[s // P, dd] (M2^T), then dP = dT @ M^T.
    m2t_ = _m2t(sp, qt, p, _F32)                    # [sp, qt]
    dt_ = _dot01_lhs(m2t_, g)                       # [sp, d]
    mj = jax.lax.broadcasted_iota(jnp.int32, (d, wdpad), 1) % d
    md = jax.lax.broadcasted_iota(jnp.int32, (d, wdpad), 0)
    mt = (mj == md).astype(_F32)
    dp = _dot01_rhs(dt_, mt)                        # [sp, WDpad]

    dry = dp * xexp
    dxexp = dp * ry
    dwy0 = jnp.sum(dry * r0, axis=-1, keepdims=True)     # [sp, 1]
    dwy1 = jnp.sum(dry * r1, axis=-1, keepdims=True)
    dwx0 = jnp.sum(jnp.where(h0, dxexp, 0.0), axis=-1, keepdims=True)
    dwx1 = jnp.sum(jnp.where(h1, dxexp, 0.0), axis=-1, keepdims=True)
    zcol = jnp.zeros((sp, 1), _F32)
    dft = jnp.concatenate(
        [zcol, zcol, dwy0, dwy1, dwx0, dwx1, zcol, zcol], axis=1)
    df_ref[0, 0] = jnp.transpose(dft, (1, 0))       # [8, sp] — exact

    # dV += (wy0.S0 + wy1.S1)^T @ dry in ONE both-split matmul: the
    # weighted transposed selector is built from the field ROWS (no
    # in-kernel transpose), f32-data x f32-data -> three bf16 passes.
    col_y = jax.lax.broadcasted_iota(jnp.int32, (hlpad, sp), 0)
    y0r = f[_F_Y0:_F_Y0 + 1].astype(jnp.int32)      # [1, sp]
    wsT = (jnp.where(col_y == y0r, f[_F_WY0:_F_WY0 + 1], 0.0)
           + jnp.where(col_y == y0r + 1, f[_F_WY1:_F_WY1 + 1], 0.0))
    dv_ref[0] += _dot_data_data(wsT, dry)


def _bwd_flat_kernel(v_ref, f_ref, g_ref, dv_ref, df_ref,
                     *, sp, qt, p, hw2, wlpad, d):
    """Backward of one flat (bh, query-tile) grid step: one corner-weight
    cotangent matmul + four masked sublane reductions for the weight
    rows, one standard matmul for dV2."""
    v2 = v_ref[0]                                  # [hw2, d]
    f = f_ref[0, 0]
    gT = g_ref[0, 0]                               # [d, qt]
    yx0 = f[_F_YX0:_F_YX0 + 1].astype(jnp.int32)
    wy0r = f[_F_WY0:_F_WY0 + 1]
    wy1r = f[_F_WY1:_F_WY1 + 1]
    wx0r = f[_F_WX0:_F_WX0 + 1]
    wx1r = f[_F_WX1:_F_WX1 + 1]

    qtile = pl.program_id(1)

    @pl.when(qtile == 0)
    def _():
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    # dTT[dd, s] = g[s // P, dd]^T via the point-sum operand:
    # dTT = gT @ M2 with M2[q, s] = (s // P == q).
    m2b = jnp.transpose(_m2t(sp, qt, p), (1, 0))   # [qt, sp] — exact
    gh, gl = _split(gT)
    dTT = (jnp.dot(gh, m2b, preferred_element_type=_F32)
           + jnp.dot(gl, m2b, preferred_element_type=_F32))  # [d, sp]

    # dW2[yx, s] = sum_dd V2[yx, dd] * dTT[dd, s] — standard matmul.
    dh, dl = _split(dTT)
    if v2.dtype == _F32:
        v2h, v2l = _split(v2)
        dW2 = (jnp.dot(v2h, dh, preferred_element_type=_F32)
               + jnp.dot(v2h, dl, preferred_element_type=_F32)
               + jnp.dot(v2l, dh, preferred_element_type=_F32))
    else:
        dW2 = (jnp.dot(v2, dh, preferred_element_type=_F32)
               + jnp.dot(v2, dl, preferred_element_type=_F32))  # [hw2, sp]

    j = jax.lax.broadcasted_iota(jnp.int32, (hw2, sp), 0)
    u = j - yx0
    dw00 = jnp.sum(jnp.where(u == 0, dW2, 0.0), axis=0, keepdims=True)
    dw01 = jnp.sum(jnp.where(u == 1, dW2, 0.0), axis=0, keepdims=True)
    dw10 = jnp.sum(jnp.where(u == wlpad, dW2, 0.0), axis=0, keepdims=True)
    dw11 = jnp.sum(jnp.where(u == wlpad + 1, dW2, 0.0),
                   axis=0, keepdims=True)          # [1, sp] rows
    dwy0 = dw00 * wx0r + dw01 * wx1r
    dwy1 = dw10 * wx0r + dw11 * wx1r
    dwx0 = dw00 * wy0r + dw10 * wy1r
    dwx1 = dw01 * wy0r + dw11 * wy1r
    zrow = jnp.zeros((1, sp), _F32)
    df_ref[0, 0] = jnp.concatenate(
        [zrow, zrow, dwy0, dwy1, dwx0, dwx1, zrow, zrow], axis=0)

    # dV2[yx, dd] = sum_s W2T[yx, s] * dT[s, dd] — rebuild the forward's
    # weighted one-hot, transpose the small dT, standard both-split dot.
    w00 = wy0r * wx0r
    w01 = wy0r * wx1r
    w10 = wy1r * wx0r
    w11 = wy1r * wx1r
    w2T = jnp.where(
        u == 0, w00, jnp.where(
            u == 1, w01, jnp.where(
                u == wlpad, w10, jnp.where(u == wlpad + 1, w11, 0.0))))
    dT = jnp.transpose(dTT, (1, 0))                # [sp, d] — exact
    dv_ref[0] += _dot_data_data(w2T, dT)


# ------------------------------------------------- per-level custom VJP


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9)
)
def _level_attn(vpad, fpack, sp, qt, p, dim_a, dim_b, d, flat, interpret):
    """dim_a/dim_b are (hlpad, wdpad) for banded levels and (hw2, wlpad)
    for flat levels."""
    return _level_attn_fwd_impl(
        vpad, fpack, sp, qt, p, dim_a, dim_b, d, flat, interpret
    )


def _level_attn_fwd_impl(vpad, fpack, sp, qt, p, dim_a, dim_b, d, flat,
                         interpret):
    bh, nqt = fpack.shape[0], fpack.shape[1]
    if flat:
        kern = functools.partial(
            _fwd_flat_kernel, sp=sp, qt=qt, p=p, hw2=dim_a, wlpad=dim_b,
            d=d)
        vblock = (1, dim_a, d)
    else:
        kern = functools.partial(
            _fwd_banded_kernel, sp=sp, qt=qt, p=p, hlpad=dim_a,
            wdpad=dim_b, d=d)
        vblock = (1, dim_a, dim_b)
    return pl.pallas_call(
        kern,
        grid=(bh, nqt),
        in_specs=[
            pl.BlockSpec(vblock, lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _F_ROWS, sp), lambda b, q: (b, q, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, d, qt), lambda b, q: (b, q, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bh, nqt, d, qt), _F32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(vpad, fpack)


def _level_attn_fwd(vpad, fpack, sp, qt, p, dim_a, dim_b, d, flat,
                    interpret):
    out = _level_attn_fwd_impl(
        vpad, fpack, sp, qt, p, dim_a, dim_b, d, flat, interpret
    )
    return out, (vpad, fpack)


def _level_attn_bwd(sp, qt, p, dim_a, dim_b, d, flat, interpret, res, g):
    vpad, fpack = res
    bh, nqt = fpack.shape[0], fpack.shape[1]
    if flat:
        kern = functools.partial(
            _bwd_flat_kernel, sp=sp, qt=qt, p=p, hw2=dim_a, wlpad=dim_b,
            d=d)
        vblock = (1, dim_a, d)
    else:
        kern = functools.partial(
            _bwd_banded_kernel, sp=sp, qt=qt, p=p, hlpad=dim_a,
            wdpad=dim_b, d=d)
        vblock = (1, dim_a, dim_b)
    dvpad, dfpack = pl.pallas_call(
        kern,
        grid=(bh, nqt),
        in_specs=[
            pl.BlockSpec(vblock, lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _F_ROWS, sp), lambda b, q: (b, q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d, qt), lambda b, q: (b, q, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(vblock, lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _F_ROWS, sp), lambda b, q: (b, q, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(vpad.shape, _F32),
            jax.ShapeDtypeStruct(fpack.shape, _F32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(vpad, fpack, g)
    return (dvpad.astype(vpad.dtype), dfpack)


_level_attn.defvjp(_level_attn_fwd, _level_attn_bwd)


# ------------------------------------------------------------ public op


def ms_deform_attn_mxu(
    values: jnp.ndarray,       # [B, N, H, D] level-concatenated tokens
    level_shapes: Sequence[Tuple[int, int]],
    locations: jnp.ndarray,    # [B, Q, H, L, P, 2]
    weights: jnp.ndarray,      # [B, Q, H, L, P]
    query_tile: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:              # [B, Q, H, D] (f32)
    """Whole-batch multi-scale deformable attention through the one-hot
    MXU kernels — same math and zero-padding semantics as
    ``ops.deform_attn.ms_deform_attn_batched`` (equivalence-tested),
    differentiable (custom VJP, backward also on the MXU). Each level
    dispatches to the banded or flat formulation by the measured
    ``_flat_level`` crossover."""
    b, n, h, d = values.shape
    q = locations.shape[1]
    p = locations.shape[-2]
    offsets, total = level_start_offsets(level_shapes)
    if total != n:
        raise ValueError(
            f"level_shapes {tuple(level_shapes)} sum to {total} tokens, "
            f"values carry {n}"
        )
    if 128 % d:
        # The lane-segment logic requires the 128-lane-padded row width
        # (wdpad) to be a multiple of D, which holds iff D divides 128.
        raise ValueError(
            f"ms_deform_attn_mxu requires a head dim that divides the "
            f"128-lane tile (8/16/32/64/128); got head_dim={d}. Pad D or "
            f"use sampling_gather='flat'/'patch'."
        )

    qt = max(8, min(query_tile, _round_up(q, 8)))
    qpad = _round_up(q, qt)
    nqt = qpad // qt
    sp = qt * p
    bh = b * h

    out = jnp.zeros((bh, nqt, d, qt), _F32)
    for li, (hl, wl) in enumerate(level_shapes):
        hlpad = _round_up(hl + 1, 16)   # sublane tile for bf16 operands
        wdpad = _round_up(wl * d, 128)
        wlpad = wdpad // d
        flat = _flat_level(hlpad, d)

        vl = values[:, offsets[li]:offsets[li] + hl * wl]
        vl = vl.reshape(b, hl, wl, h, d).transpose(0, 3, 1, 2, 4)
        vl = jnp.pad(
            vl, ((0, 0), (0, 0), (0, hlpad - hl), (0, wlpad - wl), (0, 0))
        )
        if flat:
            hw2 = hlpad * wlpad        # multiple of 8 by construction
            vl = vl.reshape(bh, hw2, d)
        else:
            vl = vl.reshape(bh, hlpad, wdpad)

        loc = locations[..., li, :, :]             # [B, Q, H, P, 2]
        x = loc[..., 0] * wl - 0.5
        y = loc[..., 1] * hl - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        aw = weights[..., li, :]                   # [B, Q, H, P]
        # Per-axis corner weights with grid_sample zero-padding: a corner
        # is zero iff either coordinate leaves the grid, so zeroing each
        # axis's out-of-grid weight zeroes exactly the right products.
        wy0 = jnp.where((y0 >= 0) & (y0 < hl), (1.0 - fy) * aw, 0.0)
        wy1 = jnp.where((y0 + 1 >= 0) & (y0 + 1 < hl), fy * aw, 0.0)
        wx0 = jnp.where((x0 >= 0) & (x0 < wl), 1.0 - fx, 0.0)
        wx1 = jnp.where((x0 + 1 >= 0) & (x0 + 1 < wl), fx, 0.0)
        # Clamp the SELECTOR coordinates into the padded grid so the
        # iota equality can only fire on rows whose weight is
        # nonzero-eligible (weights above already gate correctness).
        # For the flat kernel the clamps also bound the flat corner
        # index: hlpad >= hl + 1 guarantees every nonzero-weight corner
        # (y0s + 1 <= hl <= hlpad - 1) stays inside the hw2 rows, and any
        # x-wrap target (x0s = wlpad - 1 wrapping to the next row) has a
        # provably zero wx gate above.
        y0s = jnp.clip(y0, -1.0, float(hlpad - 1))
        x0s = jnp.clip(x0, -1.0, float(wlpad - 1))
        yx0s = y0s * float(wlpad) + x0s

        def pack_field(t):
            # [B, Q, H, P] -> [BH, nqt, sp] with Q padded.
            t = jnp.moveaxis(t, 2, 1)              # [B, H, Q, P]
            t = jnp.pad(t, ((0, 0), (0, 0), (0, qpad - q), (0, 0)))
            return t.reshape(bh, nqt, sp)

        # One field-stacked operand [BH, nqt, 8, sp]: fields on SUBLANES,
        # samples on LANES — no tiled-layout padding waste (the round-4
        # [.., sp, 1]/[.., sp, 2] layouts padded lanes 1->128 / 2->128 and
        # OOM'd HBM at COCO scale; KERNELS.md part 4).
        fpack = jnp.stack(
            [
                pack_field(y0s),
                pack_field(x0s),
                pack_field(wy0),
                pack_field(wy1),
                pack_field(wx0),
                pack_field(wx1),
                pack_field(yx0s),
                jnp.zeros((bh, nqt, sp), _F32),
            ],
            axis=2,
        )                                          # [BH, nqt, 8, sp]

        if flat:
            out = out + _level_attn(
                vl, fpack, sp, qt, p, hw2, wlpad, d, True, interpret,
            )
        else:
            out = out + _level_attn(
                vl, fpack, sp, qt, p, hlpad, wdpad, d, False, interpret,
            )

    # [BH, nqt, d, qt] -> [B, Q, H, D]
    out = out.reshape(b, h, nqt, d, qt).transpose(0, 2, 4, 1, 3)
    return out.reshape(b, qpad, h, d)[:, :q]
