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
reformulates bilinear sampling as dense 0/1 matmuls:

  For each level (hl, wl) and query tile (sp = Qt*P samples):
    S_a[s, y]   = (y == y0[s] + a)            a in {0,1} — 0/1 row-select,
                                              built on the VPU from an iota,
                                              exact in ANY dtype
    R_a         = S_a @ V                     MXU: [sp, HL] @ [HL, wl*D],
                                              value dtype, f32 accumulation
    Ry          = wy_0 . R_0 + wy_1 . R_1     f32 row weights (bilinear y
                                              weight x attention weight)
    P           = Ry . Xexp                   Xexp[s, x*D+d] = per-sample
                                              f32 x-corner weights expanded
                                              along lanes by an iota compare
    T           = P @ M                       M[x*D+d, d'] = (d==d') — the
                                              lane segment-sum as a matmul
    out[q]      = M2 @ T                      M2 0/1 sums the P points/query

Numerics — the round-4 hardware lesson (KERNELS.md "Deformable attention,
part 4"): the MXU's default single-pass matmul rounds BOTH operands to
bf16. A 0/1 selector times *bf16 values* is therefore exact (the first
S_a @ V stage), but every later stage whose data operand is an f32
intermediate (the lane segment-sum T = P @ M, the point-sum out = M2 @ T,
and their backward transposes) silently quantized its f32 side — the
on-chip tier test failed 6x with 93.4% of elements outside 1e-4 while
interpret mode (true f32) stayed green. The fix is a two-pass bf16x2
split of the f32 data operand (`_dot01_*` below): x = hi + lo with
hi = bf16(x), lo = bf16(x - hi); both products are exact against a 0/1
matrix and accumulate in f32, leaving relative error ~2^-18 — back inside
the gather-path tolerances. MXU cost doubles only on the small segment/
point-sum matmuls (~D/HL of the select cost).

Memory — the second round-4 hardware lesson: per-sample index/weight
operands shaped [.., sp, 1]/[.., sp, 2] force XLA's tiled layouts to pad
the minor dim to 128 lanes (64x expansion, 3.52 GB temps, HBM OOM at
COCO b=16). All six per-sample fields now ship as ONE field-stacked
array F[bh, nqt, 8, sp] (fields along SUBLANES, samples along LANES —
zero padding waste), and the kernel converts a field row [1, sp] to the
column [sp, 1] its math needs with an exact VPU trick: broadcast the row
over sublanes, mask with a 0/1 identity, lane-reduce (each row sums
exactly one nonzero — no rounding). The backward emits its dwy/dwx rows
into the same [8, sp] layout via the transposed trick.

Exactness: selection matrices are 0/1 (representable exactly in bf16),
all weights stay f32, accumulation is f32 — numerically the same
contraction as the flat-gather path (bf16 values x f32 weights, f32
accumulate) up to the bf16x2 split's 2^-18. grid_sample
``padding_mode='zeros'`` semantics come from zeroing the per-AXIS corner
weights of out-of-grid coordinates (the product zeroes the corner iff
either coordinate is out), identical to ``ops/deform_attn.py``'s masking.

Cost model (why this beats the gather by ~20x, not by 1000x): the row
select burns HL*wl*D MACs per sample against 4*D useful ones — the MXU
waste factor IS the formulation. Per COCO encoder layer that is ~16 TFLOP
bf16, ~0.17 s at realistic MXU rates, vs the gather's measured 6.5 s; the
remaining gap to the ~30 ms FLOP roofline is the price of random sampling
on hardware with no scatter/gather datapath. See KERNELS.md for the
measured adjudication against the gather formulations.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpudet.ops.deform_attn import level_start_offsets

# Scoped-VMEM budget for both kernels. The backward keeps ~6 [sp, WDpad]
# f32 intermediates live (~5.5 MB each at sp=256 / COCO level-0 widths) —
# the compiler's default 16 MB scoped limit OOM'd on the real chip
# (16.83 M needed; KERNELS.md part 4). v5e has 128 MiB of physical VMEM.
_VMEM_LIMIT = 100 * 1024 * 1024

# Field-row indices inside the stacked F[.., 8, sp] operand.
_F_Y0, _F_X0, _F_WY0, _F_WY1, _F_WX0, _F_WX1 = range(6)
_F_ROWS = 8  # padded to the f32 sublane tile


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _dot01_rhs(x, m01):
    """dot(x_f32_data, m01) with two bf16 passes — exact 0/1 rhs, f32 data
    lhs split hi/lo so the MXU's bf16 operand rounding cannot bite."""
    f32 = jnp.float32
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(f32)).astype(jnp.bfloat16)
    mb = m01.astype(jnp.bfloat16)
    return (jnp.dot(hi, mb, preferred_element_type=f32)
            + jnp.dot(lo, mb, preferred_element_type=f32))


def _dot01_lhs(m01, x):
    """dot(m01, x_f32_data) with two bf16 passes (0/1 lhs, f32 data rhs)."""
    f32 = jnp.float32
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(f32)).astype(jnp.bfloat16)
    mb = m01.astype(jnp.bfloat16)
    return (jnp.dot(mb, hi, preferred_element_type=f32)
            + jnp.dot(mb, lo, preferred_element_type=f32))


def _select_dot(s01_bool, v):
    """The row-select matmul S @ V. For sub-f32 values (the model path —
    bf16) a single MXU pass is exact: 0/1 times bf16 rounds nothing. For
    f32 values (tests/debug) the MXU would silently round V to bf16, so
    they go through the bf16x2 split too."""
    if v.dtype == jnp.float32:
        return _dot01_lhs(s01_bool.astype(jnp.float32), v)
    return jnp.dot(s01_bool.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)


def _eye(sp, dtype=jnp.float32):
    a = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 0)
    b = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
    return (a == b).astype(dtype)


def _col(eye, row):
    """[1, sp] field row -> [sp, 1] column, exactly (each output element is
    a lane-sum of one nonzero + zeros; IEEE x+0=x)."""
    return jnp.sum(eye * row, axis=1, keepdims=True)


def _row(eye, col):
    """[sp, 1] column -> [1, sp] row, exactly (sublane-sum transpose)."""
    return jnp.sum(eye * col, axis=0, keepdims=True)


# --------------------------------------------------------------- kernels


def _fwd_kernel(v_ref, f_ref, out_ref, *, sp, qt, p, hlpad, wdpad, d):
    """One (bh, query-tile) grid step of one level's sampling."""
    fdt = jnp.float32
    v = v_ref[0]                                   # [HLpad, WDpad] value dt
    f = f_ref[0, 0]                                # [8, sp] f32 field rows
    eye = _eye(sp)
    y0 = _col(eye, f[_F_Y0:_F_Y0 + 1])             # [sp, 1] f32
    x0 = _col(eye, f[_F_X0:_F_X0 + 1])
    wy0 = _col(eye, f[_F_WY0:_F_WY0 + 1])
    wy1 = _col(eye, f[_F_WY1:_F_WY1 + 1])
    wx0 = _col(eye, f[_F_WX0:_F_WX0 + 1])
    wx1 = _col(eye, f[_F_WX1:_F_WX1 + 1])

    # Mosaic's tpu.iota is integer-only — compare in int32 (the f32
    # inputs hold exact small integers; truncation is exact for them).
    row_y = jax.lax.broadcasted_iota(jnp.int32, (sp, hlpad), 1)
    y0i = y0.astype(jnp.int32)
    s0 = row_y == y0i
    s1 = row_y == y0i + 1
    r0 = _select_dot(s0, v)                        # [sp, WDpad] f32
    r1 = _select_dot(s1, v)
    ry = wy0 * r0 + wy1 * r1

    lane_x = jax.lax.broadcasted_iota(jnp.int32, (sp, wdpad), 1) // d
    x0i = x0.astype(jnp.int32)
    xexp = (
        jnp.where(lane_x == x0i, wx0, 0.0)
        + jnp.where(lane_x == x0i + 1, wx1, 0.0)
    )
    pm = ry * xexp                                 # [sp, WDpad] f32

    # Lane segment-sum over x via a 0/1 matmul: M[j, d'] = (j % D == d').
    # pm is f32 DATA — two bf16 passes (module docstring, numerics note).
    mj = jax.lax.broadcasted_iota(jnp.int32, (wdpad, d), 0) % d
    md = jax.lax.broadcasted_iota(jnp.int32, (wdpad, d), 1)
    m = (mj == md).astype(fdt)
    t = _dot01_rhs(pm, m)                          # [sp, D]

    # Sum the P points of each query: M2[q, s] = (s // P == q).
    srow = jax.lax.broadcasted_iota(jnp.int32, (qt, sp), 1) // p
    qrow = jax.lax.broadcasted_iota(jnp.int32, (qt, sp), 0)
    m2 = (srow == qrow).astype(fdt)
    out_ref[0, 0] = _dot01_lhs(m2, t)


def _bwd_kernel(v_ref, f_ref, g_ref, dv_ref, df_ref,
                *, sp, qt, p, hlpad, wdpad, d):
    """Backward of one (bh, query-tile) grid step: recomputes the forward's
    selections (cheaper than saving [sp, WDpad] residuals to HBM) and emits
    dV (accumulated across query tiles — the output block's index map is
    constant in qt, so sequential grid steps revisit it) and the dwy/dwx
    rows of dF (dy0/dx0 rows stay zero — selector coords are not
    differentiable)."""
    fdt = jnp.float32
    v = v_ref[0]
    f = f_ref[0, 0]                                # [8, sp]
    g = g_ref[0, 0]                                # [Qt, D] f32
    eye = _eye(sp)
    y0 = _col(eye, f[_F_Y0:_F_Y0 + 1])
    x0 = _col(eye, f[_F_X0:_F_X0 + 1])
    wy0 = _col(eye, f[_F_WY0:_F_WY0 + 1])
    wy1 = _col(eye, f[_F_WY1:_F_WY1 + 1])
    wx0 = _col(eye, f[_F_WX0:_F_WX0 + 1])
    wx1 = _col(eye, f[_F_WX1:_F_WX1 + 1])

    qtile = pl.program_id(1)

    @pl.when(qtile == 0)
    def _():
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    row_y = jax.lax.broadcasted_iota(jnp.int32, (sp, hlpad), 1)
    y0i = y0.astype(jnp.int32)
    s0 = row_y == y0i
    s1 = row_y == y0i + 1
    r0 = _select_dot(s0, v)                        # [sp, WDpad] f32
    r1 = _select_dot(s1, v)
    ry = wy0 * r0 + wy1 * r1

    lane_x = jax.lax.broadcasted_iota(jnp.int32, (sp, wdpad), 1) // d
    x0i = x0.astype(jnp.int32)
    h0 = lane_x == x0i
    h1 = lane_x == x0i + 1
    xexp = jnp.where(h0, wx0, 0.0) + jnp.where(h1, wx1, 0.0)

    # dT[s, d] = g[s // P, d]  (M2^T), then dP = dT @ M^T. g and dT are
    # f32 data — two bf16 passes each.
    scol = jax.lax.broadcasted_iota(jnp.int32, (sp, qt), 0) // p
    qcol = jax.lax.broadcasted_iota(jnp.int32, (sp, qt), 1)
    m2t = (scol == qcol).astype(fdt)
    dt_ = _dot01_lhs(m2t, g)                        # [sp, D]
    mj = jax.lax.broadcasted_iota(jnp.int32, (d, wdpad), 1) % d
    md = jax.lax.broadcasted_iota(jnp.int32, (d, wdpad), 0)
    mt = (mj == md).astype(fdt)
    dp = _dot01_rhs(dt_, mt)                        # [sp, WDpad]

    dry = dp * xexp
    dxexp = dp * ry
    dwy0 = jnp.sum(dry * r0, axis=-1, keepdims=True)     # [sp, 1]
    dwy1 = jnp.sum(dry * r1, axis=-1, keepdims=True)
    dwx0 = jnp.sum(jnp.where(h0, dxexp, 0.0), axis=-1, keepdims=True)
    dwx1 = jnp.sum(jnp.where(h1, dxexp, 0.0), axis=-1, keepdims=True)
    zrow = jnp.zeros((1, sp), fdt)
    df_ref[0, 0] = jnp.concatenate(
        [
            zrow,                     # dy0 (selector coord — nondiff)
            zrow,                     # dx0
            _row(eye, dwy0),
            _row(eye, dwy1),
            _row(eye, dwx0),
            _row(eye, dwx1),
            zrow,
            zrow,
        ],
        axis=0,
    )

    # dV += S0^T @ (wy0 . dRy) + S1^T @ (wy1 . dRy); the transposed selects
    # are built from the field ROW directly (no in-kernel transpose), and
    # the f32 data rhs goes through the bf16x2 split.
    col_y = jax.lax.broadcasted_iota(jnp.int32, (hlpad, sp), 0)
    y0ri = f[_F_Y0:_F_Y0 + 1].astype(jnp.int32)     # [1, sp]
    s0t = (col_y == y0ri).astype(fdt)
    s1t = (col_y == y0ri + 1).astype(fdt)
    dv_ref[0] += (
        _dot01_lhs(s0t, wy0 * dry)
        + _dot01_lhs(s1t, wy1 * dry)
    )


# ------------------------------------------------- per-level custom VJP


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8)
)
def _level_attn(vpad, fpack, sp, qt, p, hlpad, wdpad, d, interpret):
    return _level_attn_fwd_impl(
        vpad, fpack, sp, qt, p, hlpad, wdpad, d, interpret
    )


def _level_attn_fwd_impl(vpad, fpack, sp, qt, p, hlpad, wdpad, d, interpret):
    bh, nqt = fpack.shape[0], fpack.shape[1]
    kern = functools.partial(
        _fwd_kernel, sp=sp, qt=qt, p=p, hlpad=hlpad, wdpad=wdpad, d=d
    )
    return pl.pallas_call(
        kern,
        grid=(bh, nqt),
        in_specs=[
            pl.BlockSpec((1, hlpad, wdpad), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _F_ROWS, sp), lambda b, q: (b, q, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, qt, d), lambda b, q: (b, q, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bh, nqt, qt, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(vpad, fpack)


def _level_attn_fwd(vpad, fpack, sp, qt, p, hlpad, wdpad, d, interpret):
    out = _level_attn_fwd_impl(
        vpad, fpack, sp, qt, p, hlpad, wdpad, d, interpret
    )
    return out, (vpad, fpack)


def _level_attn_bwd(sp, qt, p, hlpad, wdpad, d, interpret, res, g):
    vpad, fpack = res
    bh, nqt = fpack.shape[0], fpack.shape[1]
    kern = functools.partial(
        _bwd_kernel, sp=sp, qt=qt, p=p, hlpad=hlpad, wdpad=wdpad, d=d
    )
    dvpad, dfpack = pl.pallas_call(
        kern,
        grid=(bh, nqt),
        in_specs=[
            pl.BlockSpec((1, hlpad, wdpad), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _F_ROWS, sp), lambda b, q: (b, q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qt, d), lambda b, q: (b, q, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, hlpad, wdpad), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _F_ROWS, sp), lambda b, q: (b, q, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(vpad.shape, jnp.float32),
            jax.ShapeDtypeStruct(fpack.shape, jnp.float32),
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
    MXU kernel — same math and zero-padding semantics as
    ``ops.deform_attn.ms_deform_attn_batched`` (equivalence-tested),
    differentiable (custom VJP, backward also on the MXU)."""
    b, n, h, d = values.shape
    q = locations.shape[1]
    l = len(level_shapes)
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

    out = jnp.zeros((bh, nqt, qt, d), jnp.float32)
    for li, (hl, wl) in enumerate(level_shapes):
        hlpad = _round_up(hl + 1, 16)   # sublane tile for bf16 operands
        wdpad = _round_up(wl * d, 128)
        wlpad = wdpad // d

        vl = values[:, offsets[li]:offsets[li] + hl * wl]
        vl = vl.reshape(b, hl, wl, h, d).transpose(0, 3, 1, 2, 4)
        vl = jnp.pad(
            vl, ((0, 0), (0, 0), (0, hlpad - hl), (0, wlpad - wl), (0, 0))
        ).reshape(bh, hlpad, wdpad)

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
        y0s = jnp.clip(y0, -1.0, float(hlpad - 1))
        x0s = jnp.clip(x0, -1.0, float(wlpad - 1))

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
                jnp.zeros((bh, nqt, sp), jnp.float32),
                jnp.zeros((bh, nqt, sp), jnp.float32),
            ],
            axis=2,
        )                                          # [BH, nqt, 8, sp]

        out = out + _level_attn(
            vl, fpack, sp, qt, p, hlpad, wdpad, d, interpret,
        )

    out = out.reshape(b, h, qpad, d)[:, :, :q]
    return out.transpose(0, 2, 1, 3)               # [B, Q, H, D]
