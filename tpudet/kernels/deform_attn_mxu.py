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

Exactness: selection matrices are 0/1 (representable exactly in bf16), all
weights stay f32, accumulation is f32 — numerically the same contraction
as the flat-gather path (bf16 values x f32 weights, f32 accumulate), so
the equivalence tests run at gather-path tolerances. grid_sample
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


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# --------------------------------------------------------------- kernels


def _fwd_kernel(v_ref, y0_ref, x0_ref, wy_ref, wx_ref, out_ref,
                *, sp, qt, p, hlpad, wdpad, d):
    """One (bh, query-tile) grid step of one level's sampling."""
    fdt = jnp.float32
    v = v_ref[0]                                   # [HLpad, WDpad] value dt
    y0 = y0_ref[0, 0]                              # [sp, 1] f32
    x0 = x0_ref[0, 0]                              # [sp, 1] f32
    wy = wy_ref[0, 0]                              # [sp, 2] f32
    wx = wx_ref[0, 0]                              # [sp, 2] f32

    # Mosaic's tpu.iota is integer-only — compare in int32 (the f32
    # inputs hold exact small integers; truncation is exact for them).
    row_y = jax.lax.broadcasted_iota(jnp.int32, (sp, hlpad), 1)
    y0i = y0.astype(jnp.int32)
    s0 = (row_y == y0i).astype(v.dtype)            # 0/1 exact in any dtype
    s1 = (row_y == y0i + 1).astype(v.dtype)
    r0 = jnp.dot(s0, v, preferred_element_type=fdt)   # [sp, WDpad]
    r1 = jnp.dot(s1, v, preferred_element_type=fdt)
    ry = wy[:, 0:1] * r0 + wy[:, 1:2] * r1

    lane_x = jax.lax.broadcasted_iota(jnp.int32, (sp, wdpad), 1) // d
    x0i = x0.astype(jnp.int32)
    xexp = (
        jnp.where(lane_x == x0i, wx[:, 0:1], 0.0)
        + jnp.where(lane_x == x0i + 1, wx[:, 1:2], 0.0)
    )
    pm = ry * xexp                                 # [sp, WDpad] f32

    # Lane segment-sum over x via a 0/1 matmul: M[j, d'] = (j % D == d').
    mj = jax.lax.broadcasted_iota(jnp.int32, (wdpad, d), 0) % d
    md = jax.lax.broadcasted_iota(jnp.int32, (wdpad, d), 1)
    m = (mj == md).astype(fdt)
    t = jnp.dot(pm, m, preferred_element_type=fdt)  # [sp, D]

    # Sum the P points of each query: M2[q, s] = (s // P == q).
    srow = jax.lax.broadcasted_iota(jnp.int32, (qt, sp), 1) // p
    qrow = jax.lax.broadcasted_iota(jnp.int32, (qt, sp), 0)
    m2 = (srow == qrow).astype(fdt)
    out_ref[0, 0] = jnp.dot(m2, t, preferred_element_type=fdt)


def _bwd_kernel(v_ref, y0c_ref, y0r_ref, x0_ref, wy_ref, wx_ref, g_ref,
                dv_ref, dwy_ref, dwx_ref,
                *, sp, qt, p, hlpad, wdpad, d):
    """Backward of one (bh, query-tile) grid step: recomputes the forward's
    selections (cheaper than saving [sp, WDpad] residuals to HBM) and emits
    dV (accumulated across query tiles — the output block's index map is
    constant in qt, so sequential grid steps revisit it), dwy, dwx."""
    fdt = jnp.float32
    v = v_ref[0]
    y0 = y0c_ref[0, 0]                             # [sp, 1]
    y0r = y0r_ref[0, 0]                            # [1, sp]
    x0 = x0_ref[0, 0]
    wy = wy_ref[0, 0]
    wx = wx_ref[0, 0]
    g = g_ref[0, 0]                                # [Qt, D] f32

    qtile = pl.program_id(1)

    @pl.when(qtile == 0)
    def _():
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    row_y = jax.lax.broadcasted_iota(jnp.int32, (sp, hlpad), 1)
    y0i = y0.astype(jnp.int32)
    s0 = (row_y == y0i).astype(v.dtype)
    s1 = (row_y == y0i + 1).astype(v.dtype)
    r0 = jnp.dot(s0, v, preferred_element_type=fdt)
    r1 = jnp.dot(s1, v, preferred_element_type=fdt)
    ry = wy[:, 0:1] * r0 + wy[:, 1:2] * r1

    lane_x = jax.lax.broadcasted_iota(jnp.int32, (sp, wdpad), 1) // d
    x0i = x0.astype(jnp.int32)
    h0 = lane_x == x0i
    h1 = lane_x == x0i + 1
    xexp = jnp.where(h0, wx[:, 0:1], 0.0) + jnp.where(h1, wx[:, 1:2], 0.0)

    # dT[s, d] = g[s // P, d]  (M2^T), then dP = dT @ M^T.
    scol = jax.lax.broadcasted_iota(jnp.int32, (sp, qt), 0) // p
    qcol = jax.lax.broadcasted_iota(jnp.int32, (sp, qt), 1)
    m2t = (scol == qcol).astype(fdt)
    dt_ = jnp.dot(m2t, g, preferred_element_type=fdt)   # [sp, D]
    mj = jax.lax.broadcasted_iota(jnp.int32, (d, wdpad), 1) % d
    md = jax.lax.broadcasted_iota(jnp.int32, (d, wdpad), 0)
    mt = (mj == md).astype(fdt)
    dp = jnp.dot(dt_, mt, preferred_element_type=fdt)   # [sp, WDpad]

    dry = dp * xexp
    dxexp = dp * ry
    dwy_ref[0, 0] = jnp.concatenate(
        [
            jnp.sum(dry * r0, axis=-1, keepdims=True),
            jnp.sum(dry * r1, axis=-1, keepdims=True),
        ],
        axis=-1,
    )
    dwx_ref[0, 0] = jnp.concatenate(
        [
            jnp.sum(jnp.where(h0, dxexp, 0.0), axis=-1, keepdims=True),
            jnp.sum(jnp.where(h1, dxexp, 0.0), axis=-1, keepdims=True),
        ],
        axis=-1,
    )

    # dV += S0^T @ (wy0 . dRy) + S1^T @ (wy1 . dRy); the transposed selects
    # are built directly from the row-layout y0 (no in-kernel transpose).
    col_y = jax.lax.broadcasted_iota(jnp.int32, (hlpad, sp), 0)
    y0ri = y0r.astype(jnp.int32)
    s0t = (col_y == y0ri).astype(fdt)
    s1t = (col_y == y0ri + 1).astype(fdt)
    dv_ref[0] += (
        jnp.dot(s0t, wy[:, 0:1] * dry, preferred_element_type=fdt)
        + jnp.dot(s1t, wy[:, 1:2] * dry, preferred_element_type=fdt)
    )


# ------------------------------------------------- per-level custom VJP


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12)
)
def _level_attn(vpad, y0c, y0r, x0c, wy, wx,
                sp, qt, p, hlpad, wdpad, d, interpret):
    return _level_attn_fwd_impl(
        vpad, y0c, y0r, x0c, wy, wx, sp, qt, p, hlpad, wdpad, d, interpret
    )


def _level_attn_fwd_impl(vpad, y0c, y0r, x0c, wy, wx,
                         sp, qt, p, hlpad, wdpad, d, interpret):
    bh, nqt = y0c.shape[0], y0c.shape[1]
    kern = functools.partial(
        _fwd_kernel, sp=sp, qt=qt, p=p, hlpad=hlpad, wdpad=wdpad, d=d
    )
    return pl.pallas_call(
        kern,
        grid=(bh, nqt),
        in_specs=[
            pl.BlockSpec((1, hlpad, wdpad), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sp, 1), lambda b, q: (b, q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sp, 1), lambda b, q: (b, q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sp, 2), lambda b, q: (b, q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sp, 2), lambda b, q: (b, q, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, qt, d), lambda b, q: (b, q, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bh, nqt, qt, d), jnp.float32),
        interpret=interpret,
    )(vpad, y0c, x0c, wy, wx)


def _level_attn_fwd(vpad, y0c, y0r, x0c, wy, wx,
                    sp, qt, p, hlpad, wdpad, d, interpret):
    out = _level_attn_fwd_impl(
        vpad, y0c, y0r, x0c, wy, wx, sp, qt, p, hlpad, wdpad, d, interpret
    )
    return out, (vpad, y0c, y0r, x0c, wy, wx)


def _level_attn_bwd(sp, qt, p, hlpad, wdpad, d, interpret, res, g):
    vpad, y0c, y0r, x0c, wy, wx = res
    bh, nqt = y0c.shape[0], y0c.shape[1]
    # The backward tile is half the forward's: it keeps ~6 [sp, WDpad] f32
    # intermediates live (R0/R1/Ry/dP/dRy/dXexp) where the forward keeps 3.
    kern = functools.partial(
        _bwd_kernel, sp=sp, qt=qt, p=p, hlpad=hlpad, wdpad=wdpad, d=d
    )
    dvpad, dwy, dwx = pl.pallas_call(
        kern,
        grid=(bh, nqt),
        in_specs=[
            pl.BlockSpec((1, hlpad, wdpad), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sp, 1), lambda b, q: (b, q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, sp), lambda b, q: (b, q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sp, 1), lambda b, q: (b, q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sp, 2), lambda b, q: (b, q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sp, 2), lambda b, q: (b, q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qt, d), lambda b, q: (b, q, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, hlpad, wdpad), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sp, 2), lambda b, q: (b, q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sp, 2), lambda b, q: (b, q, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(vpad.shape, jnp.float32),
            jax.ShapeDtypeStruct(wy.shape, jnp.float32),
            jax.ShapeDtypeStruct(wx.shape, jnp.float32),
        ],
        interpret=interpret,
    )(vpad, y0c, y0r, x0c, wy, wx, g)
    zero = jnp.zeros_like
    return (dvpad.astype(vpad.dtype), zero(y0c), zero(y0r), zero(x0c),
            dwy, dwx)


_level_attn.defvjp(_level_attn_fwd, _level_attn_bwd)


# ------------------------------------------------------------ public op


def ms_deform_attn_mxu(
    values: jnp.ndarray,       # [B, N, H, D] level-concatenated tokens
    level_shapes: Sequence[Tuple[int, int]],
    locations: jnp.ndarray,    # [B, Q, H, L, P, 2]
    weights: jnp.ndarray,      # [B, Q, H, L, P]
    query_tile: int = 64,
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
        wy = jnp.stack(
            [
                jnp.where((y0 >= 0) & (y0 < hl), (1.0 - fy) * aw, 0.0),
                jnp.where((y0 + 1 >= 0) & (y0 + 1 < hl), fy * aw, 0.0),
            ],
            axis=-1,
        )                                          # [B, Q, H, P, 2]
        wx = jnp.stack(
            [
                jnp.where((x0 >= 0) & (x0 < wl), 1.0 - fx, 0.0),
                jnp.where((x0 + 1 >= 0) & (x0 + 1 < wl), fx, 0.0),
            ],
            axis=-1,
        )
        # Clamp the SELECTOR coordinates into the padded grid so the
        # float-iota equality can only fire on rows whose weight is
        # nonzero-eligible (weights above already gate correctness).
        y0s = jnp.clip(y0, -1.0, float(hlpad - 1))
        x0s = jnp.clip(x0, -1.0, float(wlpad - 1))

        def pack(t, last):
            # [B, Q, H, P(, c)] -> [BH, nqt, sp(, c)] with Q padded.
            t = jnp.moveaxis(t, 2, 1)              # [B, H, Q, P(, c)]
            padw = ((0, 0), (0, 0), (0, qpad - q), (0, 0))
            padw += ((0, 0),) if last else ()
            t = jnp.pad(t, padw)
            shape = (bh, nqt, sp) + ((last,) if last else ())
            return t.reshape(shape)

        y0c = pack(y0s, 0)[..., None]              # [BH, nqt, sp, 1]
        y0r = y0c.reshape(bh, nqt, 1, sp)
        x0c = pack(x0s, 0)[..., None]
        wyp = pack(wy, 2)
        wxp = pack(wx, 2)

        out = out + _level_attn(
            vl, y0c, y0r, x0c, wyp, wxp,
            sp, qt, p, hlpad, wdpad, d, interpret,
        )

    out = out.reshape(b, h, qpad, d)[:, :, :q]
    return out.transpose(0, 2, 1, 3)               # [B, Q, H, D]
