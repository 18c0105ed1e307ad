"""Pallas TPU RoI Align kernel (SURVEY.md C12; META: "RoI Align become[s]
hand-written Pallas kernels").

Formulation: grid over RoIs, one program per RoI. The feature map lives in
VMEM ([H*W, C] flattened so a bilinear corner is one dynamic-sublane row
load); each program computes its [S, S, C] output with the bin/sample loops
fully unrolled (static S and sampling_ratio) — 4 row loads + 1 fused
weighted-add per sample point, all scalar address arithmetic in registers.

Semantics match ``tpudet.ops.roi_align.roi_align`` (aligned=True, Detectron2
border rule: samples outside [-1, dim] contribute zero, in-range samples
clamp to [0, dim-1]).

Note on the default path: ``tpudet.ops.roi_align.roi_align_mxu`` reformulates
the same op as two MXU einsums; the model dispatches to whichever wins on the
measured shapes (see ``tpudet.kernels.roi_align_dispatch``). This kernel is
the gather-style implementation where channel counts are large enough that
the dense-weight matmul's O(S·H + S·W) blowup loses to 4-point gathers.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roi_align_kernel(
    output_size: int,
    sampling_ratio: int,
    height: int,
    width: int,
    rois_ref,       # SMEM [R, 4] f32 (x1, y1, x2, y2), feature coords
    feat_ref,       # VMEM [H*W, C]
    out_ref,        # VMEM [1, S*S, C] block for this program's RoI
):
    s, r = output_size, sampling_ratio
    c = feat_ref.shape[-1]
    i = pl.program_id(0)

    # Mosaic only allows dynamic sublane offsets at 8/16-row alignment; fetch
    # an aligned block and mask-select the target row (VMEM reads are cheap).
    ALIGN = 16
    sel_iota = jax.lax.broadcasted_iota(jnp.int32, (ALIGN, 1), 0)

    def fetch_row(idx):
        base = pl.multiple_of((idx // ALIGN) * ALIGN, ALIGN)
        block = feat_ref[pl.ds(base, ALIGN), :]  # [ALIGN, C]
        sel = sel_iota == (idx - base)
        return jnp.sum(
            jnp.where(sel, block, 0).astype(jnp.float32), axis=0, keepdims=True
        )

    x1 = rois_ref[i, 0] - 0.5
    y1 = rois_ref[i, 1] - 0.5
    bw = jnp.maximum(rois_ref[i, 2] - rois_ref[i, 0], 1e-6)
    bh = jnp.maximum(rois_ref[i, 3] - rois_ref[i, 1], 1e-6)
    bin_w = bw / s
    bin_h = bh / s

    inv = 1.0 / (r * r)
    for bi in range(s):
        for bj in range(s):
            acc = jnp.zeros((1, c), jnp.float32)
            for u in range(r):
                for v in range(r):
                    y = y1 + (bi + (u + 0.5) / r) * bin_h
                    x = x1 + (bj + (v + 0.5) / r) * bin_w
                    valid = (
                        (y >= -1.0) & (y <= height) & (x >= -1.0) & (x <= width)
                    )
                    yc = jnp.clip(y, 0.0, height - 1.0)
                    xc = jnp.clip(x, 0.0, width - 1.0)
                    y0 = jnp.clip(jnp.floor(yc).astype(jnp.int32), 0, height - 1)
                    x0 = jnp.clip(jnp.floor(xc).astype(jnp.int32), 0, width - 1)
                    y1i = jnp.minimum(y0 + 1, height - 1)
                    x1i = jnp.minimum(x0 + 1, width - 1)
                    ly = yc - y0.astype(jnp.float32)
                    lx = xc - x0.astype(jnp.float32)
                    w_val = jnp.where(valid, inv, 0.0)

                    f00 = fetch_row(y0 * width + x0)
                    f01 = fetch_row(y0 * width + x1i)
                    f10 = fetch_row(y1i * width + x0)
                    f11 = fetch_row(y1i * width + x1i)
                    top = f00 * (1.0 - lx) + f01 * lx
                    bot = f10 * (1.0 - lx) + f11 * lx
                    acc = acc + w_val * (top * (1.0 - ly) + bot * ly)
            out_ref[0, bi * s + bj, :] = acc.astype(out_ref.dtype)[0]


def roi_align_pallas(
    features: jnp.ndarray,   # [H, W, C]
    rois: jnp.ndarray,       # [R, 4] feature-map coords
    output_size: int,
    sampling_ratio: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    """[R, S, S, C] RoI-Align features (aligned=True semantics)."""
    h, w, c = features.shape
    n = rois.shape[0]
    s = output_size

    kernel = functools.partial(
        _roi_align_kernel, output_size, sampling_ratio, h, w
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # rois land in SMEM, available for addressing
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # feat [H*W, C], whole
        ],
        out_specs=pl.BlockSpec(
            (1, s * s, c), lambda i, rois_ref: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    feat2d = features.reshape(h * w, c)
    pad = (-feat2d.shape[0]) % 16  # aligned-block row fetches may over-read
    if pad:
        feat2d = jnp.concatenate(
            [feat2d, jnp.zeros((pad, c), feat2d.dtype)], axis=0
        )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, s * s, c), features.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(rois.astype(jnp.float32), feat2d)
    return out.reshape(n, s, s, c)
