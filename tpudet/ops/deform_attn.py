"""Multi-scale deformable attention sampling (Zhu et al., Deformable DETR,
arXiv:2010.04159 §4.1) — the sparse-attention primitive that replaces dense
encoder/decoder attention: each query attends to ``points`` bilinearly
sampled locations per head per feature level instead of every key.

TPU-first formulation (a build extra beyond the TF2 reference's
convolutional pipeline): the canonical implementation is a handwritten CUDA
gather kernel (``MSDeformAttnFunction``); here the whole op is ONE fused
XLA program per head — corner indices and bilinear/attention weights are
computed vectorized on the VPU, the four corner reads collapse into a
single flat gather over the level-concatenated token axis, and the weighted
reduction over (levels x points x corners) is a plain einsum. Everything is
static-shape: the level geometry is a compile-time constant, and
out-of-bounds corners contribute through a zeroed WEIGHT (grid_sample's
``padding_mode='zeros'`` semantics) rather than through control flow, so
the program contains no data-dependent branching for XLA to choke on.

Why not a Pallas kernel: the access pattern is a data-dependent random
gather over HBM-resident value maps. Pallas TPU kernels excel when DMA
patterns are computable at tile granularity (see kernels/roi_align_window
— RoIs map to contiguous windows); per-sample random access degenerates to
scalar-granularity DMA with no locality to exploit, which is exactly the
shape XLA's native gather already lowers well. Measured decision, same
policy as KERNELS.md's "anchor kernel" entry: the op belongs inside the
surrounding XLA program.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def level_start_offsets(level_shapes: Sequence[Tuple[int, int]]):
    """Static start offset of each (h, w) level in the concatenated token
    axis."""
    offsets, start = [], 0
    for h, w in level_shapes:
        offsets.append(start)
        start += h * w
    return tuple(offsets), start


def _corner_index_weight(locations, weights, level_shapes, offsets):
    """Corner gather indices + combined bilinear x attention weights.

    ``locations [..., L, P, 2]`` / ``weights [..., L, P]`` ->
    ``(idx [..., K] int32, cw [..., K] f32)`` with ``K = L*4*P`` in
    (level, corner, point) order. Out-of-grid corners contribute through a
    zeroed WEIGHT (grid_sample ``padding_mode='zeros'``); their index is
    clamped so the read stays in bounds."""
    flat_idx, corner_w = [], []
    for li, (hl, wl) in enumerate(level_shapes):
        loc = locations[..., li, :, :]                 # [..., P, 2]
        x = loc[..., 0] * wl - 0.5
        y = loc[..., 1] * hl - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        x0 = x0.astype(jnp.int32)
        y0 = y0.astype(jnp.int32)
        for dy in (0, 1):
            for dx in (0, 1):
                cx = x0 + dx
                cy = y0 + dy
                wgt = (fx if dx else 1.0 - fx) * (fy if dy else 1.0 - fy)
                inb = (cx >= 0) & (cx < wl) & (cy >= 0) & (cy < hl)
                cxc = jnp.clip(cx, 0, wl - 1)
                cyc = jnp.clip(cy, 0, hl - 1)
                flat_idx.append(offsets[li] + cyc * wl + cxc)  # [..., P]
                corner_w.append(jnp.where(inb, wgt, 0.0))
    idx = jnp.stack(flat_idx, axis=-2)                 # [..., L*4, P]
    cw = jnp.stack(corner_w, axis=-2)
    # Fold the attention weight into the bilinear corner weight: the stack
    # above interleaves (level, corner) on the -2 axis, i.e. element
    # (li*4 + c, p) — repeat the [..., L, P] weights 4x accordingly.
    aw = jnp.repeat(weights.astype(cw.dtype), 4, axis=-2)
    cw = cw * aw
    lead = idx.shape[:-2]
    return idx.reshape(*lead, -1), cw.reshape(*lead, -1)


def ms_deform_attn(
    values: jnp.ndarray,       # [N, H, D] level-concatenated value tokens
    level_shapes: Sequence[Tuple[int, int]],  # static ((h, w), ...) rows sum to N
    locations: jnp.ndarray,    # [Q, H, L, P, 2] (x, y) in [0,1] of each
                               #   level's FULL grid (grid_sample convention)
    weights: jnp.ndarray,      # [Q, H, L, P] attention weights (softmaxed
                               #   over the L*P axis by the caller)
) -> jnp.ndarray:              # [Q, H, D]
    """One image's multi-scale deformable attention (paper Eq. 3).

    Bilinear sampling follows ``F.grid_sample(align_corners=False,
    padding_mode='zeros')``, which the reference CUDA kernel implements:
    pixel-center coordinates are ``x * W - 0.5``, and samples whose corner
    falls outside the level grid contribute zero (their bilinear weight is
    zeroed; the gather index is clamped so the read stays in bounds).
    """
    q, h, l, p, _ = locations.shape
    n, heads, d = values.shape
    offsets, total = level_start_offsets(level_shapes)
    if total != n:
        raise ValueError(
            f"level_shapes {tuple(level_shapes)} sum to {total} tokens, "
            f"values carry {n}"
        )
    if h != heads or len(level_shapes) != l:
        raise ValueError("locations/values head or level count mismatch")

    idx, cw = _corner_index_weight(locations, weights, level_shapes, offsets)

    # One gather per head over the level-concatenated token axis, then the
    # weighted reduction as an einsum (a [Q, K] x [Q, K, D] contraction per
    # head — MXU-friendly batched matmul). The gather stays in the VALUE
    # dtype (bf16 in the bf16 presets — this op is gather-bound, so HBM
    # bytes ARE the cost); the einsum promotes to the f32 weights, keeping
    # the bilinear reduction in full precision.
    vals_h = values.transpose(1, 0, 2)                # [H, N, D]
    idx_h = idx.transpose(1, 0, 2)                    # [H, Q, K]
    gathered = jax.vmap(lambda v, i: v[i])(vals_h, idx_h)  # [H, Q, K, D]
    out = jnp.einsum(
        "hqk,hqkd->qhd", cw.transpose(1, 0, 2), gathered,
        preferred_element_type=jnp.float32,
    )
    return out


def ms_deform_attn_batched(
    values: jnp.ndarray,       # [B, N, H, D] level-concatenated tokens
    level_shapes: Sequence[Tuple[int, int]],
    locations: jnp.ndarray,    # [B, Q, H, L, P, 2]
    weights: jnp.ndarray,      # [B, Q, H, L, P]
    query_chunk: int = 2048,
) -> jnp.ndarray:              # [B, Q, H, D] (f32)
    """Whole-batch multi-scale deformable attention — same math as
    ``jax.vmap(ms_deform_attn)`` with two TPU-critical differences learned
    from a real-chip OOM (KERNELS.md "Deformable attention gather"):

    1. The corner gather is ONE flat embedding-style lookup over a
       ``[B*H*N, D]`` table with precomputed row offsets. The vmapped
       formulation hands XLA a gather with BATCHING dims, and the TPU
       gather expander rewrites that into a one-hot contraction that
       materializes ``[B*Q, N, K]`` f32 — 30 GB at the COCO b=16 decoder
       (16x256 queries x 14365 tokens x 64 corners), an instant HBM OOM.
       A plain rank-2 gather with 1-D indices is the canonical embedding
       lookup and lowers natively.
    2. The query axis is processed in static ``query_chunk`` slices
       (``lax.map`` over equal chunks, body rematerialized) so the gathered
       corners tensor ``[B, chunk, H, K, D]`` stays bounded regardless of
       Q — the encoder's Q is the full token count (~14k at COCO scale:
       unchunked that intermediate is ~7.5 GB bf16 at b=16, and training
       would also save it for the backward).
    """
    b, n, h, d = values.shape
    q = locations.shape[1]
    offsets, total = level_start_offsets(level_shapes)
    if total != n:
        raise ValueError(
            f"level_shapes {tuple(level_shapes)} sum to {total} tokens, "
            f"values carry {n}"
        )
    idx, cw = _corner_index_weight(locations, weights, level_shapes, offsets)
    k = idx.shape[-1]

    table = values.transpose(0, 2, 1, 3).reshape(b * h * n, d)
    row = (
        jnp.arange(b, dtype=jnp.int32)[:, None, None, None] * h
        + jnp.arange(h, dtype=jnp.int32)[None, None, :, None]
    ) * n                                               # [B, 1, H, 1]
    gidx = idx + row                                    # [B, Q, H, K]

    def chunk_fn(args):
        gi, w = args                                    # [B, c, H, K]
        g = table[gi.reshape(-1)].reshape(*gi.shape, d)
        return jnp.einsum(
            "bqhk,bqhkd->bqhd", w, g,
            preferred_element_type=jnp.float32,
        )

    if q <= query_chunk:
        return chunk_fn((gidx, cw))
    nc = -(-q // query_chunk)
    pad = nc * query_chunk - q
    gidx = jnp.pad(gidx, ((0, 0), (0, pad), (0, 0), (0, 0)))
    cwp = jnp.pad(cw, ((0, 0), (0, pad), (0, 0), (0, 0)))
    gidx = gidx.reshape(b, nc, query_chunk, h, k).transpose(1, 0, 2, 3, 4)
    cwp = cwp.reshape(b, nc, query_chunk, h, k).transpose(1, 0, 2, 3, 4)
    out = jax.lax.map(jax.checkpoint(chunk_fn), (gidx, cwp))
    out = out.transpose(1, 0, 2, 3, 4).reshape(b, nc * query_chunk, h, d)
    return out[:, :q]


def _patch_origin_cellweight(locations, weights, level_shapes):
    """Per-level clamped 2x2 patch origins + per-cell combined weights.

    The flat-gather formulation reads each of the 4 bilinear corners as its
    own 64 B row — a quarter of a lane-width per index, and the real-chip
    microbench (KERNELS.md "Deformable attention, part 2") measured the
    gather cost as per-INDEX, not per-byte. This helper re-derives the same
    math as one 2x2 PATCH per (level, point) sample: 4x fewer gather
    indices, each fetching a contiguous ``[2, 2, D]`` slice (a full
    128-element lane at D=32).

    Exactness under ``padding_mode='zeros'``: the patch origin is clamped to
    ``[0, hl-2]`` so the slice stays in bounds, and each patch CELL's weight
    is re-derived from the corner it actually covers after the clamp shift
    (``s = floor - origin`` in {-1, 0, 1}): a cell receives corner ``dy``'s
    bilinear weight iff ``s + dy`` lands on it AND that corner is in-grid,
    else zero — bit-matching the corner formulation's zeroed-weight
    semantics (tested in tests/test_deformable_detr.py::
    test_ms_deform_attn_patch_matches_flat and tests/test_deform_attn_mxu.py).

    ``locations [..., L, P, 2]`` / ``weights [..., L, P]`` -> per level
    ``(origin [..., P, 2] int32 (y, x), cellw [..., P, 4] f32)`` with cells
    in (dy, dx) row-major order. Levels must be at least 2x2.
    """
    out = []
    for li, (hl, wl) in enumerate(level_shapes):
        if hl < 2 or wl < 2:
            raise ValueError(
                f"patch gather needs level >= 2x2, got {(hl, wl)}"
            )
        loc = locations[..., li, :, :]                 # [..., P, 2]
        x = loc[..., 0] * wl - 0.5
        y = loc[..., 1] * hl - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        x0 = x0.astype(jnp.int32)
        y0 = y0.astype(jnp.int32)
        ox = jnp.clip(x0, 0, wl - 2)
        oy = jnp.clip(y0, 0, hl - 2)
        sx = x0 - ox                                   # in {-1, 0, 1}
        sy = y0 - oy

        def axis_cells(s, f, c0, size):
            # cell weight along one axis: cells (0, 1) of the clamped
            # patch; corner d in (0, 1) has weight (1-f, f) and grid
            # coordinate c0 + d.
            cells = []
            for a in (0, 1):
                acc = 0.0
                for dcorner in (0, 1):
                    wgt = f if dcorner else 1.0 - f
                    hit = (s + dcorner == a) & (c0 + dcorner >= 0) & (
                        c0 + dcorner < size
                    )
                    acc = acc + jnp.where(hit, wgt, 0.0)
                cells.append(acc)
            return cells                               # ([...], [...])

        cy = axis_cells(sy, fy, y0, hl)
        cx = axis_cells(sx, fx, x0, wl)
        aw = weights[..., li, :]                       # [..., P]
        cellw = jnp.stack(
            [cy[a] * cx[b_] * aw for a in (0, 1) for b_ in (0, 1)],
            axis=-1,
        )                                              # [..., P, 4]
        origin = jnp.stack([oy, ox], axis=-1)          # [..., P, 2]
        out.append((origin, cellw))
    return out


def ms_deform_attn_patch(
    values: jnp.ndarray,       # [B, N, H, D] level-concatenated tokens
    level_shapes: Sequence[Tuple[int, int]],
    locations: jnp.ndarray,    # [B, Q, H, L, P, 2], or [B, Q, L, P, 2] when
                               #   sampling locations are SHARED across heads
    weights: jnp.ndarray,      # [B, Q, H, L, P]
    query_chunk: int = 2048,
) -> jnp.ndarray:              # [B, Q, H, D] (f32)
    """Patch-gather formulation of whole-batch deformable attention — same
    math as ``ms_deform_attn_batched`` (exact to grid_sample zero-padding
    semantics), restructured for the TPU gather lowering's measured cost
    model (per-index, scalar-granularity — KERNELS.md "Deformable
    attention, part 2"):

    - each (level, point) sample is ONE ``lax.gather`` start fetching a
      contiguous ``[2, 2, D]`` corner patch from that level's ``[BH, hl,
      wl, D]`` grid — 4x fewer indices than the flat form, full-lane rows;
    - with ``locations`` lacking the head axis (head-SHARED sampling, a
      config-gated model variant), the level grids keep all heads in the
      row (``[B, hl, wl, H*D]``) — 4*H x fewer indices, 2 KB rows — and
      only the attention weights stay per-head;
    - the query axis is chunked exactly like the flat form so gathered
      patches stay bounded on the encoder's ~14k-token query axis.
    """
    b, n, h, d = values.shape
    q = locations.shape[1]
    shared = locations.ndim == 5
    offsets, total = level_start_offsets(level_shapes)
    if total != n:
        raise ValueError(
            f"level_shapes {tuple(level_shapes)} sum to {total} tokens, "
            f"values carry {n}"
        )
    p = locations.shape[-2]

    # Per-level spatial grids. Shared: [B, hl, wl, H*D] (heads ride the
    # row); per-head: [B*H, hl, wl, D].
    grids = []
    for li, (hl, wl) in enumerate(level_shapes):
        vl = values[:, offsets[li]:offsets[li] + hl * wl]  # [B, hw, H, D]
        if shared:
            grids.append(vl.reshape(b, hl, wl, h * d))
        else:
            grids.append(
                vl.reshape(b, hl, wl, h, d)
                .transpose(0, 3, 1, 2, 4)
                .reshape(b * h, hl, wl, d)
            )

    # Per-level origin/cellw ONCE on the full query axis (cheap VPU math),
    # then chunk those tensors — nothing index-related is re-derived inside
    # lax.map. Shared layout: geometry is head-free (unit weights in), the
    # per-head attention weights fold in afterwards by broadcast.
    if shared:
        geo = _patch_origin_cellweight(
            locations, jnp.ones(locations.shape[:-1], jnp.float32),
            level_shapes,
        )
        origins = [o for o, _ in geo]          # [B, Q, P, 2] each
        cellws = [
            cw[:, :, None, :, :] * weights[:, :, :, li, :, None]
            for li, (_, cw) in enumerate(geo)
        ]                                      # [B, Q, H, P, 4] each
    else:
        per_level = _patch_origin_cellweight(
            locations, weights, level_shapes
        )
        origins = [o for o, _ in per_level]    # [B, Q, H, P, 2] each
        cellws = [cw for _, cw in per_level]   # [B, Q, H, P, 4] each

    rows = b if shared else b * h
    bidx = jnp.arange(rows, dtype=jnp.int32)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2),
    )

    def chunk_fn(args):
        # origins[li]: shared [B, c, P, 2]; per-head [B, c, H, P, 2].
        # cellws: [B, c, H, P, 4] either way (weights are always per-head;
        # in the shared layout _patch_origin_cellweight broadcast the
        # head-free locations against the per-head attention weights).
        origins, cellws = args
        c = origins[0].shape[1]
        acc = 0.0
        for li, _ in enumerate(level_shapes):
            og = origins[li]
            if shared:
                og = og.reshape(b, c * p, 2)
            else:
                og = og.transpose(0, 2, 1, 3, 4).reshape(b * h, c * p, 2)
            starts = jnp.concatenate(
                [
                    jnp.broadcast_to(
                        bidx[:, None, None], (rows, og.shape[1], 1)
                    ),
                    og,
                ],
                axis=-1,
            )
            g = jax.lax.gather(
                grids[li], starts, dnums,
                (1, 2, 2, grids[li].shape[-1]),
                mode=jax.lax.GatherScatterMode.CLIP,
            )                               # [rows, cP, 2, 2, lastdim]
            if shared:
                g = g.reshape(b, c, p, 4, h, d)
                acc = acc + jnp.einsum(
                    "bqhpc,bqpchd->bqhd", cellws[li], g,
                    preferred_element_type=jnp.float32,
                )
            else:
                g = g.reshape(b, h, c, p, 4, d)
                acc = acc + jnp.einsum(
                    "bqhpc,bhqpcd->bqhd", cellws[li], g,
                    preferred_element_type=jnp.float32,
                )
        return acc

    if q <= query_chunk:
        return chunk_fn((origins, cellws))

    nc = -(-q // query_chunk)
    pad = nc * query_chunk - q

    def split(t):
        # FLATTENED chunk-minor residual layout [nc, B, rest*c]: the train
        # path saves the whole stacked lax.map operands as backward
        # residuals, and any layout that puts the size-4/2 trailing dims
        # tile-minor costs a 32x HBM padding expansion — the
        # q14btrain_patch OOM (KERNELS.md "Deformable attention, parts
        # 4–5"). Merely reordering logical dims does NOT fix it (XLA's
        # layout assignment transposed a [nc, B, ..., c] version right
        # back, measured on chip); flattening removes every small dim so
        # no physical layout can pad. The map body reshapes back —
        # transient, per-chunk, inside the checkpointed region.
        t = jnp.pad(
            t, ((0, 0), (0, pad)) + ((0, 0),) * (t.ndim - 2)
        )
        r = t.reshape((t.shape[0], nc, query_chunk) + t.shape[2:])
        r = r.transpose((1, 0) + tuple(range(3, r.ndim)) + (2,))
        return r.reshape(nc, r.shape[1], -1), r.shape[2:]

    og_c, og_shapes = zip(*(split(o) for o in origins))
    cw_c, cw_shapes = zip(*(split(cw) for cw in cellws))
    og_c, cw_c = list(og_c), list(cw_c)

    def chunk_fn_flat(args):
        og, cw = args

        def unflatten(t, rest):
            return jnp.moveaxis(t.reshape((t.shape[0],) + rest), -1, 1)

        return chunk_fn((
            [unflatten(o, og_shapes[li]) for li, o in enumerate(og)],
            [unflatten(w, cw_shapes[li]) for li, w in enumerate(cw)],
        ))

    out = jax.lax.map(jax.checkpoint(chunk_fn_flat), (og_c, cw_c))
    out = out.transpose(1, 0, 2, 3, 4).reshape(b, nc * query_chunk, h, d)
    return out[:, :q]


def level_reference_points(
    level_shapes: Sequence[Tuple[int, int]],
) -> jnp.ndarray:
    """[N, 2] (x, y) normalized centers of every token of every level in
    its OWN full grid — the encoder's per-token reference points before
    valid-ratio correction (paper's ``get_reference_points``)."""
    refs = []
    for hl, wl in level_shapes:
        ys = (jnp.arange(hl, dtype=jnp.float32) + 0.5) / hl
        xs = (jnp.arange(wl, dtype=jnp.float32) + 0.5) / wl
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        refs.append(jnp.stack([gx, gy], axis=-1).reshape(-1, 2))
    return jnp.concatenate(refs, axis=0)


def sampling_offset_init_bias(
    num_heads: int, num_levels: int, num_points: int
) -> jnp.ndarray:
    """The paper's sampling-offset bias init: head k starts by looking along
    direction 2πk/H, at radius p+1 for its p-th point, identically at every
    level — so the zero-weight-initialized offset layer begins as a fixed
    directional probe instead of collapsing all samples onto the reference
    point. Shape [H * L * P * 2] matching the Dense bias layout."""
    thetas = jnp.arange(num_heads, dtype=jnp.float32) * (
        2.0 * math.pi / num_heads
    )
    grid = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], axis=-1)  # [H, 2]
    grid = grid / jnp.max(jnp.abs(grid), axis=-1, keepdims=True)
    grid = jnp.tile(grid[:, None, None, :], (1, num_levels, num_points, 1))
    scale = jnp.arange(1, num_points + 1, dtype=jnp.float32)
    grid = grid * scale[None, None, :, None]
    return grid.reshape(-1)


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Logit with the official implementation's clamping (stable around the
    iterative box-refinement updates)."""
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.log(jnp.maximum(x, eps)) - jnp.log(jnp.maximum(1.0 - x, eps))
