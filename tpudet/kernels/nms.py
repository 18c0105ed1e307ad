"""Pallas TPU NMS kernel (SURVEY.md C10/C16; the tracked BASELINE metric
"NMS kernel µs/img").

Exact greedy NMS has a sequential dependency (a box is kept iff no *kept*
higher-scored box overlaps it), which fights the TPU's wide-vector model. The
kernel resolves it with the block formulation sketched in SURVEY.md §7:

  * Boxes are score-sorted (host-side ``lax.top_k``) and processed in tiles
    of 128 (the VPU lane width).
  * For tile i, suppression by all earlier tiles j<i is a fully vectorized
    [128, 128] IoU-block reduction against the finalized keep masks —
    this is the O(N²) part and it runs at VPU width.
  * Within-tile resolution iterates the suppression map
    K[c] = alive[c] & !any_{j<c}(hit[c,j] & K[j]) to its (unique) fixed
    point — each sweep a vectorized [128, 128] masked reduction, converging
    in ~chain-depth (typically 2–4) sweeps. This replaced a 128-step
    sequential scan that dominated batched NMS (vmapped grid instances run
    serially on the TensorCore).

Layout trick: boxes are passed in BOTH [N, 4] and [4, N] layouts so IoU
blocks broadcast as sublane-vector × lane-vector without any in-kernel
transposes; the keep mask is likewise kept in both orientations ([tiles, 128]
output + [128, tiles] scratch, one tiny relayout per tile).

Selection semantics match ``tpudet.ops.nms.nms`` exactly (ties → lower index;
NaN scores dropped); tests assert bit-equality against that oracle.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
# Rows per cross-tile suppression step (4 tiles): inputs are padded to a
# multiple of this so chunked slices stay in bounds.
CROSS_ROWS = 512
NEG_INF = -1e10


def _tile_coords_rows(boxes_nx4_ref, t0):
    """Coords of one tile as [128, 1] sublane vectors (row side)."""
    b = boxes_nx4_ref[pl.ds(t0, TILE), :]  # [128, 4]
    return b[:, 0:1], b[:, 1:2], b[:, 2:3], b[:, 3:4]


def _tile_coords_cols(boxes_4xn_ref, t0):
    """Coords of one tile as [1, 128] lane vectors (column side)."""
    x1 = boxes_4xn_ref[0:1, pl.ds(t0, TILE)]
    y1 = boxes_4xn_ref[1:2, pl.ds(t0, TILE)]
    x2 = boxes_4xn_ref[2:3, pl.ds(t0, TILE)]
    y2 = boxes_4xn_ref[3:4, pl.ds(t0, TILE)]
    return x1, y1, x2, y2


def _iou_block(rows, cols):
    """[128, 128] IoU block from row-side and col-side coord vectors."""
    rx1, ry1, rx2, ry2 = rows
    cx1, cy1, cx2, cy2 = cols
    iw = jnp.maximum(jnp.minimum(rx2, cx2) - jnp.maximum(rx1, cx1), 0.0)
    ih = jnp.maximum(jnp.minimum(ry2, cy2) - jnp.maximum(ry1, cy1), 0.0)
    inter = iw * ih
    ra = jnp.maximum(rx2 - rx1, 0.0) * jnp.maximum(ry2 - ry1, 0.0)
    ca = jnp.maximum(cx2 - cx1, 0.0) * jnp.maximum(cy2 - cy1, 0.0)
    union = ra + ca - inter
    return jnp.where(union > 0.0, inter / union, 0.0)


def _nms_kernel(iou_threshold, max_outputs, boxes_nx4_ref, boxes_4xn_ref,
                cand_ref, keep_ref, keep_t_ref):
    n_tiles = cand_ref.shape[0]
    p = keep_t_ref.shape[0]
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)

    # Zero-init in one shot: output tiles after the early exit stay empty,
    # and a zeroed keep_t scratch lets the chunked cross-tile pass read past
    # the finalized frontier (unfinalized tiles contribute keep=0, i.e.
    # nothing) instead of needing an exact j < i bound per 128-row tile.
    keep_ref[:, :] = jnp.zeros((n_tiles, TILE), jnp.float32)
    keep_t_ref[:, :] = jnp.zeros((p, 1), jnp.bfloat16)

    def tile_body(i):
        i0 = pl.multiple_of(i * TILE, TILE)
        cols_i = _tile_coords_cols(boxes_4xn_ref, i0)

        # --- cross-tile suppression by earlier tiles (vectorized) ---
        # CROSS_TILES tiles per loop step: the [c*128, 128] IoU block is
        # bigger vector work per iteration, amortizing the per-iteration
        # scalar/loop overhead that dominated at one tile per step
        # (measured ~4 µs per 128-row step vs ~0.3 µs of vector math;
        # chunking was ~3x on the 12k-box training NMS).
        def cross_body(cj, supp):
            c0 = pl.multiple_of(cj * CROSS_ROWS, CROSS_ROWS)
            b = boxes_nx4_ref[pl.ds(c0, CROSS_ROWS), :]
            rows = (b[:, 0:1], b[:, 1:2], b[:, 2:3], b[:, 3:4])
            blk = _iou_block(rows, cols_i) > iou_threshold  # [CROSS_ROWS,128]
            keep_j = keep_t_ref[pl.ds(c0, CROSS_ROWS), 0:1].astype(jnp.float32)
            hit = jnp.where(blk, keep_j, 0.0)
            return jnp.maximum(supp, jnp.max(hit, axis=0, keepdims=True))

        # ceil(i0 / CROSS_ROWS) chunks cover all finalized tiles; trailing
        # rows of the last chunk overlap tile i itself and beyond, which the
        # zeroed keep_t scratch renders inert.
        n_chunks = (i * TILE + CROSS_ROWS - 1) // CROSS_ROWS
        supp = jax.lax.fori_loop(
            0, n_chunks, cross_body, jnp.zeros((1, TILE), jnp.float32)
        )
        alive0 = cand_ref[pl.ds(i, 1), :] * (1.0 - supp)  # [1, 128]
        rows_i = _tile_coords_rows(boxes_nx4_ref, i0)

        # --- within-tile resolution: vectorized fixed-point iteration ---
        # Greedy NMS inside the tile is the unique fixed point of
        #   K[c] = alive[c] AND not any_{j<c}(hit[c, j] AND K[j])
        # (unique by induction over c: entry c depends only on entries < c).
        # Iterating K <- f(K) from K = alive converges in at most the
        # longest suppression-chain depth (<= 128, typically ~3) and every
        # sweep is a fully vectorized [128, 128] masked reduction — vs the
        # previous 128-step sequential scan of dynamic [1, 128] slices,
        # which dominated batched NMS time (grid instances run serially on
        # a TensorCore, so per-image kernel time is what matters).
        # The loop applies f twice per round, once in each layout, so no
        # in-loop transposes are needed; the exit check K == f(f(K)) is
        # sound because antitone-f 2-cycles collapse by the same induction.
        blk = _iou_block(rows_i, cols_i) > iou_threshold
        hit_cj = jnp.where(blk & (col_iota < sub_iota), 1.0, 0.0)  # [c, j]
        hit_jc = jnp.where(blk & (sub_iota < col_iota), 1.0, 0.0)  # [j, c]
        alive_col = alive0.reshape(TILE, 1)

        def fp_cond(state):
            _, changed = state
            return changed

        def fp_body(state):
            # 4x-unrolled double sweep (f^8 per loop iteration): the
            # while_loop's per-iteration branch overhead costs more than the
            # four [128,128] vector ops of one sweep, and extra sweeps past
            # convergence are no-ops on an already-fixed point.
            krow, _ = state
            k = krow
            for _ in range(4):
                sup_col = jnp.max(hit_cj * k, axis=1, keepdims=True)
                kcol = alive_col * (1.0 - sup_col)       # f(K), column layout
                sup_row = jnp.max(hit_jc * kcol, axis=0, keepdims=True)
                k = alive0 * (1.0 - sup_row)             # f(f(K)), row layout
            return k, jnp.max(jnp.abs(k - krow)) > 0.5

        keep_row, _ = jax.lax.while_loop(
            fp_cond, fp_body, (alive0, jnp.bool_(True))
        )

        keep_ref[pl.ds(i, 1), :] = keep_row
        keep_t_ref[pl.ds(i0, TILE), 0:1] = keep_row.reshape(TILE, 1).astype(
            jnp.bfloat16
        )
        return jnp.sum(keep_row)

    # Early exit (exact): callers take only the first ``max_outputs`` kept
    # boxes, and later boxes can never un-suppress anything — once the count
    # is reached the remaining tiles are irrelevant.
    def cond(state):
        i, count = state
        return (i < n_tiles) & (count < max_outputs)

    def body(state):
        i, count = state
        return i + 1, count + tile_body(i)

    jax.lax.while_loop(cond, body, (0, jnp.float32(0.0)))


def _nms_keep_mask(boxes_sorted, cand, iou_threshold: float,
                   max_outputs: int, interpret: bool = False) -> jnp.ndarray:
    """Sorted [P, 4] boxes + [P] candidate mask -> [P] keep mask (P % 128 == 0).

    The mask is exact for the first ``max_outputs`` kept boxes (tiles beyond
    the early-exit point report no keeps — by construction the caller never
    selects from them)."""
    p = boxes_sorted.shape[0]
    n_tiles = p // TILE
    kernel = functools.partial(_nms_kernel, iou_threshold, max_outputs)

    keep = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles, TILE), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # boxes [P, 4]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # boxes [4, P]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cand [tiles, 128]
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            # Sublane-major keep copy. (p, 1) pads to 128 lanes, so dtype is
            # the footprint lever: bf16 halves the 12k-box training size to
            # ~3 MB (values are exact 0/1 — bf16 is lossless here).
            pltpu.VMEM((p, 1), jnp.bfloat16),
        ],
        # The training config (12k boxes) plus vmap batching brushes the
        # default 16 MB scoped-VMEM budget; state the real requirement.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        boxes_sorted,
        boxes_sorted.T,
        cand.astype(jnp.float32).reshape(n_tiles, TILE),
    )
    return keep.reshape(p) > 0.5


def nms_pallas(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_outputs: int,
    valid_mask: Optional[jnp.ndarray] = None,
    score_threshold: Optional[float] = None,
    interpret: bool = False,
    presorted: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for ``tpudet.ops.nms.nms`` (same contract).

    ``presorted=True`` promises ``scores`` are already descending (e.g. they
    came out of the proposal top-k), skipping the in-function re-sort and
    box re-gather; masked/thresholded entries then simply become
    non-candidates in place instead of being pushed to the end — the
    selection is identical either way.

    Wrapped in a zero-gradient ``custom_vjp``: NMS selection is
    piecewise-constant in its inputs (gradients are zero a.e.), and without
    the wrapper JAX linearizes the kernel under ``value_and_grad``, doubling
    its VMEM footprint with tangent buffers for nothing.
    """
    return _nms_pallas_nograd(boxes, scores, valid_mask, iou_threshold,
                              max_outputs, score_threshold, interpret,
                              presorted)


def _nms_pallas_impl(boxes, scores, iou_threshold, max_outputs, valid_mask,
                     score_threshold, interpret=False, presorted=False):
    n = boxes.shape[0]
    if valid_mask is not None:
        scores = jnp.where(valid_mask, scores, NEG_INF)
    if score_threshold is not None:
        scores = jnp.where(scores > score_threshold, scores, NEG_INF)

    if presorted:
        order = jnp.arange(n, dtype=jnp.int32)
        candidate = scores > NEG_INF / 2
        boxes_sorted = boxes
    else:
        sorted_scores, order = jax.lax.top_k(scores, n)
        candidate = sorted_scores > NEG_INF / 2
        boxes_sorted = boxes[order]

    pad = (-n) % CROSS_ROWS
    if pad:
        boxes_sorted = jnp.concatenate(
            [boxes_sorted, jnp.zeros((pad, 4), boxes.dtype)], axis=0
        )
        candidate = jnp.concatenate(
            [candidate, jnp.zeros((pad,), bool)], axis=0
        )

    keep = _nms_keep_mask(
        boxes_sorted, candidate, iou_threshold, max_outputs, interpret
    )[:n]

    from tpudet.ops.nms import _select_kept

    return _select_kept(keep, order, max_outputs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _nms_pallas_nograd(boxes, scores, valid_mask, iou_threshold, max_outputs,
                       score_threshold, interpret, presorted):
    return _nms_pallas_impl(boxes, scores, iou_threshold, max_outputs,
                            valid_mask, score_threshold, interpret, presorted)


def _nms_pallas_fwd(boxes, scores, valid_mask, iou_threshold, max_outputs,
                    score_threshold, interpret, presorted):
    out = _nms_pallas_nograd(boxes, scores, valid_mask, iou_threshold,
                             max_outputs, score_threshold, interpret,
                             presorted)
    return out, (boxes, scores, valid_mask)


def _nms_pallas_bwd(iou_threshold, max_outputs, score_threshold, interpret,
                    presorted, res, _ct):
    import numpy as np

    boxes, scores, valid_mask = res
    # Non-inexact primals (the bool valid_mask) take float0 cotangents —
    # a same-dtype zeros array here is a TypeError under jax.grad.
    mask_ct = None
    if valid_mask is not None:
        mask_ct = (jnp.zeros_like(valid_mask)
                   if jnp.issubdtype(valid_mask.dtype, jnp.inexact)
                   else np.zeros(valid_mask.shape, dtype=jax.dtypes.float0))
    return (jnp.zeros_like(boxes), jnp.zeros_like(scores), mask_ct)


_nms_pallas_nograd.defvjp(_nms_pallas_fwd, _nms_pallas_bwd)
