"""Exact blocked top-k partial selection (SURVEY.md §7 step 7's
"decode+top-k" kernel slot, C10).

``jax.lax.top_k`` on TPU sorts the full operand along its last axis; for the
FPN proposal path that means one ~130k-wide sort per image for the P2 grid
(the dominant non-conv cost of coco_r101_fpn inference — see the roofline in
KERNELS.md). Exact selection does not need a full sort: any member of the
global top-k must be inside its own block's top-k, so splitting the operand
into index-contiguous blocks, selecting top-k per block (one *batched* sort
over short rows, which XLA:TPU executes as independent per-row sorts), and
merging the ``nb*k`` survivors with one short final top-k yields the same
set.  This is plain XLA — a hand-written Pallas selection kernel was
evaluated against this design and offers no additional asymptotic win (the
batched sort already keeps the VPU busy; see KERNELS.md).

Tie-break equivalence (bit-identical to ``lax.top_k``, not just set-equal):
``lax.top_k`` orders equal values by ascending index.  Within a block the
per-row top-k preserves that; across blocks, every survivor of block *b*
precedes every survivor of block *b+1* in the merged operand, and blocks are
index-contiguous, so flat merge positions of equal values are in ascending
global index order.  The final ``top_k`` again breaks ties by position,
reproducing the global order exactly.  Boundary ties are safe for the same
containment reason: the global answer can use at most ``k`` values from one
block, and the per-block stage keeps the ``k`` lowest-index ones, which is
exactly the subset the global tie-break would pick.  Fuzz-tested with dense
tie spectra against ``lax.top_k`` in ``tests/test_selection.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def blocked_top_k(
    scores: jnp.ndarray, k: int, block_size: int = 8192
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over a 1-D score vector via per-block selection + merge.

    Bit-identical to ``jax.lax.top_k(scores, k)`` (values, indices, and tie
    order).  Falls back to ``lax.top_k`` directly when blocking cannot win
    (operand already short, or ``k`` so large the merge operand would not be
    meaningfully smaller than the input).

    Args:
      scores: ``[n]`` float scores (any real dtype; NaNs follow whatever
        ``lax.top_k`` does with them — do not feed NaNs).
      k: number of entries to select; must satisfy ``k <= n``.
      block_size: row width of the first-stage batched sort.  8192 keeps the
        row sort lane-friendly while bounding the merge operand at
        ``ceil(n/8192) * k``.

    Returns:
      ``(values, indices)`` with shapes ``[k]``, matching ``lax.top_k``.
    """
    n = scores.shape[0]
    if k >= n or n <= block_size:
        return jax.lax.top_k(scores, k)
    nb = -(-n // block_size)
    kb = min(k, block_size)
    # Merge operand must be decisively smaller than n for two sorts to beat
    # one; 2x is the break-even guard (measured: >4x is where the win is).
    if nb * kb * 2 >= n:
        return jax.lax.top_k(scores, k)
    pad = nb * block_size - n
    if pad:
        fill = (
            jnp.finfo(scores.dtype).min
            if jnp.issubdtype(scores.dtype, jnp.floating)
            else jnp.iinfo(scores.dtype).min
        )
        scores_p = jnp.concatenate(
            [scores, jnp.full((pad,), fill, scores.dtype)]
        )
    else:
        scores_p = scores
    rows = scores_p.reshape(nb, block_size)
    vals, idx = jax.lax.top_k(rows, kb)  # [nb, kb] batched row sort
    gidx = idx + (jnp.arange(nb, dtype=idx.dtype) * block_size)[:, None]
    merged_v = vals.reshape(-1)
    merged_i = gidx.reshape(-1)
    out_v, sel = jax.lax.top_k(merged_v, k)
    return out_v, merged_i[sel]
