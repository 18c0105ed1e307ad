"""Exact linear-sum assignment inside ``jit`` (the matcher of the DETR
set-prediction family — a build extra beyond the TF2 reference's
IoU-threshold matchers, SURVEY.md C11/C14).

DETR's loss requires an OPTIMAL bipartite matching between the fixed set of
object queries and the (padded) ground-truth set every training step. The
canonical implementations call ``scipy.optimize.linear_sum_assignment`` on
host, which would force a device→host→device round trip inside the hot loop
and break ``jit``/sharding. This module instead implements the same
algorithm scipy uses — Jonker–Volgenant shortest-augmenting-path with dual
potentials (Crouse, "On implementing 2D rectangular assignment",
IEEE TAES 2016) — as a fully static-shape JAX program:

- the outer loop over rows is a ``lax.scan`` (R fixed iterations);
- each row's Dijkstra search is a ``lax.while_loop`` over at-most-C
  augmenting steps with vectorized O(C) edge relaxation per step (the VPU
  does the row relaxation in one fused pass);
- the augmenting-path walk-back is a second short ``lax.while_loop``.

Costs must be finite. Rows with CONSTANT cost (e.g. padded ground-truth
rows) are safe: a constant row is indifferent across columns, so by an
exchange argument the restriction of any optimal full assignment to the
non-constant rows is itself optimal — padding does not perturb the real
matches (tested against scipy on the valid sub-matrix).

Complexity is O(R·C²) scalar work in sequential ``lax`` loops — at DETR
scale (R ≤ 100 padded GT, C = 100 queries, batched via ``vmap``) this is
microseconds next to the transformer forward/backward it matches for.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = ["hungarian", "hungarian_masked"]


def _solve_row(cost, carry, cur_row):
    """One Jonker–Volgenant augmenting step: assign ``cur_row`` optimally
    given the duals/partial assignment in ``carry`` (see module docstring
    for the algorithm)."""
    rows, cols = cost.shape
    inf = jnp.float32(jnp.inf)
    u, v, col4row, row4col = carry

    # --- Dijkstra from cur_row over the alternating-path graph --------
    # shortest[j]: cheapest reduced-cost path source→column j found so
    # far; path[j]: the row that path enters j from (for walk-back).
    def search_cond(st):
        return st[0] < 0  # sink not found

    def search_body(st):
        sink, i, min_val, shortest, path, scanned_r, scanned_c = st
        scanned_r = scanned_r.at[i].set(True)
        # Relax all edges out of row i in one vector op.
        reduced = min_val + cost[i] - u[i] - v
        better = (~scanned_c) & (reduced < shortest)
        shortest = jnp.where(better, reduced, shortest)
        path = jnp.where(better, i, path)
        # Scan the cheapest unscanned column.
        masked = jnp.where(scanned_c, inf, shortest)
        j = jnp.argmin(masked).astype(jnp.int32)
        min_val = masked[j]
        scanned_c = scanned_c.at[j].set(True)
        owner = row4col[j]
        sink = jnp.where(owner < 0, j, jnp.int32(-1))
        i = jnp.where(owner < 0, i, owner)
        return sink, i, min_val, shortest, path, scanned_r, scanned_c

    init = (
        jnp.int32(-1),
        cur_row,
        jnp.float32(0.0),
        jnp.full((cols,), inf),
        jnp.full((cols,), -1, jnp.int32),
        jnp.zeros((rows,), bool),
        jnp.zeros((cols,), bool),
    )
    sink, _, min_val, shortest, path, scanned_r, scanned_c = (
        lax.while_loop(search_cond, search_body, init)
    )

    # --- Dual updates (keep reduced costs nonnegative) -----------------
    u = u.at[cur_row].add(min_val)
    other_scanned = scanned_r & (
        jnp.arange(rows, dtype=jnp.int32) != cur_row
    )
    # Every scanned row except cur_row is assigned; gather is masked so
    # the -1 col4row of unscanned rows never contributes.
    u = jnp.where(
        other_scanned,
        u + min_val - shortest[jnp.clip(col4row, 0, cols - 1)],
        u,
    )
    v = jnp.where(scanned_c, v - (min_val - shortest), v)

    # --- Augment: walk back from the sink flipping assignments --------
    def aug_cond(st):
        return ~st[0]

    def aug_body(st):
        _, j, col4row, row4col = st
        i = path[j]
        row4col = row4col.at[j].set(i)
        j_next = col4row[i]
        col4row = col4row.at[i].set(j)
        return (i == cur_row), j_next, col4row, row4col

    _, _, col4row, row4col = lax.while_loop(
        aug_cond, aug_body, (jnp.bool_(False), sink, col4row, row4col)
    )
    return (u, v, col4row, row4col)


def _init_carry(rows, cols):
    return (
        jnp.zeros((rows,), jnp.float32),
        jnp.zeros((cols,), jnp.float32),
        jnp.full((rows,), -1, jnp.int32),
        jnp.full((cols,), -1, jnp.int32),
    )


def _check_shape(cost):
    rows, cols = cost.shape
    if rows > cols:
        raise ValueError(
            f"hungarian needs rows <= cols (every row assigned a distinct "
            f"column); got [{rows}, {cols}] — transpose the cost"
        )
    return rows, cols


def hungarian(cost: jnp.ndarray) -> jnp.ndarray:
    """Minimize ``sum(cost[i, col4row[i]])`` over injective row→column maps.

    Args:
      cost: ``[R, C]`` finite cost matrix with ``R <= C`` (every row gets a
        distinct column).

    Returns:
      ``col4row``: ``[R]`` int32, the optimal column for each row. Total
      cost matches ``scipy.optimize.linear_sum_assignment`` exactly (the
      assignment itself may differ on ties).
    """
    rows, cols = _check_shape(cost)
    cost = cost.astype(jnp.float32)

    def solve_row(carry, cur_row):
        return _solve_row(cost, carry, cur_row), None

    (_, _, col4row, _), _ = lax.scan(
        solve_row, _init_carry(rows, cols), jnp.arange(rows, dtype=jnp.int32)
    )
    return col4row


def hungarian_masked(cost: jnp.ndarray, row_valid: jnp.ndarray) -> jnp.ndarray:
    """``hungarian`` restricted to the VALID rows — the set-loss hot path.

    The DETR-family losses pad ground truth to a static ``G`` (e.g. 100)
    while typical images carry ~1–10 real objects. ``hungarian`` must scan
    all ``G`` rows; under the (layers × batch) ``vmap`` those sequential
    augmenting steps run in lockstep, so the padded rows dominate the
    matcher's latency. This variant runs the SAME Jonker–Volgenant row
    step, but as a ``lax.while_loop`` over only the valid rows (valid-first
    stable order), so the trip count — and, vmapped, the lockstep trip
    count — is ``max(num_valid)`` instead of ``G``.

    The restriction is exact, not an approximation: an optimal assignment
    of the valid sub-matrix is what the loss consumes (the padded rows'
    constant-cost columns were provably arbitrary — module docstring).

    Returns ``col4row`` [R] int32 with the optimal column for each VALID
    row and the out-of-bounds sentinel ``C`` for invalid rows — pair with
    ``mode="drop"`` scatters (JAX gathers clamp, so downstream
    ``pred[match]`` reads stay in-bounds and must be masked by validity,
    which the set losses already do).
    """
    rows, cols = _check_shape(cost)
    cost = cost.astype(jnp.float32)
    row_valid = row_valid.astype(bool)
    order = jnp.argsort(~row_valid, stable=True)   # valid rows first
    num_valid = jnp.sum(row_valid.astype(jnp.int32))

    def cond(st):
        return st[0] < num_valid

    def body(st):
        k, carry = st
        return k + 1, _solve_row(cost, carry, order[k])

    _, (_, _, col4row, _) = lax.while_loop(
        cond, body, (jnp.int32(0), _init_carry(rows, cols))
    )
    return jnp.where(row_valid, col4row, jnp.int32(cols))
