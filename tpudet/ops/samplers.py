"""Fixed-size balanced minibatch sampling (SURVEY.md C11/C14 sampling halves).

Reference semantics (Faster R-CNN §3.1.3 / Fast R-CNN §2.3): draw K examples
per image with at most ``positive_fraction * K`` random positives, filling the
remainder with random negatives. Dynamic counts are forbidden under jit, so
the sampler is formulated as one static top-k over randomized priorities:

  priority = 2 + U(0,1)  for the <=K_pos randomly chosen positives
             1 + U(0,1)  for all negatives
             0           for everything else (ignored labels)

``top_k(priority, K)`` then yields exactly min(#pos, K_pos) positives followed
by random negatives up to K, with a validity mask for the (rare) case of fewer
than K candidates total.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def sample_balanced(
    labels: jnp.ndarray,
    rng: jax.Array,
    num_samples: int,
    positive_fraction: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample from [N] labels (1 pos / 0 neg / -1 ignore).

    Returns (indices [K] int32, is_positive [K] bool, valid [K] bool).
    Invalid slots point at index 0 and must be masked by callers.
    """
    n = labels.shape[0]
    k = num_samples
    k_pos = int(round(num_samples * positive_fraction))
    rng_pos, rng_tie = jax.random.split(rng)

    is_pos = labels == 1
    is_neg = labels == 0

    # Randomly choose up to k_pos positives: random priority per positive,
    # top-k, scatter back into a mask.
    pos_rand = jnp.where(is_pos, jax.random.uniform(rng_pos, (n,)), -1.0)
    _, pos_idx = jax.lax.top_k(pos_rand, k_pos)
    pos_sel = jnp.zeros((n,), dtype=bool).at[pos_idx].set(True) & is_pos

    tie = jax.random.uniform(rng_tie, (n,))
    priority = jnp.where(pos_sel, 2.0 + tie, jnp.where(is_neg, 1.0 + tie, 0.0))
    top_vals, indices = jax.lax.top_k(priority, k)
    valid = top_vals > 0.0
    is_positive = top_vals >= 2.0
    indices = jnp.where(valid, indices, 0)
    return indices.astype(jnp.int32), is_positive, valid
