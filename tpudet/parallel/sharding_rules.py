"""Parameter sharding rules over the ('data', 'model') mesh.

Data parallelism replicates all parameters. With a nontrivial 'model' axis
the detection head's MLP — the only layer tier wide enough to matter in this
workload — is sharded Megatron-style:

    fc1 kernel [in, fc]   -> P(None, 'model')   (column-parallel)
    fc1 bias   [fc]       -> P('model')
    fc2 kernel [fc, fc]   -> P('model', None)   (row-parallel)

XLA's SPMD partitioner then inserts the reduce-scatter/all-reduce on the fc2
output; everything else stays replicated. Rules are name-based on the
parameter path, so they apply identically to the optimizer state (whose trees
embed the same path segments) — a true TP layout, not just an input sharding.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for_path(path: str, leaf) -> P:
    if "det_head" in path:
        if path.endswith("fc1/kernel") and leaf.ndim == 2:
            return P(None, "model")
        if path.endswith("fc1/bias") and leaf.ndim == 1:
            return P("model")
        if path.endswith("fc2/kernel") and leaf.ndim == 2:
            return P("model", None)
    # DETR transformer: Megatron attention + MLP sharding. Attention
    # projections shard over the HEADS axis (each shard computes its heads'
    # attention end-to-end, zero communication inside the block); the out
    # projection is row-parallel over heads, so XLA all-reduces its output
    # once per block. The FFN follows the same column->row pattern as the
    # det-head MLP above. Flax MHA kernels are DenseGeneral 3-tensors:
    # q/k/v [d_model, heads, head_dim], out [heads, head_dim, d_model].
    if "self_attn" in path or "cross_attn" in path:
        if path.endswith("out/kernel") and leaf.ndim == 3:
            return P("model", None, None)
        if leaf.ndim == 3 and any(
            path.endswith(f"{p}/kernel") for p in ("query", "key", "value")
        ):
            return P(None, "model", None)
        if leaf.ndim == 2 and any(
            path.endswith(f"{p}/bias") for p in ("query", "key", "value")
        ):
            return P("model", None)
    # Deformable DETR's MSDeformAttn (models/deformable_detr.py): the value
    # projection is column-parallel [d, d] whose output reshapes to
    # [N, heads, head_dim] — sharding the output columns over 'model'
    # shards the HEADS axis (model must divide num_heads x head_dim at a
    # head boundary, which holds whenever model divides num_heads); the
    # per-head sampling gather then runs shard-local, and the out
    # projection is row-parallel (one all-reduce per block). The offset /
    # attention-weight layers are query-sized and stay replicated.
    if "deform_attn" in path or "cross_attn" in path:
        if path.endswith("value/kernel") and leaf.ndim == 2:
            return P(None, "model")
        if path.endswith("value/bias") and leaf.ndim == 1:
            return P("model")
        if path.endswith("out/kernel") and leaf.ndim == 2:
            return P("model", None)
    if "/ffn/" in path:
        if path.endswith("fc1/kernel") and leaf.ndim == 2:
            return P(None, "model")
        if path.endswith("fc1/bias") and leaf.ndim == 1:
            return P("model")
        if path.endswith("fc2/kernel") and leaf.ndim == 2:
            return P("model", None)
    # ViTDet backbone blocks (models/vit.py): q/k/v are [D, D] Dense layers
    # whose COLUMN axis reshapes to (heads, head_dim) with heads outermost,
    # so column-parallel sharding lands on a head boundary whenever 'model'
    # divides num_heads (vit_b: 12 heads); out is row-parallel (one
    # all-reduce per block). The block MLP follows the same column->row
    # pattern under its mlp_fc1/mlp_fc2 names.
    if "/attn/" in path:
        if path.endswith("out/kernel") and leaf.ndim == 2:
            return P("model", None)
        if leaf.ndim == 2 and any(
            path.endswith(f"{p}/kernel") for p in ("query", "key", "value")
        ):
            return P(None, "model")
        if leaf.ndim == 1 and any(
            path.endswith(f"{p}/bias") for p in ("query", "key", "value")
        ):
            return P("model")
    if path.endswith("mlp_fc1/kernel") and leaf.ndim == 2:
        return P(None, "model")
    if path.endswith("mlp_fc1/bias") and leaf.ndim == 1:
        return P("model")
    if path.endswith("mlp_fc2/kernel") and leaf.ndim == 2:
        return P("model", None)
    return P()


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def train_state_shardings(mesh: Mesh, state):
    """Pytree of NamedShardings for a TrainState under the TP rules.

    With mesh['model'] == 1 every spec degenerates to fully replicated.
    """
    if mesh.shape.get("model", 1) == 1:
        return jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), state
        )
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, _spec_for_path(_path_str(path), leaf)
        ),
        state,
    )


def shard_train_state(mesh: Mesh, state):
    """Place a TrainState on the mesh under the TP/DP layout."""
    return jax.device_put(state, train_state_shardings(mesh, state))
