"""Deformable-attention gather formulations, microbenchmarked on the chip.

q14a measured 29.86 s/batch (b=16, COCO canvas) for deformable-DETR
inference — ~1000x off the model's ~30 ms FLOP roofline — after the
one-hot-OOM fix routed sampling through one flat rank-2 gather. This
script times the candidate formulations standalone at the real encoder
scale so the next fix is measurement-driven, not guessed:

  A. flat     — current: [B*H*N, D] table, 1-D indices (one row per corner)
  B. patch    — lax.gather of [1, 2, 2, D] corner patches from
                [B*H, hl, wl, D] per level: 4x fewer indices, contiguous
                2x2xD slices
  C. sorted   — A but with per-(b,h) sorted indices + unsort
                (indices_are_sorted=True fast path, if any)
  D. onehot   — bf16 one-hot einsum per level, DECODER scale only
                (the formulation XLA auto-picked at f32; for reference)

Run on the chip via scripts/tpu_run_r4b.sh (step gmb). Prints one JSON
line per formulation: {"form": ..., "ms": ...}.
"""

import json
import time

import tpudet  # noqa: F401 — honors the TPUDET_PLATFORM backend pin
import jax
import jax.numpy as jnp
import numpy as np

# Real encoder scale: COCO 832x832 bucket, C3..C5 + one extra level.
# GMB_TINY=1 shrinks everything for a CPU shape-validation pass.
import os

if os.environ.get("GMB_TINY"):
    LEVEL_SHAPES = ((12, 12), (6, 6), (3, 3), (2, 2))
    B, H, D, L, P = 2, 2, 8, 4, 2
else:
    LEVEL_SHAPES = ((104, 104), (52, 52), (26, 26), (13, 13))
    B, H, D, L, P = 16, 8, 32, 4, 4
N = sum(h * w for h, w in LEVEL_SHAPES)
K = L * P * 4


def _sync(x):
    return jax.device_get(jax.tree_util.tree_leaves(x)[0])


def timeit(fn, *args, iters=5):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def report(tag, fn, *args, iters=5):
    """One formulation, OOM/compile-failure isolated."""
    try:
        ms = round(timeit(fn, *args, iters=iters), 2)
        print(json.dumps({"form": tag, "ms": ms}), flush=True)
    except Exception as e:  # noqa: BLE001 — record, keep measuring
        print(json.dumps({"form": tag, "error": str(e)[:300]}), flush=True)


def main():
    rng = np.random.default_rng(0)
    for q, tag in ((N, "encoder"), (256, "decoder")):
        values = jnp.asarray(
            rng.normal(size=(B, H, N, D)).astype(np.float32), jnp.bfloat16
        )
        idx = jnp.asarray(
            rng.integers(0, N, size=(B, H, q, K)).astype(np.int32)
        )
        w = jnp.asarray(rng.random((B, H, q, K)).astype(np.float32))

        # A: flat rank-2 gather over a [B*H*N, D] table, query axis in
        # 2048-wide chunks — EXACTLY the model's shipped formulation.
        @jax.jit
        def form_a(values, idx, w):
            table = values.reshape(B * H * N, D)
            row = (jnp.arange(B)[:, None, None, None] * H
                   + jnp.arange(H)[None, :, None, None]) * N
            gidx = idx + row                           # [B, H, q, K]
            chunk = 2048
            if q <= chunk:
                g = table[gidx.reshape(-1)].reshape(*gidx.shape, D)
                return jnp.einsum("bhqk,bhqkd->bhqd", w, g,
                                  preferred_element_type=jnp.float32)
            nc = -(-q // chunk)
            pad = nc * chunk - q
            gp = jnp.pad(gidx, ((0, 0), (0, 0), (0, pad), (0, 0)))
            wpd = jnp.pad(w, ((0, 0), (0, 0), (0, pad), (0, 0)))
            gp = gp.reshape(B, H, nc, chunk, K).transpose(2, 0, 1, 3, 4)
            wpd = wpd.reshape(B, H, nc, chunk, K).transpose(2, 0, 1, 3, 4)

            def body(args):
                gi, ww = args
                gg = table[gi.reshape(-1)].reshape(*gi.shape, D)
                return jnp.einsum("bhqk,bhqkd->bhqd", ww, gg,
                                  preferred_element_type=jnp.float32)

            out = jax.lax.map(body, (gp, wpd))
            return out.transpose(1, 2, 0, 3, 4).reshape(B, H, nc * chunk, D)

        report(f"A_flat_{tag}", form_a, values, idx, w)

        # C: sorted flat gather (indices_are_sorted fast path probe).
        @jax.jit
        def form_c(values, idx, w):
            table = values.reshape(B * H * N, D)
            row = (jnp.arange(B)[:, None, None, None] * H
                   + jnp.arange(H)[None, :, None, None]) * N
            flat = (idx + row).reshape(-1)
            order = jnp.argsort(flat)
            g = jnp.take(table, flat[order], axis=0,
                         indices_are_sorted=True)
            g = g[jnp.argsort(order)].reshape(*idx.shape, D)
            return jnp.einsum("bhqk,bhqkd->bhqd", w, g,
                              preferred_element_type=jnp.float32)

        report(f"C_sorted_{tag}", form_c, values, idx, w)

        # B: per-level 2x2xD patch gather (counts corners once).
        # Indices here are per-SAMPLE (q, h, level, point) patch origins.
        sp = q  # samples share the q axis; P points per level
        origins = {
            li: jnp.asarray(np.stack([
                rng.integers(0, hl - 1, size=(B * H, sp * P)),
                rng.integers(0, wl - 1, size=(B * H, sp * P)),
            ], -1).astype(np.int32))
            for li, (hl, wl) in enumerate(LEVEL_SHAPES)
        }
        vlv = {
            li: jnp.asarray(
                rng.normal(
                    size=(B * H, hl, wl, D)
                ).astype(np.float32), jnp.bfloat16)
            for li, (hl, wl) in enumerate(LEVEL_SHAPES)
        }
        wp = jnp.asarray(
            rng.random((B * H, sp * P, L, 4)).astype(np.float32))

        @jax.jit
        def form_b(vlv, origins, wp):
            outs = []
            for li in range(L):
                dn = jax.lax.GatherDimensionNumbers(
                    offset_dims=(2, 3, 4),
                    collapsed_slice_dims=(0,),
                    start_index_map=(0, 1, 2),
                    operand_batching_dims=(),
                    start_indices_batching_dims=(),
                )
                bidx = jnp.arange(B * H, dtype=jnp.int32)[:, None, None]
                starts = jnp.concatenate([
                    jnp.broadcast_to(bidx, (B * H, sp * P, 1)),
                    origins[li],
                ], axis=-1)
                g = jax.lax.gather(
                    vlv[li], starts, dn, (1, 2, 2, D),
                    mode=jax.lax.GatherScatterMode.CLIP,
                )                                   # [BH, SP, 2, 2, D]
                outs.append(jnp.einsum(
                    "scp,scpd->scd",
                    wp[:, :, li],
                    g.reshape(B * H, sp * P, 4, D),
                    preferred_element_type=jnp.float32,
                ))
            return sum(outs)

        report(f"B_patch_{tag}", form_b, vlv, origins, wp)

        # F: head-SHARED indices — rows are [H*D]=256-wide (512 B bf16)
        # instead of 64 B, 8x fewer indices. Quantifies how much gather
        # throughput is row-width-bound; if F >> A/8, a config-gated
        # "shared sampling locations across heads" model variant becomes
        # the principled fix.
        idx_shared = jnp.asarray(
            rng.integers(0, N, size=(B, q, K)).astype(np.int32))

        @jax.jit
        def form_f(values, idx_shared, w):
            table = values.transpose(0, 2, 1, 3).reshape(B * N, H * D)
            row = jnp.arange(B, dtype=jnp.int32)[:, None, None] * N
            gidx = idx_shared + row                   # [B, q, K]
            chunk = 2048
            if q <= chunk:
                g = table[gidx.reshape(-1)].reshape(B, q, K, H, D)
                return jnp.einsum("bhqk,bqkhd->bhqd", w, g,
                                  preferred_element_type=jnp.float32)
            nc = -(-q // chunk)
            pad = nc * chunk - q
            gp = jnp.pad(gidx, ((0, 0), (0, pad), (0, 0)))
            wpd = jnp.pad(w, ((0, 0), (0, 0), (0, pad), (0, 0)))
            gp = gp.reshape(B, nc, chunk, K).transpose(1, 0, 2, 3)
            wpd = wpd.reshape(B, H, nc, chunk, K).transpose(2, 0, 1, 3, 4)

            def body(args):
                gi, ww = args
                gg = table[gi.reshape(-1)].reshape(B, chunk, K, H, D)
                return jnp.einsum("bhqk,bqkhd->bhqd", ww, gg,
                                  preferred_element_type=jnp.float32)

            out = jax.lax.map(body, (gp, wpd))
            return out.transpose(1, 2, 0, 3, 4).reshape(B, H, nc * chunk, D)

        report(f"F_headshared_{tag}", form_f, values, idx_shared, w)

        # G: BOTH levers at once — head-shared locations AND 2x2 corner
        # patches. Index count drops 32x vs A (B*q*L*P patch origins,
        # shared across heads and corners) and each gather fetches a
        # contiguous 2x2x(H*D) = 2 KB slice (vs A's 64 B rows, half a
        # lane). If per-index overhead dominates (the 16 ns/row
        # hypothesis), G should land near A/32; if the chip's gather is
        # bandwidth-bound for wide rows, G bounds the best achievable
        # without changing total bytes (~7.5 GB/layer either way).
        vg = {
            li: jnp.asarray(
                rng.normal(
                    size=(B, hl, wl, H * D)
                ).astype(np.float32), jnp.bfloat16)
            for li, (hl, wl) in enumerate(LEVEL_SHAPES)
        }
        og = {
            li: jnp.asarray(np.stack([
                rng.integers(0, hl - 1, size=(B, sp * P)),
                rng.integers(0, wl - 1, size=(B, sp * P)),
            ], -1).astype(np.int32))
            for li, (hl, wl) in enumerate(LEVEL_SHAPES)
        }
        wg = jnp.asarray(
            rng.random((B, H, sp * P, L, 4)).astype(np.float32))

        @jax.jit
        def form_g(vg, og, wg):
            outs = []
            for li in range(L):
                dn = jax.lax.GatherDimensionNumbers(
                    offset_dims=(2, 3, 4),
                    collapsed_slice_dims=(0,),
                    start_index_map=(0, 1, 2),
                )
                bidx = jnp.arange(B, dtype=jnp.int32)[:, None, None]
                starts = jnp.concatenate([
                    jnp.broadcast_to(bidx, (B, sp * P, 1)),
                    og[li],
                ], axis=-1)
                g = jax.lax.gather(
                    vg[li], starts, dn, (1, 2, 2, H * D),
                    mode=jax.lax.GatherScatterMode.CLIP,
                )                                  # [B, SP, 2, 2, H*D]
                outs.append(jnp.einsum(
                    "bhsc,bschd->bhsd",
                    wg[:, :, :, li],
                    g.reshape(B, sp * P, 4, H, D),
                    preferred_element_type=jnp.float32,
                ))
            return sum(outs)

        report(f"G_shared_patch_{tag}", form_g, vg, og, wg)

    # D: one-hot einsum at DECODER scale only (reference point).
    q = 256
    values = jnp.asarray(
        rng.normal(size=(B, H, N, D)).astype(np.float32), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, N, size=(B, H, q, K)).astype(np.int32))
    w = jnp.asarray(rng.random((B, H, q, K)).astype(np.float32))

    @jax.jit
    def form_d(values, idx, w):
        oh = jax.nn.one_hot(idx, N, dtype=jnp.bfloat16)   # [B,H,q,K,N]
        g = jnp.einsum("bhqkn,bhnd->bhqkd", oh, values,
                       preferred_element_type=jnp.float32)
        return jnp.einsum("bhqk,bhqkd->bhqd", w, g,
                          preferred_element_type=jnp.float32)

    report("D_onehot_decoder", form_d, values, idx, w)


if __name__ == "__main__":
    main()
