"""Pallas TPU kernel: windowed FPN RoI Align — per-RoI tile DMA + fused
contraction (SURVEY.md C12; VERDICT r1 item 4's pool-once-per-RoI).

Why a kernel: the XLA formulations of FPN pooling are each stuck on a
different bottleneck (all measured on v5e, b=32 x 300 RoIs, COCO canvases):

  * all-level masked-sum einsum: MXU-bound at R * sum(H_l * W_l) * s * C
    FLOPs — ~3/4 produce masked-out zeros (~41 ms/batch, the dominant
    coco_r101_fpn cost).
  * XLA windowed gather (ops.roi_align_window): the per-RoI
    ``dynamic_slice`` lowers to a gather that is SEGMENT-COUNT-bound
    (~0.25 us per row segment, 9600 x 48 segments ≈ 110 ms — slicing 9x
    less data only halved it).

The DMA engine has neither problem: a [window, window, C] tile is ONE
strided descriptor (window contiguous ~25 KB row segments), so this kernel
grid-loops over RoIs, double-buffers tile DMAs HBM->VMEM at dynamic
per-RoI origins (scalar-prefetched), and contracts each tile against its
RoI's separable bilinear weights ON-CHIP — the [N, window, window, C] tile
tensor never exists in HBM.

v2 (no-pack): v1 DMA'd from a packed pyramid whose construction re-copied
every feature byte per image (~3.9 of ~4.9 ms/img measured — more than the
kernel itself). Now each LEVEL map is its own HBM operand; the per-RoI
tile copy is issued against the RoI's own level's ref, branched on the
scalar-prefetched level id (the copies are identical in size, only the
source memref differs). The only host-side data movement left is a tiny
static pad of levels that need one (P4 width to a multiple of 8, P5 up to
``window`` per side: ~5 MB/img vs ~150) — see
``ops.roi_align.window_pool_setup_nopack`` for the per-level in-bounds
proof.

Contraction shape: the separable weights are combined into one
[s*s, window*window] matrix per RoI (built in-VMEM from two small
constant-expansion matmuls — see ``_expansion_constants``), so each RoI is
a single MXU matmul against the tile viewed as [window*window, C]; that
view only merges LEADING dims, which is layout-free in Mosaic (a trailing
merge like [win, win*C] would relayout).

v3 (in-kernel weights): v1/v2 precomputed the separable weight rows in XLA
([N, s, window] per axis, built through [N, s*r, window] intermediates) —
~6 ms/batch of pooler setup in the b=32 COCO roofline, all of it VPU-scale
work buried in HBM round-trips and XLA fusion overhead. Now XLA ships only
the per-RoI sample-line SCALARS ([N, 6] f32: start/scale/size per axis,
from ``ops.roi_align.window_pool_params_nopack`` — the SAME
``_window_axis_params`` origin math as the XLA windowed path, so the
in-bounds proof and the masked-sum equivalence tests carry over) and the
kernel rebuilds each RoI's [s, window] rows on the VPU while the tile DMA
is in flight: bilinear hat weights from a 2-D iota against the prefetched
origin, the r sub-samples unrolled and averaged exactly like the dense
builder (same op order, float tolerance is ulp-level).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpudet.ops.roi_align import window_pool_params_nopack_batched


def _expansion_constants(window: int, dtype):
    """(E [window, window^2], T [window, window^2]) one-hot expansions:
    (wy @ E)[a, h*window + w] = wy[a, h]   (each element repeated `window`x)
    (wx @ T)[b, h*window + w] = wx[b, w]   (the row tiled `window`x)
    Lets the kernel build per-RoI combined weights with two tiny matmuls
    instead of lane-level repeat/tile reshapes Mosaic would relayout."""
    e = np.zeros((window, window * window), np.float32)
    t = np.zeros((window, window * window), np.float32)
    for h in range(window):
        e[h, h * window : (h + 1) * window] = 1.0
        t[:, h * window : (h + 1) * window] = np.eye(window, dtype=np.float32)
    return jnp.asarray(e, dtype), jnp.asarray(t, dtype)


def _axis_weights(params_ref, j, col, origin, s, r, window, dtype):
    """One RoI's [s, window] folded bin-weight rows, built on the VPU from
    the three sample-line scalars at ``params_ref[col:col+3, j]`` — the
    exact op-order of ``ops.roi_align._window_axis_weights``'s dense build
    (sample position -> validity -> clip -> hat weight -> mean over r), so
    the two builders agree to ulps."""
    start = params_ref[col, j]
    scale = params_ref[col + 1, j]
    size = params_ref[col + 2, j]
    # int32 iota + cast: Mosaic's tpu.iota verifier rejects float results
    # (caught on the real chip; interpret mode never verifies Mosaic ops).
    bins = jax.lax.broadcasted_iota(jnp.int32, (s, window), 0).astype(
        jnp.float32
    )
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (s, window), 1) + origin
    ).astype(jnp.float32)
    acc = jnp.zeros((s, window), jnp.float32)
    for rr in range(r):
        grid = bins + (rr + 0.5) / r
        pos = start + grid * scale
        valid = (pos >= -1.0) & (pos <= size)
        posc = jnp.clip(pos, 0.0, size - 1.0)
        w = jnp.maximum(1.0 - jnp.abs(posc - idx), 0.0)
        acc = acc + jnp.where(valid, w, 0.0)
    return (acc / r).astype(dtype)


def _kernel(
    n_steps: int,
    k_per_step: int,
    n_levels: int,
    s: int,
    r: int,
    window: int,
    c: int,
    *refs,
):
    (origins_ref,   # SMEM [4, N_pad] int32 (oy, ox, level, image) — prefetch
     params_ref,    # SMEM [6, N_pad] f32 (start, scale, size) per axis
     e_ref,         # VMEM [window, window*window] constant
     t_ref,         # VMEM [window, window*window] constant
     *rest) = refs
    level_refs = rest[:n_levels]   # ANY (HBM) [B, H_pad_l, W_pad_l, C] each
    (out_ref,      # VMEM block [K, s*s, C]
     tiles,        # scratch VMEM [2, K, window, window, C]
     left,         # scratch VMEM [s*s, window*window]
     sems,         # DMA semaphores [2, K]
     ) = rest[n_levels:]

    i = pl.program_id(0)
    kk = k_per_step

    def tile_copy(fref, slot, j):
        # x origins are 8-aligned by window_pool_setup_nopack; Mosaic needs
        # the divisibility asserted to slice the (8, 128)-tiled HBM memref.
        ox = pl.multiple_of(origins_ref[1, j], 8)
        return pltpu.make_async_copy(
            fref.at[
                origins_ref[3, j],
                pl.ds(origins_ref[0, j], window),
                pl.ds(ox, window),
                :,
            ],
            tiles.at[slot, j % kk],
            sems.at[slot, j % kk],
        )

    def tile_start(slot, step, k):
        j = step * kk + k
        lvl = origins_ref[2, j]
        for l, fref in enumerate(level_refs):
            @pl.when(lvl == l)
            def _():
                tile_copy(fref, slot, j).start()

    def tile_wait(slot, step, k):
        # Every level's copy moves the same window*window*C bytes through
        # the same semaphore, so the wait can be built against any source.
        j = step * kk + k
        tile_copy(level_refs[0], slot, j).wait()

    def run(slot):
        # Prefetch next step's tiles into the other buffer, then drain and
        # contract this step's.
        @pl.when(i + 1 < n_steps)
        def _():
            for k in range(kk):
                tile_start(1 - slot, i + 1, k)

        for k in range(kk):
            j = i * kk + k
            tile_wait(slot, i, k)
            # Rebuild this RoI's separable weight rows on the VPU (the DMA
            # engine is moving the NEXT step's tiles meanwhile) — [s, window]
            # per axis from six SMEM scalars instead of two HBM operands.
            wy = _axis_weights(
                params_ref, j, 0, origins_ref[0, j], s, r, window,
                out_ref.dtype,
            )
            wx = _axis_weights(
                params_ref, j, 3, origins_ref[1, j], s, r, window,
                out_ref.dtype,
            )
            # f32 inputs get full-precision MXU passes to match the XLA
            # paths (which use Precision.HIGHEST); bf16 stays on the fast
            # single pass.
            prec = (
                jax.lax.Precision.HIGHEST
                if out_ref.dtype == jnp.float32 else None
            )
            dot = functools.partial(
                jax.lax.dot, preferred_element_type=jnp.float32,
                precision=prec,
            )
            wy_rep = dot(wy, e_ref[...])  # [s, window^2]: wy[a, h] at h*W+w
            wx_til = dot(wx, t_ref[...])  # [s, window^2]: wx[b, w] at h*W+w
            for a in range(s):
                left[a * s : (a + 1) * s, :] = (
                    wx_til * wy_rep[a : a + 1, :]
                ).astype(left.dtype)
            tile_flat = tiles[slot, k].reshape(window * window, c)
            out = dot(left[...], tile_flat)  # [s*s, C] f32
            out_ref[k] = out.astype(out_ref.dtype)

    @pl.when(i == 0)
    def _():
        for k in range(kk):
            tile_start(0, 0, k)

    @pl.when(jax.lax.rem(i, 2) == 0)
    def _():
        run(0)

    @pl.when(jax.lax.rem(i, 2) == 1)
    def _():
        run(1)


def roi_align_window_pallas_batched(
    features,
    strides,
    boxes: jnp.ndarray,
    levels: jnp.ndarray,
    output_size: int,
    sampling_ratio: int = 2,
    aligned: bool = True,
    window: int = 48,
    rois_per_step: int = 4,
    interpret: bool = False,
    rois_per_chunk: int = 8192,
) -> jnp.ndarray:
    """Batched windowed pooler: features ``[B, H_l, W_l, C]`` per level,
    boxes ``[B, N, 4]``, levels ``[B, N]`` (0-based, from
    ``fpn_assign_levels(..., fit_window=window)``) → ``[B, N, s, s, C]``.

    ONE ``pallas_call`` whose grid covers all ``B*N`` RoIs — the image
    index rides the scalar-prefetched origins as a 4th column and selects
    the leading dim of each level's HBM ref. A ``jax.vmap`` over the
    single-image kernel instead lowers to a per-image ``while`` loop
    (scalar-prefetch operands can't be batched into the grid), costing
    ~2.2 ms/step of loop scaffolding plus a double-buffer pipeline drain
    at every image boundary (b=32 COCO trace, KERNELS.md round-3 entry).

    SMEM layout: the per-RoI scalars ride SMEM TRANSPOSED — origins
    ``[4, N]`` int32, params ``[6, N]`` f32 — because SMEM pads the MINOR
    dim to 128 lanes: a ``[N, 4]`` layout costs 512 B/RoI and blew the
    1 MB SMEM at N=4800 on the chip (mask-head pooling, b=16 x 300 dets:
    2.4 MB requested — q8a/q8b in the round-3 measurement log); ``[4, N]``
    costs ~40 B/RoI total. The grid is additionally CHUNKED over RoIs so
    the largest producers (b=32 x 1000 proposals = 32k RoIs, ~1.25 MB of
    scalars) stay under budget: each chunk is its own ``pallas_call`` over
    ``rois_per_chunk`` RoIs (~320 KB of SMEM), the double-buffer drain at
    the seam amortized over thousands of RoIs."""
    s = output_size
    c = features[0].shape[-1]
    dtype = features[0].dtype
    b, n_img = boxes.shape[:2]
    n = b * n_img

    padded, params, oy, ox = window_pool_params_nopack_batched(
        features, strides, boxes, levels, output_size, sampling_ratio,
        aligned, window,
    )
    img = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n_img)
    flat_levels = levels.reshape(n)
    kk = min(rois_per_step, n)
    pad = (-n) % kk
    if pad:
        params = jnp.concatenate(
            [params, jnp.zeros((pad, params.shape[1]), params.dtype)]
        )
        oy = jnp.concatenate([oy, jnp.zeros((pad,), oy.dtype)])
        ox = jnp.concatenate([ox, jnp.zeros((pad,), ox.dtype)])
        flat_levels = jnp.concatenate(
            [flat_levels, jnp.zeros((pad,), flat_levels.dtype)]
        )
        img = jnp.concatenate([img, jnp.zeros((pad,), img.dtype)])
    n_pad = n + pad

    e_const, t_const = _expansion_constants(window, dtype)
    origins = jnp.stack(
        [oy, ox, flat_levels.astype(jnp.int32), img], axis=0
    )  # [4, N_pad] int32
    params_t = params.T  # [6, N_pad] f32

    rois_per_chunk = max(kk, rois_per_chunk - rois_per_chunk % kk)

    def one_chunk(origins_c, params_c, n_chunk):
        n_steps = n_chunk // kk
        kernel = functools.partial(
            _kernel, n_steps, kk, len(padded), s, sampling_ratio, window, c
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # params [6, n] f32
                pl.BlockSpec(memory_space=pltpu.VMEM),  # E
                pl.BlockSpec(memory_space=pltpu.VMEM),  # T
            ] + [
                pl.BlockSpec(memory_space=pl.ANY)       # per-level maps (HBM)
                for _ in padded
            ],
            out_specs=pl.BlockSpec(
                (kk, s * s, c), lambda i, og: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, kk, window, window, c), dtype),
                pltpu.VMEM((s * s, window * window), dtype),
                pltpu.SemaphoreType.DMA((2, kk)),
            ],
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_chunk, s * s, c), dtype),
            grid_spec=grid_spec,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
        )(origins_c, params_c, e_const, t_const, *padded)

    outs = [
        one_chunk(
            origins[:, lo : min(lo + rois_per_chunk, n_pad)],
            params_t[:, lo : min(lo + rois_per_chunk, n_pad)],
            min(lo + rois_per_chunk, n_pad) - lo,
        )
        for lo in range(0, n_pad, rois_per_chunk)
    ]
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
    return out[:n].reshape(b, n_img, s, s, c)


def roi_align_window_pallas(
    features,
    strides,
    boxes: jnp.ndarray,
    levels: jnp.ndarray,
    output_size: int,
    sampling_ratio: int = 2,
    aligned: bool = True,
    window: int = 48,
    rois_per_step: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for ``ops.roi_align.roi_align_window`` (same contract:
    ``levels`` from ``fpn_assign_levels(..., fit_window=window)``, 0-based).
    Returns [N, s, s, C] in the feature dtype. Single-image view of
    :func:`roi_align_window_pallas_batched` (B=1)."""
    out = roi_align_window_pallas_batched(
        [f[None] for f in features], strides, boxes[None], levels[None],
        output_size, sampling_ratio, aligned, window, rois_per_step,
        interpret,
    )
    return out[0]
