import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpudet.ops import roi_align as R
from tests import oracles


def make_features(rng, h=16, w=16, c=3):
    return rng.normal(0, 1, (h, w, c)).astype(np.float32)


def make_rois(rng, n, h, w):
    xy1 = rng.uniform(0, w * 0.6, (n, 2))
    wh = rng.uniform(2.0, w * 0.4, (n, 2))
    return np.concatenate([xy1, xy1 + wh], axis=-1).astype(np.float32)


def test_roi_align_matches_oracle(rng):
    feat = make_features(rng)
    rois = make_rois(rng, 8, 16, 16)
    got = np.asarray(R.roi_align(jnp.asarray(feat), jnp.asarray(rois), 7, 2))
    want = oracles.np_roi_align(feat, rois, 7, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_roi_align_constant_map(rng):
    # Constant feature map -> constant output wherever samples are in-bounds.
    feat = np.full((16, 16, 2), 3.5, dtype=np.float32)
    rois = np.asarray([[2.0, 2.0, 10.0, 10.0]], dtype=np.float32)
    out = np.asarray(R.roi_align(jnp.asarray(feat), jnp.asarray(rois), 7, 2))
    np.testing.assert_allclose(out, 3.5, rtol=1e-5)


def test_crop_and_resize_tf_parity(rng):
    """Bit-level convention parity with tf.image.crop_and_resize
    (SURVEY.md §4.2 and 'hard parts': this defines the oracle)."""
    tf = pytest.importorskip("tensorflow")
    h = w = 16
    feat = make_features(rng, h, w, c=4)
    rois = make_rois(rng, 6, h, w)
    # Some boxes partially outside to exercise extrapolation.
    rois[0] = [-4.0, -4.0, 8.0, 8.0]
    rois[1] = [10.0, 10.0, 25.0, 25.0]

    got = np.asarray(
        R.crop_and_resize(jnp.asarray(feat), jnp.asarray(rois), 7)
    )
    # TF: normalized [y1, x1, y2, x2] against (dim - 1).
    tf_boxes = np.stack(
        [
            rois[:, 1] / (h - 1),
            rois[:, 0] / (w - 1),
            rois[:, 3] / (h - 1),
            rois[:, 2] / (w - 1),
        ],
        axis=-1,
    )
    want = tf.image.crop_and_resize(
        feat[None], tf_boxes, np.zeros(len(rois), np.int32), [7, 7]
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_crop_and_resize_identity(rng):
    # Cropping the full map at native size reproduces it exactly.
    feat = make_features(rng, 8, 8, 2)
    rois = np.asarray([[0.0, 0.0, 7.0, 7.0]], dtype=np.float32)
    out = np.asarray(R.crop_and_resize(jnp.asarray(feat), jnp.asarray(rois), 8))
    np.testing.assert_allclose(out[0], feat, rtol=1e-5, atol=1e-5)


def test_multi_level_packed_matches_per_level(rng):
    """Packed-pyramid FPN pooling == per-level roi_align_mxu masked-sum."""
    c = 8
    feats = [
        jnp.asarray(rng.normal(0, 1, (hw, hw + 8, c)).astype(np.float32))
        for hw in (32, 16, 8, 4)
    ]
    strides = (4.0, 8.0, 16.0, 32.0)
    n = 24
    # Boxes in image coords spanning all levels' size regimes.
    sides = rng.uniform(8, 120, (n, 2))
    xy1 = rng.uniform(0, 16, (n, 2))
    rois = np.concatenate([xy1, xy1 + sides], axis=-1).astype(np.float32)
    levels = rng.integers(0, 4, n).astype(np.int32)

    got = R.multi_level_roi_align_mxu(
        feats, strides, jnp.asarray(rois), jnp.asarray(levels), 7, 2
    )
    want = 0.0
    for lvl, (feat, stride) in enumerate(zip(feats, strides)):
        p = R.roi_align_mxu(feat, jnp.asarray(rois) / stride, 7, 2)
        want = want + p * (levels == lvl)[:, None, None, None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_multi_level_packed_single_level_exact(rng):
    """With one level the packed path IS roi_align_mxu."""
    feat = jnp.asarray(rng.normal(0, 1, (16, 24, 4)).astype(np.float32))
    rois = make_rois(rng, 6, 16, 24) * 4.0
    got = R.multi_level_roi_align_mxu(
        [feat], (4.0,), jnp.asarray(rois), jnp.zeros(6, jnp.int32), 7, 2
    )
    want = R.roi_align_mxu(feat, jnp.asarray(rois) / 4.0, 7, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_roi_align_mxu_unaligned_matches_gather(rng):
    """aligned=False must apply the same legacy min-extent clamp (1.0) in
    both backends, including for sub-pixel boxes."""
    from tpudet.ops.roi_align import roi_align, roi_align_mxu

    fmap = jnp.asarray(rng.normal(size=(16, 16, 8)).astype(np.float32))
    boxes = jnp.asarray(np.array([
        [2.0, 3.0, 10.0, 12.0],
        [5.0, 5.0, 5.3, 5.2],   # sub-pixel extents hit the clamp
        [0.0, 0.0, 15.0, 15.0],
    ], np.float32))
    a = roi_align(fmap, boxes, 7, sampling_ratio=2, aligned=False)
    b = roi_align_mxu(fmap, boxes, 7, sampling_ratio=2, aligned=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def _pyramid(rng, c=8):
    """(52, 84)-cell p2 downsampled pyramid (non-square, odd enough to
    exercise padding/clamps), strides 4..32."""
    feats = [
        jnp.asarray(rng.normal(0, 1, (hw[0], hw[1], c)).astype(np.float32))
        for hw in ((52, 84), (26, 42), (13, 21), (7, 11))
    ]
    return feats, (4.0, 8.0, 16.0, 32.0)


def _masked_sum_reference(feats, strides, rois, levels, s, ratio):
    """The all-level masked-sum formulation (the model's 'roi_align' path)
    with an EXPLICIT assignment, as the exactness oracle."""
    pooled = 0.0
    for li, (feat, stride) in enumerate(zip(feats, strides)):
        p = R.roi_align_mxu(feat, jnp.asarray(rois) / stride, s, ratio)
        pooled = pooled + p * (levels == li)[:, None, None, None]
    return np.asarray(pooled)


def test_roi_align_window_matches_masked_sum(rng):
    """Pool-once-per-RoI windowed pooling == all-level masked-sum under the
    same (fit-bumped) level assignment, to float tolerance (VERDICT r1
    item 4) — including border boxes, tiny boxes, huge boxes clamped to p5,
    and extreme-aspect slivers."""
    from tpudet.ops.roi_align import fpn_assign_levels, roi_align_window

    feats, strides = _pyramid(rng)
    n = 40
    xy1 = rng.uniform(0, 200, (n, 2)).astype(np.float32)
    wh = rng.uniform(8, 250, (n, 2)).astype(np.float32)
    rois = np.concatenate([xy1, np.minimum(xy1 + wh, 330.0)], -1)
    # Hand-planted hard cases: border sliver, tall sliver, tiny, canvas-size.
    rois[0] = [0.0, 0.0, 3.0, 200.0]
    rois[1] = [100.0, 2.0, 300.0, 6.0]
    rois[2] = [50.0, 50.0, 52.5, 52.5]
    rois[3] = [0.0, 0.0, 208.0, 330.0]
    rois = rois.astype(np.float32)

    window = 24  # small enough to force fit-bumping on the slivers
    levels = fpn_assign_levels(jnp.asarray(rois), fit_window=window) - 2
    got = np.asarray(roi_align_window(
        feats, strides, jnp.asarray(rois), levels, 7, 2, window=window
    ))
    want = _masked_sum_reference(
        feats, strides, rois, np.asarray(levels), 7, 2
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_roi_align_window_pallas_interpret_matches_xla(rng):
    """The Pallas windowed kernel (interpret mode; no-pack v2 with
    per-level refs and level-branched tile DMA) == the XLA windowed path
    to float tolerance on the same hard-case RoIs."""
    from tpudet.kernels.roi_align_window import roi_align_window_pallas
    from tpudet.ops.roi_align import fpn_assign_levels, roi_align_window

    feats, strides = _pyramid(rng)
    n = 13  # deliberately not a multiple of rois_per_step
    xy1 = rng.uniform(0, 200, (n, 2)).astype(np.float32)
    wh = rng.uniform(8, 250, (n, 2)).astype(np.float32)
    rois = np.concatenate([xy1, np.minimum(xy1 + wh, 330.0)], -1)
    rois[0] = [0.0, 0.0, 3.0, 200.0]     # border sliver
    rois[1] = [100.0, 2.0, 300.0, 6.0]   # tall sliver
    rois[2] = [50.0, 50.0, 52.5, 52.5]   # tiny
    rois[3] = [0.0, 0.0, 208.0, 330.0]   # canvas-sized -> p5
    rois = jnp.asarray(rois.astype(np.float32))

    window = 24
    levels = fpn_assign_levels(rois, fit_window=window) - 2
    want = np.asarray(roi_align_window(
        feats, strides, rois, levels, 7, 2, window=window
    ))
    got = np.asarray(roi_align_window_pallas(
        feats, strides, rois, levels, 7, 2, window=window, interpret=True
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_roi_align_window_pallas_batched_matches_per_image(rng):
    """The batched windowed kernel (one grid over all B*N RoIs, image index
    riding the scalar-prefetched origins) == the per-image XLA windowed
    path on every image — images carry DIFFERENT features and RoIs, so a
    wrong image index or a cross-image tile DMA shows up immediately.
    B*N deliberately not a multiple of rois_per_step."""
    from tpudet.kernels.roi_align_window import (
        roi_align_window_pallas_batched,
    )
    from tpudet.ops.roi_align import fpn_assign_levels, roi_align_window

    b, n = 3, 5  # B*N = 15, not a multiple of kk=4
    all_feats, all_rois = [], []
    for _ in range(b):
        feats, strides = _pyramid(rng)
        xy1 = rng.uniform(0, 200, (n, 2)).astype(np.float32)
        wh = rng.uniform(8, 250, (n, 2)).astype(np.float32)
        rois = np.concatenate([xy1, np.minimum(xy1 + wh, 330.0)], -1)
        all_feats.append(feats)
        all_rois.append(rois.astype(np.float32))
    # Hard cases on image 1 so they sit mid-batch in the flat grid.
    all_rois[1][0] = [0.0, 0.0, 3.0, 200.0]
    all_rois[1][1] = [0.0, 0.0, 208.0, 330.0]

    window = 24
    feats_b = [
        jnp.stack([f[l] for f in all_feats]) for l in range(len(all_feats[0]))
    ]
    rois_b = jnp.asarray(np.stack(all_rois))
    levels_b = jax.vmap(
        lambda r: fpn_assign_levels(r, fit_window=window) - 2
    )(rois_b)
    got = np.asarray(roi_align_window_pallas_batched(
        feats_b, strides, rois_b, levels_b, 7, 2, window=window,
        interpret=True,
    ))
    assert got.shape == (b, n, 7, 7, all_feats[0][0].shape[-1])
    for i in range(b):
        want = np.asarray(roi_align_window(
            all_feats[i], strides, rois_b[i], levels_b[i], 7, 2,
            window=window,
        ))
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-4)

    # RoI chunking (the SMEM budget for the [4/6, N] scalar operands caps
    # each pallas_call at rois_per_chunk RoIs): forcing 3 chunks of <=8
    # over the same 15 RoIs must be bit-identical to the single-call path.
    chunked = np.asarray(roi_align_window_pallas_batched(
        feats_b, strides, rois_b, levels_b, 7, 2, window=window,
        interpret=True, rois_per_chunk=8,
    ))
    np.testing.assert_array_equal(chunked, got)


@pytest.mark.parametrize("window", [24, 32, 56])
def test_roi_align_window_fuzz(rng, window):
    """Windowed pooling == masked-sum oracle across window sizes on random
    boxes including degenerate (zero-area) and out-of-order-free edge
    cases; levels fit-bumped for the given window."""
    from tpudet.ops.roi_align import fpn_assign_levels, roi_align_window

    feats, strides = _pyramid(rng)
    n = 32
    xy1 = rng.uniform(0, 320, (n, 2)).astype(np.float32)
    wh = rng.uniform(0, 300, (n, 2)).astype(np.float32)
    rois = np.concatenate([xy1, np.minimum(xy1 + wh, 330.0)], -1)
    rois[0, 2:] = rois[0, :2]          # zero-area box
    rois[1] = [329.0, 329.0, 330.0, 330.0]  # bottom-right corner sliver
    rois = rois.astype(np.float32)

    levels = fpn_assign_levels(jnp.asarray(rois), fit_window=window) - 2
    got = np.asarray(roi_align_window(
        feats, strides, jnp.asarray(rois), levels, 7, 2, window=window
    ))
    want = _masked_sum_reference(
        feats, strides, rois, np.asarray(levels), 7, 2
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_roi_align_window_train_vjp(rng):
    """roi_align_window_train (Pallas forward / masked-sum-transpose
    backward custom VJP): feature grads equal the dense masked-sum
    autodiff, box grads are exactly zero, and the forward value matches
    the dense path to float tolerance."""
    from tpudet.ops.roi_align import (
        fpn_assign_levels,
        roi_align_mxu,
        roi_align_window_train,
    )

    feats, strides = _pyramid(rng)
    feats = tuple(feats)
    n = 13
    xy1 = rng.uniform(0, 200, (n, 2)).astype(np.float32)
    wh = rng.uniform(8, 250, (n, 2)).astype(np.float32)
    rois = np.concatenate([xy1, np.minimum(xy1 + wh, 330.0)], -1)
    rois[0] = [0.0, 0.0, 3.0, 200.0]     # border sliver (fit-bumped)
    rois[1] = [0.0, 0.0, 208.0, 330.0]   # canvas-sized -> p5
    rois = jnp.asarray(rois.astype(np.float32))
    window = 24
    c = feats[0].shape[-1]
    cot = jnp.asarray(
        rng.standard_normal((n, 7, 7, c)).astype(np.float32)
    )

    def dense_fn(feats_t, rois_t):
        lv = fpn_assign_levels(rois_t, fit_window=window) - 2
        pooled = 0.0
        for i, (f, st) in enumerate(zip(feats_t, strides)):
            p = roi_align_mxu(f, rois_t / st, 7, 2)
            pooled = pooled + p * (lv == i)[:, None, None, None]
        return pooled

    def loss_win(feats_t, rois_t):
        out = roi_align_window_train(
            feats_t, strides, rois_t, 7, 2, window=window, interpret=True
        )
        return jnp.sum(out * cot)

    def loss_dense(feats_t, rois_t):
        return jnp.sum(dense_fn(feats_t, rois_t) * cot)

    val_win = loss_win(feats, rois)
    val_dense = loss_dense(feats, rois)
    np.testing.assert_allclose(
        float(val_win), float(val_dense), rtol=1e-4, atol=1e-3
    )

    gw_f, gw_b = jax.grad(loss_win, argnums=(0, 1))(feats, rois)
    gd_f, _ = jax.grad(loss_dense, argnums=(0, 1))(feats, rois)
    for a, b in zip(gw_f, gd_f):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )
    # Boxes get an exactly-zero cotangent on the custom-VJP path
    # (proposals are stop_gradient'ed upstream in training).
    np.testing.assert_array_equal(np.asarray(gw_b), 0.0)


def test_roi_align_window_train_batched_vjp(rng):
    """roi_align_window_train_batched (ONE Pallas grid over B*N RoIs
    forward, batched masked-sum-transpose backward) == the per-image
    roi_align_window_train under vmap: same values, same feature grads,
    exactly-zero box grads."""
    from tpudet.ops.roi_align import (
        roi_align_window_train,
        roi_align_window_train_batched,
    )

    b, n = 2, 9
    window = 24
    all_feats, all_rois = [], []
    for _ in range(b):
        feats, strides = _pyramid(rng)
        xy1 = rng.uniform(0, 200, (n, 2)).astype(np.float32)
        wh = rng.uniform(8, 250, (n, 2)).astype(np.float32)
        rois = np.concatenate([xy1, np.minimum(xy1 + wh, 330.0)], -1)
        all_feats.append(feats)
        all_rois.append(rois.astype(np.float32))
    all_rois[1][0] = [0.0, 0.0, 3.0, 200.0]
    all_rois[1][1] = [0.0, 0.0, 208.0, 330.0]
    feats_b = tuple(
        jnp.stack([f[l] for f in all_feats]) for l in range(len(all_feats[0]))
    )
    rois_b = jnp.asarray(np.stack(all_rois))
    c = feats_b[0].shape[-1]
    cot = jnp.asarray(rng.standard_normal((b, n, 7, 7, c)).astype(np.float32))

    def loss_batched(feats_t, rois_t):
        out = roi_align_window_train_batched(
            feats_t, strides, rois_t, 7, 2, window=window, interpret=True
        )
        return jnp.sum(out * cot)

    def loss_vmapped(feats_t, rois_t):
        out = jax.vmap(
            lambda fs, rs: roi_align_window_train(
                fs, strides, rs, 7, 2, window=window, interpret=True
            )
        )(feats_t, rois_t)
        return jnp.sum(out * cot)

    np.testing.assert_allclose(
        float(loss_batched(feats_b, rois_b)),
        float(loss_vmapped(feats_b, rois_b)),
        rtol=1e-4, atol=1e-3,
    )
    gb_f, gb_b = jax.grad(loss_batched, argnums=(0, 1))(feats_b, rois_b)
    gv_f, _ = jax.grad(loss_vmapped, argnums=(0, 1))(feats_b, rois_b)
    for a, bb in zip(gb_f, gv_f):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=1e-5, atol=1e-5
        )
    np.testing.assert_array_equal(np.asarray(gb_b), 0.0)


def test_fpn_assign_levels_fit_bumping(rng):
    """fit_window bumps only boxes whose larger side overflows the tile at
    the paper-assigned level; square boxes keep the paper assignment."""
    from tpudet.ops.roi_align import fpn_assign_levels

    boxes = jnp.asarray([
        [0, 0, 100, 100],    # sqrt(area)=100 -> p2 (log2(100/224) ~ -1.16)
        [0, 0, 448, 448],    # log2(448/224)=1 -> floor(5) -> p5
        [0, 0, 4, 400],      # sliver: paper->p2; 400px must fit
        [0, 0, 1300, 800],   # huge -> p5
    ], jnp.float32)
    paper = np.asarray(fpn_assign_levels(boxes))
    np.testing.assert_array_equal(paper, [2, 5, 2, 5])
    fitted = np.asarray(fpn_assign_levels(boxes, fit_window=56))
    # span/2^k <= 44: box0 100px -> k>=2 (25 cells) unchanged; sliver
    # 400px -> k>=4 (25 cells); huge 1300px -> p5 (40.6 cells) unchanged.
    np.testing.assert_array_equal(fitted, [2, 5, 4, 5])
    # Bit-identical to paper assignment when nothing overflows.
    sq = jnp.asarray([[0, 0, 60, 80], [10, 10, 500, 400]], jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(fpn_assign_levels(sq)),
        np.asarray(fpn_assign_levels(sq, fit_window=56)),
    )


def test_fpn_assign_levels_rejects_tiny_fit_window():
    """fit_window <= 12 makes the fit divisor non-positive (log2 -> NaN,
    garbage levels); it must raise instead of silently mis-assigning."""
    import pytest
    from tpudet.ops.roi_align import fpn_assign_levels

    boxes = jnp.asarray([[0.0, 0.0, 60.0, 80.0]], jnp.float32)
    for w in (8, 12):
        with pytest.raises(ValueError, match="fit_window"):
            fpn_assign_levels(boxes, fit_window=w)


def test_roi_align_window_train_inside_scan(rng):
    """The grad-accumulation path scans the train forward/backward over
    microbatches — the windowed custom VJP must compose with lax.scan:
    scanned per-microbatch grads must sum to the independently computed
    per-microbatch grads (interpret mode stands in for Mosaic on CPU;
    the real-chip composition is covered by the tpu tier)."""
    from tpudet.ops.roi_align import roi_align_window_train

    feats, strides = _pyramid(rng)
    feats = tuple(feats)
    window = 24
    c = feats[0].shape[-1]

    def make_rois_micro(seed):
        r = np.random.default_rng(seed)
        xy1 = r.uniform(0, 200, (6, 2)).astype(np.float32)
        wh = r.uniform(8, 120, (6, 2)).astype(np.float32)
        return jnp.asarray(
            np.concatenate([xy1, np.minimum(xy1 + wh, 330.0)], -1)
        )

    micro_rois = jnp.stack([make_rois_micro(0), make_rois_micro(1)])
    cot = jnp.asarray(rng.standard_normal((6, 7, 7, c)).astype(np.float32))

    def loss(feats_t, rois_t):
        out = roi_align_window_train(
            feats_t, strides, rois_t, 7, 2, window=window, interpret=True
        )
        return jnp.sum(out * cot)

    def body(gsum, rois_t):
        g = jax.grad(loss)(feats, rois_t)
        return jax.tree.map(jnp.add, gsum, g), None

    gsum, _ = jax.lax.scan(
        body, jax.tree.map(jnp.zeros_like, feats), micro_rois
    )
    g0 = jax.grad(loss)(feats, micro_rois[0])
    g1 = jax.grad(loss)(feats, micro_rois[1])
    for a, b in zip(gsum, jax.tree.map(jnp.add, g0, g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )
    assert all(np.all(np.isfinite(np.asarray(a))) for a in gsum)
