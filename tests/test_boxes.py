import numpy as np
import jax.numpy as jnp

from tpudet.ops import boxes as B
from tests import oracles


def random_boxes(rng, n, size=100.0):
    xy1 = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(1, size / 2, (n, 2))
    return np.concatenate([xy1, xy1 + wh], axis=-1).astype(np.float32)


def test_iou_matches_oracle(rng):
    b1 = random_boxes(rng, 17)
    b2 = random_boxes(rng, 23)
    got = np.asarray(B.pairwise_iou(jnp.asarray(b1), jnp.asarray(b2)))
    want = oracles.np_iou(b1, b2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_iou_identity_and_disjoint():
    b = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [20.0, 20.0, 30.0, 30.0]])
    iou = np.asarray(B.pairwise_iou(b, b))
    np.testing.assert_allclose(iou, np.eye(2), atol=1e-6)


def test_iou_degenerate_box_is_zero():
    a = jnp.asarray([[5.0, 5.0, 5.0, 5.0]])  # zero area
    b = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    assert float(B.pairwise_iou(a, b)[0, 0]) == 0.0


def test_encode_decode_roundtrip(rng):
    anchors = random_boxes(rng, 50)
    gt = random_boxes(rng, 50)
    for w in [(1.0, 1.0, 1.0, 1.0), (10.0, 10.0, 5.0, 5.0)]:
        deltas = B.encode_boxes(jnp.asarray(gt), jnp.asarray(anchors), w)
        back = B.decode_boxes(deltas, jnp.asarray(anchors), w)
        np.testing.assert_allclose(np.asarray(back), gt, rtol=1e-4, atol=1e-3)


def test_encode_matches_oracle(rng):
    anchors = random_boxes(rng, 30)
    gt = random_boxes(rng, 30)
    got = np.asarray(B.encode_boxes(jnp.asarray(gt), jnp.asarray(anchors)))
    want = oracles.np_encode(gt, anchors)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_decode_matches_oracle(rng):
    anchors = random_boxes(rng, 30)
    deltas = rng.normal(0, 0.5, (30, 4)).astype(np.float32)
    got = np.asarray(B.decode_boxes(jnp.asarray(deltas), jnp.asarray(anchors)))
    want = oracles.np_decode(deltas, anchors)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_decode_clamps_huge_deltas():
    anchors = jnp.asarray([[0.0, 0.0, 16.0, 16.0]])
    deltas = jnp.asarray([[0.0, 0.0, 50.0, 50.0]])  # exp(50) would overflow
    out = np.asarray(B.decode_boxes(deltas, anchors))
    assert np.all(np.isfinite(out))
    assert (out[0, 2] - out[0, 0]) <= 16.0 * 1000.0 / 16.0 + 1e-3


def test_clip_boxes():
    b = jnp.asarray([[-5.0, -5.0, 50.0, 200.0]])
    out = np.asarray(B.clip_boxes(b, (100, 80)))
    np.testing.assert_allclose(out, [[0.0, 0.0, 50.0, 100.0]])


def test_flip_boxes_involution(rng):
    b = random_boxes(rng, 10, size=50.0)
    flipped = B.flip_boxes_horizontal(jnp.asarray(b), 64.0)
    back = B.flip_boxes_horizontal(flipped, 64.0)
    np.testing.assert_allclose(np.asarray(back), b, rtol=1e-6)
    f = np.asarray(flipped)
    assert np.all(f[:, 2] >= f[:, 0])  # still well-formed


def test_decode_commutes_with_gather(rng):
    """decode(deltas)[idx] must equal decode(deltas[idx]) bitwise — the
    proposal path switches between the two orders by anchor count (decode-
    all-then-gather at VOC scale, gather-then-decode at FPN scale)."""
    import jax.numpy as jnp

    from tpudet.ops.boxes import decode_boxes

    n, k = 500, 64
    anchors = rng.uniform(0, 500, (n, 4)).astype(np.float32)
    anchors[:, 2:] = anchors[:, :2] + rng.uniform(8, 100, (n, 2))
    deltas = rng.normal(0, 0.4, (n, 4)).astype(np.float32)
    idx = rng.choice(n, k, replace=False)
    w = (10.0, 10.0, 5.0, 5.0)
    a = decode_boxes(jnp.asarray(deltas), jnp.asarray(anchors), w)[idx]
    b = decode_boxes(jnp.asarray(deltas[idx]), jnp.asarray(anchors[idx]), w)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
