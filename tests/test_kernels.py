"""Pallas kernel tests vs jnp oracles (SURVEY.md §4.3). On CPU the kernels
run in interpreter mode; the same code compiles on TPU (validated by the
benchmark CLI and TPU smoke scripts)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpudet.kernels.nms import nms_pallas
from tpudet.ops.nms import nms as nms_ref
from tests.test_boxes import random_boxes


def assert_same_selection(res_a, res_b):
    (ia, va), (ib, vb) = res_a, res_b
    ia, va, ib, vb = map(np.asarray, (ia, va, ib, vb))
    np.testing.assert_array_equal(va, vb)
    np.testing.assert_array_equal(ia[va], ib[vb])


@pytest.mark.parametrize("n", [60, 128, 300, 500])
@pytest.mark.parametrize("thresh", [0.3, 0.6])
def test_nms_pallas_matches_reference(rng, n, thresh):
    boxes = jnp.asarray(random_boxes(rng, n, size=80.0))
    scores = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    assert_same_selection(
        nms_pallas(boxes, scores, thresh, 50, interpret=True),
        nms_ref(boxes, scores, thresh, 50),
    )


def test_nms_pallas_valid_mask_and_score_thresh(rng):
    n = 200
    boxes = jnp.asarray(random_boxes(rng, n, size=60.0))
    scores = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    mask = jnp.asarray(rng.uniform(0, 1, n) > 0.3)
    assert_same_selection(
        nms_pallas(boxes, scores, 0.5, 40, valid_mask=mask,
                   score_threshold=0.2, interpret=True),
        nms_ref(boxes, scores, 0.5, 40, valid_mask=mask, score_threshold=0.2),
    )


def test_nms_pallas_identical_boxes():
    boxes = jnp.tile(jnp.asarray([[5.0, 5.0, 20.0, 20.0]]), (130, 1))
    scores = jnp.linspace(0.1, 0.9, 130)
    idx, valid = nms_pallas(boxes, scores, 0.5, 10, interpret=True)
    assert int(np.asarray(valid).sum()) == 1
    assert int(np.asarray(idx)[0]) == 129


def test_nms_pallas_all_masked():
    boxes = jnp.asarray(random_boxes(np.random.default_rng(0), 64))
    scores = jnp.linspace(0, 1, 64)
    idx, valid = nms_pallas(
        boxes, scores, 0.5, 10, valid_mask=jnp.zeros(64, bool), interpret=True
    )
    assert not np.asarray(valid).any()


def test_nms_pallas_vmap(rng):
    b, n = 3, 140
    boxes = jnp.asarray(
        np.stack([random_boxes(rng, n, size=70.0) for _ in range(b)])
    )
    scores = jnp.asarray(rng.uniform(0, 1, (b, n)).astype(np.float32))
    fp = jax.vmap(lambda bb, ss: nms_pallas(bb, ss, 0.5, 30, interpret=True))
    fr = jax.vmap(lambda bb, ss: nms_ref(bb, ss, 0.5, 30))
    ia, va = fp(boxes, scores)
    ib, vb = fr(boxes, scores)
    for i in range(b):
        assert_same_selection((ia[i], va[i]), (ib[i], vb[i]))


def test_nms_dispatch_fallback_on_cpu(rng):
    """On CPU backends the dispatcher must take the jnp path (no TPU)."""
    from tpudet.kernels import nms_dispatch

    boxes = jnp.asarray(random_boxes(rng, 50))
    scores = jnp.asarray(rng.uniform(0, 1, 50).astype(np.float32))
    assert_same_selection(
        nms_dispatch(boxes, scores, 0.5, 20, use_pallas=True),
        nms_ref(boxes, scores, 0.5, 20),
    )


def test_nms_pallas_zero_grad(rng):
    """NMS is wrapped in a zero-gradient custom_vjp: grad through a loss
    that consumes its outputs must flow only via downstream gathers, never
    linearize the kernel (selection is piecewise-constant)."""
    n = 150
    boxes = jnp.asarray(random_boxes(rng, n, size=80.0))
    scores = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))

    def loss(b, s):
        idx, valid = nms_pallas(b, s, 0.5, 30, interpret=True)
        kept = b[idx] * valid[:, None]  # grads flow through this gather only
        return jnp.sum(kept) + 0.0 * jnp.sum(s)

    g_boxes, g_scores = jax.grad(loss, argnums=(0, 1))(boxes, scores)
    idx, valid = nms_pallas(boxes, scores, 0.5, 30, interpret=True)
    expected = np.zeros((n, 4), np.float32)
    expected[np.asarray(idx)[np.asarray(valid)]] = 1.0
    np.testing.assert_allclose(np.asarray(g_boxes), expected)
    np.testing.assert_array_equal(np.asarray(g_scores), np.zeros(n))


def test_nms_pallas_presorted_matches_unsorted(rng):
    """presorted=True on descending scores must select identically to the
    default path (and to the oracle), including with a validity mask."""
    n = 300
    boxes = jnp.asarray(random_boxes(rng, n, size=80.0))
    scores = jnp.sort(
        jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    )[::-1]
    mask = jnp.asarray(rng.uniform(0, 1, n) > 0.2)
    a = nms_pallas(boxes, scores, 0.5, 40, valid_mask=mask,
                   interpret=True, presorted=True)
    b = nms_pallas(boxes, scores, 0.5, 40, valid_mask=mask, interpret=True)
    c = nms_ref(boxes, scores, 0.5, 40, valid_mask=mask)
    assert_same_selection(a, b)
    assert_same_selection(a, c)


@pytest.mark.slow
def test_batched_nms_matches_per_class_reference(rng):
    """Class-offset batched NMS must select exactly what independent
    per-class NMS selects, including at high class ids where a too-large
    offset would destroy f32 sub-pixel resolution."""
    from tpudet.kernels import batched_nms_dispatch

    n, num_classes = 400, 80
    boxes = jnp.asarray(random_boxes(rng, n, size=90.0)) + 900.0  # coords ~1k
    scores = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    classes = jnp.asarray(rng.integers(1, num_classes + 1, n))

    idx, valid = batched_nms_dispatch(
        boxes, scores, classes, 0.5, 100, use_pallas=False
    )
    got = set(np.asarray(idx)[np.asarray(valid)].tolist())

    expected = set()
    for c in range(1, num_classes + 1):
        mask = np.asarray(classes) == c
        if not mask.any():
            continue
        ic, vc = nms_ref(boxes, scores, 0.5, 100,
                         valid_mask=jnp.asarray(mask))
        expected |= set(np.asarray(ic)[np.asarray(vc)].tolist())
    # batched keeps the top-100 overall; per-class union may exceed that —
    # every batched selection must appear in the per-class union.
    assert got <= expected
    # and the batched result must be the highest-scored 100 of the union.
    sc = np.asarray(scores)
    top = sorted(expected, key=lambda i: -sc[i])[:100]
    assert got == set(top)


def test_nms_pallas_zero_grad_with_bool_mask(rng):
    """The custom_vjp bwd must emit a float0 cotangent for the boolean
    valid_mask — a same-dtype zeros array is a TypeError under jax.grad."""
    n = 100
    boxes = jnp.asarray(random_boxes(rng, n, size=80.0))
    scores = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    mask = jnp.asarray(rng.uniform(0, 1, n) > 0.3)

    def loss(b, s):
        idx, valid = nms_pallas(b, s, 0.5, 30, valid_mask=mask,
                                interpret=True)
        return jnp.sum(b[idx] * valid[:, None]) + 0.0 * jnp.sum(s)

    g_boxes, _ = jax.grad(loss, argnums=(0, 1))(boxes, scores)
    assert np.isfinite(np.asarray(g_boxes)).all()
