import numpy as np

from tpudet.ops import anchors as A


def test_base_anchor_geometry():
    base = A.base_anchors_np([128.0, 256.0], [0.5, 1.0, 2.0])
    assert base.shape == (6, 4)
    w = base[:, 2] - base[:, 0]
    h = base[:, 3] - base[:, 1]
    # Area preserved per scale, aspect ratio h/w matches.
    np.testing.assert_allclose(w * h, [128**2] * 3 + [256**2] * 3, rtol=1e-5)
    np.testing.assert_allclose(h / w, [0.5, 1.0, 2.0] * 2, rtol=1e-5)
    # Zero-centered.
    np.testing.assert_allclose(base[:, :2] + base[:, 2:], 0.0, atol=1e-4)


def test_grid_anchor_centers_and_count():
    anchors = A.generate_anchors_np(4, 5, 16, [64.0], [1.0])
    assert anchors.shape == (4 * 5 * 1, 4)
    centers_x = (anchors[:, 0] + anchors[:, 2]) / 2
    centers_y = (anchors[:, 1] + anchors[:, 3]) / 2
    # First anchor centered at stride*(0.5).
    assert centers_x[0] == 8.0 and centers_y[0] == 8.0
    # Row-major over (y, x): second anchor moves in x.
    assert centers_x[1] == 24.0 and centers_y[1] == 8.0
    # Last anchor.
    assert centers_x[-1] == (4 + 0.5) * 16 and centers_y[-1] == (3 + 0.5) * 16


def test_anchor_ordering_matches_head_layout():
    # A anchors per cell vary fastest (reshape [H, W, A, 4] contract).
    anchors = A.generate_anchors_np(2, 2, 16, [32.0, 64.0], [1.0])
    areas = (anchors[:, 2] - anchors[:, 0]) * (anchors[:, 3] - anchors[:, 1])
    np.testing.assert_allclose(areas[:2], [32**2, 64**2], rtol=1e-5)


def test_fpn_anchors_levels():
    anchors, counts = A.generate_fpn_anchors(
        [(8, 8), (4, 4)], [16, 32], [64.0, 128.0], [0.5, 1.0, 2.0]
    )
    assert counts == [8 * 8 * 3, 4 * 4 * 3]
    assert anchors.shape[0] == sum(counts)


def test_validity_mask():
    anchors = A.generate_anchors_np(4, 4, 16, [32.0], [1.0])
    mask = A.anchor_validity_mask_np(anchors, 64.0, 64.0)
    # 32x32 anchors at 16px-grid centers: only fully-inside ones valid.
    inside = (
        (anchors[:, 0] >= 0)
        & (anchors[:, 1] >= 0)
        & (anchors[:, 2] <= 64)
        & (anchors[:, 3] <= 64)
    )
    np.testing.assert_array_equal(mask, inside)
    assert mask.sum() > 0 and (~mask).sum() > 0
