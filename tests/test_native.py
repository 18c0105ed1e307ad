"""Native C++ image front-end tests (tpudet/native/decoder.cpp).

Parity contract: the native fused decode→resize→pad must match the Python
(PIL) path — bit-exact on decode (both are libjpeg), within ±2 LSB on the
resize (PIL computes its triangle filter in fixed point, the native path in
double), and exactly equal on every geometry output (nh/nw/scales/boxes).
"""

import io
import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest
from PIL import Image

from tpudet.native import native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native decoder failed to build"
)


def _photo(rng, h, w):
    """JPEG-friendly smooth test image (noise upsampled = band-limited)."""
    small = rng.integers(0, 255, (max(2, h // 8), max(2, w // 8), 3), np.uint8)
    return np.asarray(Image.fromarray(small).resize((w, h), Image.BILINEAR))


def _jpeg_bytes(img, quality=92):
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def test_decode_bit_matches_pil(rng):
    from tpudet.data import native_decode as nd

    data = _jpeg_bytes(_photo(rng, 211, 337))
    assert nd.jpeg_dims(data) == (211, 337)
    native = nd.decode_jpeg(data)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(native, pil)


def test_decode_grayscale_jpeg(rng):
    from tpudet.data import native_decode as nd

    gray = Image.fromarray(_photo(rng, 64, 80)).convert("L")
    buf = io.BytesIO()
    gray.save(buf, format="JPEG")
    out = nd.decode_jpeg(buf.getvalue())
    assert out.shape == (64, 80, 3)
    # libjpeg's L->RGB replicates the channel.
    np.testing.assert_array_equal(out[..., 0], out[..., 1])


def test_corrupt_jpeg_raises():
    from tpudet.data import native_decode as nd

    with pytest.raises(ValueError):
        nd.jpeg_dims(b"not a jpeg at all")
    with pytest.raises(ValueError):
        nd.decode_jpeg(b"\xff\xd8\xff\xe0 truncated garbage")


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((240, 320), (123, 177)),   # downscale
     ((60, 80), (150, 190)),     # upscale
     ((100, 100), (100, 100))],  # identity
)
def test_resize_matches_pil(rng, in_hw, out_hw):
    from tpudet.data import native_decode as nd

    img = _photo(rng, *in_hw)
    native = nd.resize(img, *out_hw)
    pil = np.asarray(
        Image.fromarray(img).resize((out_hw[1], out_hw[0]), Image.BILINEAR)
    )
    diff = np.abs(native.astype(int) - pil.astype(int))
    assert diff.max() <= 2, f"max diff {diff.max()}"
    assert diff.mean() < 0.3


def test_fused_matches_pil_path(rng):
    from tpudet.config import DataConfig
    from tpudet.data import native_decode as nd
    from tpudet.data.preprocess import prepare_example, prepare_example_jpeg

    cfg = DataConfig(
        min_size=96, max_size=160, canvas_height=160, canvas_width=160,
        max_gt_boxes=8, fast_jpeg_scale=False,
    )
    img = _photo(rng, 300, 400)
    data = _jpeg_bytes(img)
    decoded = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    boxes = np.asarray([[10, 20, 200, 180], [0, 0, 50, 60]], np.float32)
    classes = np.asarray([1, 2], np.int32)

    want = prepare_example(cfg, decoded, boxes, classes)
    got = prepare_example_jpeg(cfg, data, boxes, classes)
    assert set(got) == set(want)
    for k in ("image_hw", "image_scale", "orig_hw", "gt_boxes", "gt_classes",
              "gt_valid", "gt_difficult"):
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)
    diff = np.abs(got["image"].astype(int) - want["image"].astype(int))
    assert diff.max() <= 2


def test_fast_dct_scale_close_and_same_geometry(rng):
    from tpudet.config import DataConfig
    from tpudet.data.preprocess import prepare_example_jpeg

    img = _photo(rng, 480, 640)
    data = _jpeg_bytes(img)
    boxes = np.asarray([[5, 5, 100, 100]], np.float32)
    classes = np.asarray([1], np.int32)
    kw = dict(min_size=96, max_size=160, canvas_height=160, canvas_width=160,
              max_gt_boxes=4)
    exact = prepare_example_jpeg(
        DataConfig(fast_jpeg_scale=False, **kw), data, boxes, classes)
    fast = prepare_example_jpeg(
        DataConfig(fast_jpeg_scale=True, **kw), data, boxes, classes)
    np.testing.assert_array_equal(fast["image_hw"], exact["image_hw"])
    np.testing.assert_array_equal(fast["gt_boxes"], exact["gt_boxes"])
    diff = np.abs(fast["image"].astype(np.float32) -
                  exact["image"].astype(np.float32))
    assert diff.mean() < 3.0, f"mean diff {diff.mean()}"


def test_decode_batch_matches_single_and_counts_failures(rng):
    from tpudet.data import native_decode as nd

    jpegs = [_jpeg_bytes(_photo(rng, h, w))
             for h, w in [(120, 160), (200, 150), (96, 96)]]
    jpegs.append(b"corrupt")
    canvases, sizes, failures = nd.decode_batch(
        jpegs, min_size=64, max_size=100, canvas_h=100, canvas_w=100,
        fast_dct_scale=True, num_threads=3,
    )
    assert failures == 1
    assert tuple(sizes[3]) == (0, 0, 0, 0)
    for i, data in enumerate(jpegs[:3]):
        canvas, (nh, nw), (oh, ow) = nd.decode_resize_pad(
            data, 64, 100, 100, 100, fast_dct_scale=True
        )
        assert tuple(sizes[i]) == (nh, nw, oh, ow)
        np.testing.assert_array_equal(canvases[i], canvas)


# ---------------------------------------------------------------------------
# Loader integration over a real on-disk VOC tree.
# ---------------------------------------------------------------------------

def _make_voc_tree(tmp_path, rng, n=4):
    root = tmp_path / "VOCdevkit" / "VOC2007"
    (root / "Annotations").mkdir(parents=True)
    (root / "JPEGImages").mkdir()
    (root / "ImageSets" / "Main").mkdir(parents=True)
    ids = []
    for i in range(n):
        h, w = int(rng.integers(200, 400)), int(rng.integers(200, 400))
        img = _photo(rng, h, w)
        image_id = f"{i:06d}"
        Image.fromarray(img).save(root / "JPEGImages" / f"{image_id}.jpg")
        ann = ET.Element("annotation")
        size = ET.SubElement(ann, "size")
        ET.SubElement(size, "height").text = str(h)
        ET.SubElement(size, "width").text = str(w)
        obj = ET.SubElement(ann, "object")
        ET.SubElement(obj, "name").text = "dog"
        ET.SubElement(obj, "difficult").text = "0"
        bb = ET.SubElement(obj, "bndbox")
        for tag, v in zip(("xmin", "ymin", "xmax", "ymax"),
                          (10, 12, w // 2, h // 2)):
            ET.SubElement(bb, tag).text = str(v)
        ET.ElementTree(ann).write(root / "Annotations" / f"{image_id}.xml")
        ids.append(image_id)
    with open(root / "ImageSets" / "Main" / "trainval.txt", "w") as f:
        f.write("\n".join(ids))
    return str(tmp_path)


def test_loader_native_vs_pil(tmp_path, rng):
    import dataclasses

    from tpudet.config import tiny_test_config
    from tpudet.data import DataLoader
    from tpudet.data.voc import VOCDataset

    root = _make_voc_tree(tmp_path, rng)
    ds = VOCDataset(root, split="trainval")
    cfg = tiny_test_config(canvas=128)
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, dataset="voc", decoder="native", fast_jpeg_scale=False))
    cfg_pil = cfg.replace(data=dataclasses.replace(cfg.data, decoder="pil"))

    nat = DataLoader(cfg, ds, batch_size=2, shuffle=False, num_workers=2)
    pil = DataLoader(cfg_pil, ds, batch_size=2, shuffle=False, num_workers=2)
    assert nat.native_decode and not pil.native_decode
    for bn, bp in zip(nat.batches(0), pil.batches(0)):
        for k in bp:
            if k == "image":
                diff = np.abs(bn[k].astype(int) - bp[k].astype(int))
                assert diff.max() <= 2
            else:
                np.testing.assert_array_equal(bn[k], bp[k], err_msg=k)


def test_native_respects_aspect_buckets(rng):
    """Regression: the native fused path must pick the same bucket canvas as
    the PIL path (it originally only honored orientation_buckets, silently
    padding every image onto the full square canvas)."""
    from dataclasses import replace

    from tpudet.config import DataConfig
    from tpudet.data.preprocess import prepare_example, prepare_example_jpeg

    buckets = ((96, 96), (96, 128), (128, 96))
    cfg = DataConfig(min_size=90, max_size=128, canvas_height=160,
                     canvas_width=160, aspect_buckets=buckets,
                     max_gt_boxes=4, fast_jpeg_scale=False)
    boxes = np.zeros((0, 4), np.float32)
    classes = np.zeros(0, np.int32)
    for h, w in [(100, 100), (90, 140), (140, 90)]:
        img = _photo(rng, h, w)
        data = _jpeg_bytes(img)
        want = prepare_example(cfg, img_decoded(data), boxes, classes)
        got = prepare_example_jpeg(cfg, data, boxes, classes)
        assert got["image"].shape == want["image"].shape, (h, w)
        assert got["image"].shape[:2] in set(buckets)
        np.testing.assert_array_equal(got["image_hw"], want["image_hw"])


def img_decoded(data):
    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


def test_unknown_decoder_value_raises():
    import dataclasses

    from tpudet.config import tiny_test_config
    from tpudet.data import DataLoader, SyntheticDataset

    cfg = tiny_test_config(canvas=128)
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, decoder="PIL"))
    ds = SyntheticDataset(num_classes=3, num_examples=2, image_size=128)
    with pytest.raises(ValueError, match="unknown data.decoder"):
        DataLoader(cfg, ds, batch_size=2)


def test_native_falls_back_per_image_on_undecodable_jpeg(rng):
    """A JPEG libjpeg rejects must fall back to the PIL path (via
    get_example), not kill the batch."""
    import dataclasses

    from tpudet.config import tiny_test_config
    from tpudet.data import DataLoader

    good = _photo(rng, 80, 80)

    class Mixed:
        def __len__(self):
            return 2

        def example_hw(self, i):
            return (80, 80)

        def get_raw(self, i):
            return {
                "jpeg": b"\xff\xd8 broken" if i == 1 else _jpeg_bytes(good),
                "boxes": np.zeros((0, 4), np.float32),
                "classes": np.zeros(0, np.int32),
            }

        def get_example(self, i):
            return {
                "image": good,
                "boxes": np.zeros((0, 4), np.float32),
                "classes": np.zeros(0, np.int32),
            }

    cfg = tiny_test_config(canvas=128)
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, decoder="native"))
    loader = DataLoader(cfg, Mixed(), batch_size=2, shuffle=False,
                        num_workers=2)
    batch = next(iter(loader.batches(0)))
    assert batch["image"].shape[0] == 2  # both images made it


def test_native_mode_requires_raw_source():
    import dataclasses

    from tpudet.config import tiny_test_config
    from tpudet.data import DataLoader, SyntheticDataset

    cfg = tiny_test_config(canvas=128)
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, decoder="native"))
    ds = SyntheticDataset(num_classes=3, num_examples=2, image_size=128)
    with pytest.raises(ValueError, match="get_raw"):
        DataLoader(cfg, ds, batch_size=2)


def test_truncated_jpeg_rejected():
    """libjpeg 'recovers' from premature EOF by gray-filling missing MCUs
    and reporting success; the native decoder must treat corrupt-data
    warnings as failure so the loader falls back / surfaces the bad file
    instead of silently training on half-gray images."""
    import io

    import numpy as np
    import pytest
    from PIL import Image

    from tpudet.data import native_decode
    from tpudet.native import native_available

    if not native_available():
        pytest.skip("native decoder unavailable")

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (120, 160, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=90)
    whole = buf.getvalue()

    # Intact decodes fine...
    native_decode.decode_resize_pad(whole, 100, 160, 128, 160)
    # ...truncated (half the entropy-coded data gone) must raise.
    truncated = whole[: len(whole) // 2]
    with pytest.raises(native_decode.NativeDecodeError):
        native_decode.decode_resize_pad(truncated, 100, 160, 128, 160)
