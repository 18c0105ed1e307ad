"""End-to-end CLI tests (SURVEY.md §4.5): short synthetic training run with
decreasing losses, eval producing an mAP summary, detect producing an image."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_train_cli_short_run(tmp_path, capsys):
    from tpudet.cli import train as train_cli

    state = train_cli.main([
        "--preset", "tiny", "--dataset", "synthetic", "--steps", "8",
        "--no-mesh", "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--logdir", str(tmp_path / "logs"),
    ])
    assert int(state.step) == 8
    out = capsys.readouterr().out
    assert "training done" in out
    # CSV metrics written.
    csv_path = tmp_path / "logs" / "metrics.csv"
    assert csv_path.exists()
    # Checkpoint written and resumable.
    state2 = train_cli.main([
        "--preset", "tiny", "--dataset", "synthetic", "--steps", "10",
        "--no-mesh", "--checkpoint-dir", str(tmp_path / "ckpt"),
    ])
    assert int(state2.step) == 10
    out = capsys.readouterr().out
    assert "restored checkpoint at step 8" in out


def test_train_cli_rpn_only(capsys):
    from tpudet.cli import train as train_cli

    state = train_cli.main([
        "--preset", "tiny", "--dataset", "synthetic", "--steps", "2",
        "--no-mesh", "--rpn-only",
    ])
    out = capsys.readouterr().out
    assert "rpn_cls_loss" in out
    assert "det_cls_loss" not in out


def test_eval_cli_proposal_recall(capsys):
    """--metric proposal-recall: the RPN-analysis table over synthetic data
    (forces rpn_only predict, raises post-NMS k to fill the top-k cells)."""
    from tpudet.cli import eval as eval_cli

    summary = eval_cli.main([
        "--preset", "tiny", "--dataset", "synthetic",
        "--metric", "proposal-recall", "--max-images", "4", "--no-mesh",
    ])
    assert "recall@300_iou0.5" in summary
    for k, v in summary.items():
        if k.startswith("recall@"):
            assert 0.0 <= v <= 1.0
    assert summary["num_gt"] > 0
    # Regression: the CLI must lift roi.max_detections alongside
    # post_nms_topk_test — rpn_only predict truncates to max_detections
    # (default 100), which would silently collapse recall@300/@1000 to
    # recall@100 (observed 192.5 proposals/img on this fixture once lifted).
    assert summary["avg_proposals_per_image"] > 100


def test_train_cli_alternating_stages(tmp_path, capsys):
    """Paper §3.2 alternating schedule as CLI stages: RPN-only train →
    det-only fine-tune warm-started from the stage-1 checkpoint with
    backbone+RPN frozen (--init-from carries params, fresh optimizer)."""
    from tpudet.cli import train as train_cli

    train_cli.main([
        "--preset", "tiny", "--dataset", "synthetic", "--steps", "2",
        "--no-mesh", "--rpn-only",
        "--checkpoint-dir", str(tmp_path / "stage1"),
    ])
    state = train_cli.main([
        "--preset", "tiny", "--dataset", "synthetic", "--steps", "2",
        "--no-mesh", "--det-only", "--freeze", "backbone",
        "--init-from", str(tmp_path / "stage1"),
    ])
    assert int(state.step) == 2  # fresh step counter, not stage 1's
    out = capsys.readouterr().out
    assert "warm-started params" in out
    assert "det_cls_loss" in out
    assert "rpn_cls_loss" not in out.split("warm-started params")[1]


def test_eval_cli_synthetic(capsys):
    from tpudet.cli import eval as eval_cli

    summary = eval_cli.main([
        "--preset", "tiny", "--dataset", "synthetic", "--split", "val",
        "--batch-size", "4", "--max-images", "8",
    ])
    assert "mAP" in summary
    assert 0.0 <= summary["mAP"] <= 1.0


def test_eval_cli_save_json(tmp_path):
    """--save-json writes a COCO-format results list (image_id/category_id/
    bbox xywh/score per detection)."""
    import json

    from tpudet.cli import eval as eval_cli

    out = tmp_path / "results.json"
    eval_cli.main([
        "--preset", "tiny", "--dataset", "synthetic", "--split", "val",
        "--batch-size", "4", "--max-images", "8", "--save-json", str(out),
    ])
    results = json.loads(out.read_text())
    assert isinstance(results, list)
    for r in results[:5]:
        assert set(r) == {"image_id", "category_id", "bbox", "score"}
        assert len(r["bbox"]) == 4
        assert r["bbox"][2] >= 0 and r["bbox"][3] >= 0
        assert 0.0 <= r["score"] <= 1.0


def test_evaluate_empty_split():
    """Zero batches (empty val split) must summarize, not crash."""
    import jax

    from tpudet.cli.eval import evaluate
    from tpudet.config import tiny_test_config
    from tpudet.data import SyntheticDataset
    from tpudet.models import FasterRCNN
    from tpudet.train.state import create_train_state

    cfg = tiny_test_config()
    model = FasterRCNN(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(0))
    ds = SyntheticDataset(num_classes=3, num_examples=0, image_size=128)
    summary = evaluate(cfg, model, state.variables, ds, batch_size=2,
                       verbose=False)
    assert summary["mAP"] == 0.0


def test_eval_mesh_matches_single_device():
    """Data-parallel eval over the 8-fake-device mesh must produce the same
    mAP as single-device eval (same weights, same data)."""
    import jax

    from tpudet.cli.eval import evaluate
    from tpudet.config import tiny_test_config
    from tpudet.data import SyntheticDataset
    from tpudet.models import FasterRCNN
    from tpudet.parallel import make_mesh
    from tpudet.train.state import create_train_state

    cfg = tiny_test_config()
    model = FasterRCNN(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(3))
    ds = SyntheticDataset(num_classes=3, num_examples=16, image_size=128)
    kw = dict(batch_size=8, max_images=16, verbose=False)
    single = evaluate(cfg, model, state.variables, ds, **kw)
    mesh = make_mesh(num_data=8, num_model=1)
    sharded = evaluate(cfg, model, state.variables, ds, mesh=mesh, **kw)
    assert abs(single["mAP"] - sharded["mAP"]) < 1e-6


def test_detect_cli(tmp_path):
    from tpudet.cli import detect as detect_cli
    from PIL import Image

    rng = np.random.default_rng(0)
    img_path = tmp_path / "in.png"
    Image.fromarray(
        rng.integers(0, 255, (96, 120, 3)).astype(np.uint8)
    ).save(img_path)
    out_path = tmp_path / "out.png"
    detect_cli.main([
        "--preset", "tiny", "--image", str(img_path),
        "--output", str(out_path), "--score-thresh", "0.0",
    ])
    assert out_path.exists()
    out_img = np.asarray(Image.open(out_path))
    assert out_img.shape == (96, 120, 3)


def test_benchmark_cli_nms(capsys):
    from tpudet.cli import benchmark as bench_cli

    result = bench_cli.main([
        "--preset", "tiny", "--mode", "nms", "--iters", "2",
    ])
    assert result["unit"] == "us/img"
    assert result["value"] > 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(line)
    assert parsed["metric"] == "nms_kernel_us_per_img"


def test_benchmark_cli_trace_dir(tmp_path, capsys):
    """--trace-dir wraps only the first MEASURED span (post-compile,
    post-warmup) — not model build/compilation, which through a
    remote-compile tunnel would bury the iterations the trace is for."""
    from tpudet.cli import benchmark as bench_cli

    d = tmp_path / "trace"
    result = bench_cli.main([
        "--preset", "tiny", "--mode", "nms", "--iters", "2",
        "--trace-dir", str(d),
    ])
    assert result["value"] > 0
    assert any(d.rglob("*"))  # a trace was written
    # The span guard resets per main() call and fires at most once.
    assert bench_cli._TRACED is True
    capsys.readouterr()


def test_benchmark_cli_infer_stream(capsys):
    from tpudet.cli import benchmark as bench_cli

    result = bench_cli.main([
        "--preset", "tiny", "--mode", "infer_stream", "--batch-size", "2",
    ])
    assert result["unit"] == "images/sec/chip"
    assert result["value"] > 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(line)
    assert parsed["metric"] == "faster_rcnn_infer_stream_images_per_sec_per_chip"


def test_config_overrides():
    from tpudet.cli.common import preset_config, config_from_args
    from tpudet.cli import train as train_cli

    args = train_cli.parse_args([
        "--preset", "tiny", "--set", "rpn.nms_thresh=0.6",
        "--set", "roi.max_detections=7", "--set", "backbone.name=resnet50",
    ])
    cfg = config_from_args(args)
    assert cfg.rpn.nms_thresh == 0.6
    assert cfg.roi.max_detections == 7
    assert cfg.backbone.name == "resnet50"
    # Presets resolve.
    for name in ("voc_r50", "coco_r50", "coco_r101_fpn"):
        c = preset_config(name)
        assert c.data.num_classes in (20, 80)


def test_train_cli_eval_during_training(tmp_path, capsys):
    from tpudet.cli import train as train_cli

    ckpt_dir = tmp_path / "ckpt"
    train_cli.main([
        "--preset", "tiny", "--dataset", "synthetic", "--steps", "4",
        "--no-mesh", "--eval-every", "4", "--eval-max-images", "4",
        "--checkpoint-dir", str(ckpt_dir),
    ])
    out = capsys.readouterr().out
    assert "[eval step 4] mAP=" in out
    # Reproducibility record: the fully-resolved config next to checkpoints.
    cfg_json = json.loads((ckpt_dir / "config.json").read_text())
    assert cfg_json["data"]["dataset"] == "synthetic"
    assert cfg_json["train"]["total_steps"] == 4
    # Best-by-eval-mAP checkpoint written under best/.
    assert "-> checkpointed to best/" in out
    assert (ckpt_dir / "best").is_dir()
    from tpudet.train.checkpoint import CheckpointManager

    best = CheckpointManager(str(ckpt_dir / "best"), keep=1)
    assert best.latest_step == 4
    best.close()
    # Best tracking is resume-safe: best_map.json persists the high-water
    # mark, so a restarted job cannot overwrite a better best/ artifact
    # with its first post-resume eval (which compares against -inf
    # otherwise). Plant an unbeatable stored best and resume.
    record = ckpt_dir / "best" / "best_map.json"
    assert json.loads(record.read_text())["step"] == 4
    record.write_text(json.dumps({"mAP": 2.0, "step": 4}))
    train_cli.main([
        "--preset", "tiny", "--dataset", "synthetic", "--steps", "8",
        "--no-mesh", "--eval-every", "4", "--eval-max-images", "4",
        "--checkpoint-dir", str(ckpt_dir),
    ])
    out = capsys.readouterr().out
    assert "resumed best-mAP tracker: 2.0000" in out
    assert "-> checkpointed to best/" not in out
    assert json.loads(record.read_text())["mAP"] == 2.0


def test_training_deterministic_same_seed():
    """Same seed -> bit-identical first-step loss (reproducibility)."""
    from tpudet.config import TrainConfig
    from tpudet.models import FasterRCNN
    from tpudet.config import tiny_test_config
    from tpudet.train.state import create_train_state
    from tpudet.train.step import make_train_step
    from tpudet.data.preprocess import device_preprocess
    import jax

    cfg = tiny_test_config()
    losses = []
    from tests.test_train import make_train_batch

    for _ in range(2):
        model = FasterRCNN(cfg)
        state = create_train_state(model, cfg.train, jax.random.key(3))
        step = make_train_step(model, cfg, fused_preprocess=True)
        batch = make_train_batch(cfg)
        _, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[0] == losses[1]


def test_metrics_logger_grows_columns(tmp_path):
    """Columns appearing after the first row (steps_per_sec on the second
    call, eval metrics at the first eval interval) must survive into the
    CSV instead of being silently dropped by a frozen header."""
    import csv as csv_mod
    import time as time_mod

    from tpudet.utils.logging import MetricsLogger

    logger = MetricsLogger(str(tmp_path), use_tensorboard=False)
    logger.log(1, {"loss": 1.0})
    time_mod.sleep(0.01)
    logger.log(2, {"loss": 0.5})           # adds steps_per_sec
    logger.log(2, {"mAP": 0.7}, prefix="eval")  # adds eval/mAP
    logger.close()

    with open(tmp_path / "metrics.csv", newline="") as f:
        rows = list(csv_mod.DictReader(f))
    assert rows[0]["step"] == "1"
    assert float(rows[1]["steps_per_sec"]) > 0
    assert float(rows[2]["eval/mAP"]) == 0.7
    assert rows[2]["loss"] == ""  # eval row has no train columns

    # Resume into the same logdir with a new column set: old rows keep
    # their values, new columns extend the header.
    logger2 = MetricsLogger(str(tmp_path), use_tensorboard=False)
    logger2.log(3, {"loss": 0.25, "grad_norm": 2.0})
    logger2.close()
    with open(tmp_path / "metrics.csv", newline="") as f:
        rows = list(csv_mod.DictReader(f))
    assert len(rows) == 4
    assert rows[0]["loss"] == "1.0"
    assert float(rows[3]["grad_norm"]) == 2.0


def test_export_refuses_empty_checkpoint_dir(tmp_path):
    """--checkpoint-dir pointing at a dir with no checkpoint (e.g. a typo)
    must fail instead of silently exporting random weights."""
    import pytest as _pytest

    from tpudet.cli.export import main as export_main

    (tmp_path / "empty_ckpt").mkdir()
    with _pytest.raises(SystemExit, match="no checkpoint found"):
        export_main([
            "--preset", "tiny", "--checkpoint-dir",
            str(tmp_path / "empty_ckpt"),
            "--output", str(tmp_path / "m.tpudet"), "--batch-size", "1",
        ])


def test_train_cli_rejects_indivisible_mesh_batch(tmp_path):
    """batch_size not divisible by the data-mesh size must error up front:
    the sharded device_put would otherwise fail inside the loader's producer
    thread and hang the training loop forever."""
    import pytest as _pytest

    from tpudet.cli.train import main as train_main

    with _pytest.raises(ValueError, match="not divisible by the data-mesh"):
        train_main([
            "--preset", "tiny", "--dataset", "synthetic", "--steps", "1",
            "--batch-size", "2",  # 8 fake devices -> data mesh of 8
        ])


def test_parity_cli_dry_run(tmp_path):
    """The one-command VOC parity run (VERDICT r1 item 8) is dry-runnable
    end-to-end on synthetic data: layout check -> train -> protocol-exact
    eval -> parity table, resumable via the workdir."""
    from tpudet.cli import parity

    summary = parity.main([
        "--dry-run", "--workdir", str(tmp_path / "w"), "--steps", "4",
        "--batch-size", "8", "--eval-batch-size", "8",
    ])
    assert "mAP" in summary
    assert (tmp_path / "w" / "checkpoints").exists()


def test_voc_vgg16_preset():
    """Paper-canonical VGG-16 preset: backbone, 4096-dim head, stride-16
    anchors at 128/256/512 (arXiv:1506.01497 §4.1), constructible model."""
    from tpudet.cli.common import preset_config
    from tpudet.models import FasterRCNN

    cfg = preset_config("voc_vgg16")
    assert cfg.backbone.name == "vgg16" and not cfg.backbone.use_fpn
    assert cfg.roi.fc_dim == 4096
    assert cfg.anchors.scales == (128.0, 256.0, 512.0)
    assert cfg.anchors.stride == 16
    FasterRCNN(cfg)  # build-time validation passes
