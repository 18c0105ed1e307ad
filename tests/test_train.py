import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from tpudet.config import tiny_test_config, TrainConfig
from tpudet.data import SyntheticDataset, DataLoader
from tpudet.data.preprocess import device_preprocess
from tpudet.models import FasterRCNN
from tpudet.parallel import make_mesh, batch_sharding, shard_batch
from tpudet.train.state import create_train_state, lr_schedule
from tpudet.train.step import make_train_step, make_eval_step


def small_cfg(**train_kw):
    cfg = tiny_test_config()
    kw = dict(
        batch_size=2, learning_rate=0.02, warmup_steps=0, weight_decay=1e-4,
        checkpoint_every=10**9,
    )
    kw.update(train_kw)
    return cfg.replace(train=TrainConfig(**kw))


def make_train_batch(cfg, b=2):
    ds = SyntheticDataset(num_classes=cfg.data.num_classes, num_examples=b,
                          image_size=cfg.data.canvas_height)
    loader = DataLoader(cfg, ds, batch_size=b, num_workers=2)
    raw = next(iter(loader.batches(0)))
    return {k: jnp.asarray(v) for k, v in raw.items()}


def test_adamw_decoupled_decay():
    """optimizer='adamw' applies DECOUPLED decay (torch-AdamW semantics,
    Loshchilov & Hutter): with a ZERO gradient the ndim>=2 leaves still
    shrink by exactly lr*wd*param (decay on the update, never through the
    Adam moments) and biases are untouched. The coupled 'adam' +
    add_decayed_weights path, by contrast, feeds the decay through the
    adaptive denominator: the same zero gradient yields a ~full -lr step."""
    from tpudet.train.state import make_optimizer

    lr, wd = 0.01, 0.1
    params = {"w": jnp.full((2, 2), 3.0), "b": jnp.full((2,), 3.0)}
    grads = jax.tree.map(jnp.zeros_like, params)

    tx = make_optimizer(TrainConfig(
        optimizer="adamw", learning_rate=lr, weight_decay=wd, warmup_steps=0
    ))
    upd, _ = tx.update(grads, tx.init(params), params)
    np.testing.assert_allclose(
        np.asarray(upd["w"]), -lr * wd * 3.0, rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(upd["b"]), 0.0, atol=0.0)

    tx2 = make_optimizer(TrainConfig(
        optimizer="adam", learning_rate=lr, weight_decay=wd, warmup_steps=0
    ))
    upd2, _ = tx2.update(grads, tx2.init(params), params)
    # Coupled: g_eff = wd*p, first Adam step ~ -lr * g/|g| = -lr, i.e. 30x
    # the decoupled step at these values.
    assert float(upd2["w"][0, 0]) == pytest.approx(-lr, rel=1e-3)


def test_lr_schedule():
    cfg = TrainConfig(learning_rate=1.0, warmup_steps=10, warmup_factor=0.1,
                      lr_milestones=(100, 200), lr_gamma=0.1)
    sched = lr_schedule(cfg)
    assert float(sched(0)) == pytest.approx(0.1)
    assert float(sched(5)) == pytest.approx(0.55)
    assert float(sched(50)) == pytest.approx(1.0)
    assert float(sched(150)) == pytest.approx(0.1)
    assert float(sched(250)) == pytest.approx(0.01)


def test_train_step_decreases_loss():
    cfg = small_cfg()
    model = FasterRCNN(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(0))
    step = make_train_step(model, cfg)
    raw = make_train_batch(cfg)
    batch = device_preprocess(cfg, raw, jax.random.key(42), training=False)

    first = None
    for _ in range(25):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < first, (first, last)
    assert int(state.step) == 25
    assert float(metrics["grad_norm"]) > 0


def test_train_step_data_parallel_mesh():
    """8 fake CPU devices: sharded batch, replicated params (SURVEY.md §4.4)."""
    cfg = small_cfg()
    model = FasterRCNN(cfg)
    mesh = make_mesh(num_data=8)
    state = create_train_state(model, cfg.train, jax.random.key(0))
    step = make_train_step(model, cfg, mesh=mesh)

    raw = make_train_batch(cfg, b=8)
    batch = device_preprocess(cfg, raw, jax.random.key(0), training=False)
    batch = shard_batch(mesh, batch)
    # Params replicated onto the mesh.
    state = jax.device_put(state, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))

    state, metrics = step(state, batch)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 2
    # Params stay replicated: all device shards identical.
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_eval_step_runs():
    cfg = small_cfg()
    model = FasterRCNN(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(0))
    eval_step = make_eval_step(model, cfg)
    raw = make_train_batch(cfg)
    batch = device_preprocess(cfg, raw)
    out = eval_step(state.variables, batch)
    assert out["boxes"].shape[0] == 2


def test_checkpoint_roundtrip(tmp_path):
    from tpudet.train.checkpoint import CheckpointManager

    cfg = small_cfg()
    model = FasterRCNN(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(0))
    step = make_train_step(model, cfg)
    raw = make_train_batch(cfg)
    batch = device_preprocess(cfg, raw)
    state, _ = step(state, batch)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    assert mgr.save(state, force=True)
    mgr.wait()
    assert mgr.latest_step == 1

    fresh = create_train_state(model, cfg.train, jax.random.key(7))
    restored = mgr.restore(fresh)
    assert int(restored.step) == 1
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_restore_eval_across_optimizer_configs(tmp_path):
    """The eval path must load a checkpoint regardless of the train-time
    optimizer config (VERDICT r3 session: a checkpoint trained with --set
    train.optimizer=adamw failed eval's StandardRestore structure match
    against the preset-default SGD template). restore_eval is template-free:
    params/constants/step land, opt_state is ignored."""
    from tpudet.train.checkpoint import CheckpointManager

    cfg = small_cfg(optimizer="adamw")
    model = FasterRCNN(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(0))
    step = make_train_step(model, cfg)
    raw = make_train_batch(cfg)
    batch = device_preprocess(cfg, raw)
    state, _ = step(state, batch)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=1)
    assert mgr.save(state, force=True)
    mgr.wait()
    mgr.close()

    # Fresh manager + an SGD-configured template (the eval CLI's default).
    sgd_cfg = small_cfg(optimizer="sgd")
    fresh = create_train_state(FasterRCNN(sgd_cfg), sgd_cfg.train,
                               jax.random.key(7))
    mgr2 = CheckpointManager(str(tmp_path / "ckpt"))
    # The strict trainer-resume restore rejects the structure mismatch...
    with pytest.raises(ValueError):
        mgr2.restore(fresh)
    # ...the eval restore does not.
    restored = mgr2.restore_eval(fresh)
    mgr2.close()
    assert int(restored.step) == 1
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_freeze_subtrees_bit_identical():
    """train.freeze pins the named subtrees exactly: nonzero weight decay +
    momentum must not move a frozen param by even one ulp (the paper's
    alternating-training stage freezes, SURVEY.md C18)."""
    cfg = small_cfg(freeze=("backbone",), weight_decay=1e-2)
    model = FasterRCNN(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(0))
    init_params = jax.device_get(state.params)
    step = make_train_step(model, cfg)
    raw = make_train_batch(cfg)
    batch = device_preprocess(cfg, raw, jax.random.key(42), training=False)
    for _ in range(3):
        state, metrics = step(state, batch)
    final = jax.device_get(state.params)

    def flat(t):
        import flax.traverse_util as tu
        return tu.flatten_dict(t, sep="/")

    fi, ff = flat(init_params), flat(final)
    moved = {k for k in fi if not np.array_equal(fi[k], ff[k])}
    assert not any(k.startswith("backbone/") for k in moved), moved
    # ... while the unfrozen heads actually trained.
    assert any(k.startswith("rpn_head/") for k in moved)
    assert any(k.startswith("det_head/") for k in moved)
    # The reported grad_norm must measure the TRAINABLE leaves only (what
    # clip_by_global_norm sees) — a raw-grad global_norm would both report
    # a different number and keep the frozen backward cone live in XLA.
    unfrozen_cfg = small_cfg(weight_decay=1e-2)
    ustate = create_train_state(model, unfrozen_cfg.train, jax.random.key(0))
    ustep = make_train_step(model, unfrozen_cfg)
    _, umetrics = ustep(ustate, batch)
    # Same params, same batch: the frozen run's grad_norm differs from the
    # unfrozen run's (backbone grads excluded), and is strictly smaller.
    frozen_state = create_train_state(model, cfg.train, jax.random.key(0))
    _, fmetrics = step(frozen_state, batch)
    assert float(fmetrics["grad_norm"]) < float(umetrics["grad_norm"])
    assert float(fmetrics["grad_norm"]) > 0.0


def test_freeze_unknown_prefix_raises():
    cfg = small_cfg(freeze=("backbone", "not_a_module"))
    model = FasterRCNN(cfg)
    with pytest.raises(ValueError, match="not_a_module"):
        create_train_state(model, cfg.train, jax.random.key(0))


def test_det_only_trains_detection_branch():
    """det_only: RPN supplies proposals but is frozen; only detection losses
    drive the update (alternating-schedule steps 2/4)."""
    cfg = small_cfg(freeze=("rpn_head",)).replace(det_only=True)
    model = FasterRCNN(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(0))
    init_params = jax.device_get(state.params)
    step = make_train_step(model, cfg)
    raw = make_train_batch(cfg)
    batch = device_preprocess(cfg, raw, jax.random.key(42), training=False)
    for _ in range(5):
        state, metrics = step(state, batch)
    assert set(metrics) >= {"loss", "det_cls_loss", "det_box_loss"}
    assert "rpn_cls_loss" not in metrics
    assert np.isfinite(float(metrics["loss"]))

    import flax.traverse_util as tu
    fi = tu.flatten_dict(init_params, sep="/")
    ff = tu.flatten_dict(jax.device_get(state.params), sep="/")
    moved = {k for k in fi if not np.array_equal(fi[k], ff[k])}
    assert not any(k.startswith("rpn_head/") for k in moved), moved
    assert any(k.startswith("det_head/") for k in moved)


def test_det_only_requires_rpn_freeze():
    cfg = small_cfg().replace(det_only=True)
    model = FasterRCNN(cfg)
    with pytest.raises(ValueError, match="rpn_head"):
        make_train_step(model, cfg)


def test_rpn_only_det_only_mutually_exclusive():
    cfg = small_cfg().replace(det_only=True, rpn_only=True)
    with pytest.raises(ValueError, match="mutually exclusive"):
        FasterRCNN(cfg)


def test_restore_params_warm_start(tmp_path):
    """The alternating-schedule stage transition: params carry over, the
    optimizer/step are fresh — even when the stages' freeze sets (and hence
    opt_state pytrees) differ."""
    from tpudet.train.checkpoint import CheckpointManager

    cfg = small_cfg()
    model = FasterRCNN(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(0))
    step = make_train_step(model, cfg)
    raw = make_train_batch(cfg)
    batch = device_preprocess(cfg, raw)
    state, _ = step(state, batch)
    mgr = CheckpointManager(str(tmp_path / "stage1"), keep=1)
    assert mgr.save(state, force=True)
    mgr.wait()

    cfg2 = small_cfg(freeze=("backbone", "rpn_head")).replace(det_only=True)
    fresh = create_train_state(FasterRCNN(cfg2), cfg2.train, jax.random.key(9))
    warm = mgr.restore_params(fresh)
    mgr.close()
    assert int(warm.step) == 0
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(warm.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the warm-started stage actually steps
    step2 = make_train_step(FasterRCNN(cfg2), cfg2)
    warm, metrics = step2(warm, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_train_step_tensor_parallel_mesh():
    """dp=4 x tp=2 over 8 fake devices: det-head MLP sharded over 'model'."""
    from tpudet.parallel.sharding_rules import shard_train_state

    cfg = small_cfg()
    model = FasterRCNN(cfg)
    mesh = make_mesh(num_data=4, num_model=2)
    state = create_train_state(model, cfg.train, jax.random.key(0))
    state = shard_train_state(mesh, state)
    fc1 = state.params["det_head"]["fc1"]["kernel"]
    assert not fc1.sharding.is_fully_replicated

    step = make_train_step(model, cfg, mesh=mesh, state_example=state)
    raw = make_train_batch(cfg, b=4)
    batch = device_preprocess(cfg, raw, jax.random.key(0), training=False)
    batch = shard_batch(mesh, batch)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # TP layout preserved through the step (donated + re-sharded correctly).
    fc1 = state.params["det_head"]["fc1"]["kernel"]
    assert not fc1.sharding.is_fully_replicated
    # Backbone stays replicated.
    stem = jax.tree_util.tree_leaves(state.params["backbone"])[0]
    assert stem.sharding.is_fully_replicated


def test_checkpoint_roundtrip_sharded_mesh(tmp_path):
    """Pod-scale resume (SURVEY A3): save a dp=4 x tp=2 SHARDED TrainState,
    restore into a fresh sharded template — params equal, TP layout
    preserved, and the restored state steps. Then restore the same
    checkpoint into a DIFFERENT mesh shape (dp=8, no TP): orbax reshards to
    the template's shardings, which is the elastic-recovery story for a
    changed slice topology."""
    from tpudet.parallel.sharding_rules import shard_train_state
    from tpudet.train.checkpoint import CheckpointManager

    cfg = small_cfg(batch_size=4)
    model = FasterRCNN(cfg)
    mesh = make_mesh(num_data=4, num_model=2)
    state = shard_train_state(
        mesh, create_train_state(model, cfg.train, jax.random.key(0))
    )
    step = make_train_step(model, cfg, mesh=mesh, state_example=state)
    raw = make_train_batch(cfg, b=4)
    batch = device_preprocess(cfg, raw, jax.random.key(0), training=False)
    batch = shard_batch(mesh, batch)
    state, _ = step(state, batch)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=1)
    assert mgr.save(state, force=True)
    mgr.wait()

    fresh = shard_train_state(
        mesh, create_train_state(model, cfg.train, jax.random.key(7))
    )
    restored = mgr.restore(fresh)
    assert int(restored.step) == 1
    fi = jax.device_get(state.params)
    fr = jax.device_get(restored.params)
    for a, b in zip(
        jax.tree_util.tree_leaves(fi), jax.tree_util.tree_leaves(fr)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    fc1 = restored.params["det_head"]["fc1"]["kernel"]
    assert not fc1.sharding.is_fully_replicated  # TP layout survived restore
    restored, metrics = step(restored, batch)
    assert np.isfinite(float(metrics["loss"]))

    # Elastic: same checkpoint into a dp=8 (TP-free) template.
    mesh8 = make_mesh(num_data=8, num_model=1)
    fresh8 = shard_train_state(
        mesh8, create_train_state(model, cfg.train, jax.random.key(11))
    )
    restored8 = mgr.restore(fresh8)
    mgr.close()
    assert int(restored8.step) == 1
    a = jax.tree_util.tree_leaves(fi)[0]
    b = jax.tree_util.tree_leaves(jax.device_get(restored8.params))[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    fc1 = restored8.params["det_head"]["fc1"]["kernel"]
    assert fc1.sharding.is_fully_replicated  # resharded to the new template


def test_train_step_bf16_backbone():
    """bf16 compute tier (BASELINE config 5) trains stably."""
    import dataclasses

    cfg = small_cfg()
    cfg = cfg.replace(backbone=dataclasses.replace(cfg.backbone, dtype="bfloat16"))
    model = FasterRCNN(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(0))
    step = make_train_step(model, cfg)
    raw = make_train_batch(cfg)
    batch = device_preprocess(cfg, raw)
    first = None
    for _ in range(10):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss"]) < first
    # Params remain f32 (only compute is bf16).
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.dtype == jnp.float32


class _LinearStubModel:
    """Deterministic rng-free stand-in: loss = mean_i <w, x_i> over the batch.

    Gradient w.r.t. w is the batch-mean of x, so gradient accumulation over
    equal microbatches must reproduce the full-batch gradient exactly — this
    isolates the accumulation arithmetic from detection-model sampling rng
    (which legitimately differs per microbatch)."""

    def init(self, rng):
        return {"params": {"w": jnp.zeros((4,), jnp.float32)}}

    def loss(self, variables, batch, rng):
        w = variables["params"]["w"]
        per_ex = batch["x"] @ w + 0.5 * jnp.sum(w * w)
        loss = jnp.mean(per_ex)
        return loss, {"loss": loss}


def test_grad_accum_matches_full_batch():
    from tpudet.train.step import make_train_step
    import dataclasses

    cfg = small_cfg(batch_size=8)
    model = _LinearStubModel()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 4)), jnp.float32)
    batch = {"x": x}

    states, metrics = {}, {}
    for accum in (1, 2, 4):
        c = cfg.replace(train=dataclasses.replace(
            cfg.train, accum_steps=accum, weight_decay=0.0))
        s = create_train_state(model, c.train, jax.random.key(0))
        step = make_train_step(model, c)
        s, m = step(s, batch)
        states[accum], metrics[accum] = s, m
    w1 = np.asarray(states[1].params["w"])
    for accum in (2, 4):
        # Accumulation reorders the f32 summation; exact bitwise equality is
        # not guaranteed, only agreement to summation-order noise.
        np.testing.assert_allclose(
            np.asarray(states[accum].params["w"]), w1, rtol=1e-5, atol=1e-8)
        assert float(metrics[accum]["loss"]) == pytest.approx(
            float(metrics[1]["loss"]), rel=1e-6)
    # Sanity: the update actually moved the params (grad = mean x + w != 0).
    assert np.abs(w1).max() > 0


def test_grad_accum_real_model_decreases_loss():
    import dataclasses

    cfg = small_cfg(batch_size=4)
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, accum_steps=2))
    model = FasterRCNN(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(0))
    step = make_train_step(model, cfg)
    raw = make_train_batch(cfg, b=4)
    batch = device_preprocess(cfg, raw, jax.random.key(42), training=False)

    first = None
    for _ in range(15):
        state, m = step(state, batch)
        if first is None:
            first = float(m["loss"])
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < first
    assert int(state.step) == 15  # one optimizer step per global batch


def test_grad_accum_data_parallel_mesh():
    """accum=2 over the 8-device mesh: microbatch axis stays data-sharded,
    params stay replicated, loss finite."""
    import dataclasses

    cfg = small_cfg(batch_size=16)
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, accum_steps=2))
    model = FasterRCNN(cfg)
    mesh = make_mesh(num_data=8)
    state = create_train_state(model, cfg.train, jax.random.key(0))
    step = make_train_step(model, cfg, mesh=mesh)

    raw = make_train_batch(cfg, b=16)
    batch = device_preprocess(cfg, raw, jax.random.key(0), training=False)
    batch = shard_batch(mesh, batch)
    state = jax.device_put(state, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_grad_accum_divisibility_errors():
    import dataclasses

    cfg = small_cfg(batch_size=6)
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, accum_steps=4))
    model = FasterRCNN(cfg)
    with pytest.raises(ValueError, match="accum_steps"):
        make_train_step(model, cfg)
    # Microbatch must still divide the data-mesh axis: 16/4=4 < 8 devices.
    cfg = small_cfg(batch_size=16)
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, accum_steps=4))
    with pytest.raises(ValueError, match="data-mesh"):
        make_train_step(FasterRCNN(cfg), cfg, mesh=make_mesh(num_data=8))


def test_training_determinism_bitwise():
    """Two fresh runs with the same seed must produce bit-identical params
    after several steps — the loader order, sampler rng, and fused-augment
    rng are all seed-derived, and XLA-CPU is deterministic. Guards the
    production reproducibility contract (a resumed/re-run job must be
    auditable against the original)."""
    def run():
        cfg = small_cfg(batch_size=2)
        model = FasterRCNN(cfg)
        state = create_train_state(model, cfg.train, jax.random.key(7))
        step = make_train_step(model, cfg)
        raw = make_train_batch(cfg, b=2)
        batch = device_preprocess(cfg, raw, jax.random.key(3), training=True)
        for _ in range(5):
            state, _ = step(state, batch)
        return jax.tree_util.tree_map(np.asarray, state.params)

    a, b = run(), run()
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(x, y)


def test_cosine_lr_schedule():
    import dataclasses

    cfg = TrainConfig(learning_rate=1.0, warmup_steps=10, warmup_factor=0.1,
                      lr_schedule="cosine", lr_min_factor=0.1,
                      total_steps=1000)
    sched = lr_schedule(cfg)
    # Warmup ramps the cosine value (cos at step 0 ~ 1.0 -> lr ~ 1.0 * 0.1).
    assert float(sched(0)) == pytest.approx(0.1, rel=1e-3)
    # Half way: lr_min + (lr - lr_min) * 0.5 * (1 + cos(pi/2)) = 0.55.
    assert float(sched(500)) == pytest.approx(0.55, rel=1e-5)
    # End (and beyond): the floor lr_min_factor * lr.
    assert float(sched(1000)) == pytest.approx(0.1, rel=1e-5)
    assert float(sched(5000)) == pytest.approx(0.1, rel=1e-5)
    # Monotone decreasing after warmup.
    vals = [float(sched(s)) for s in range(10, 1000, 50)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))

    with pytest.raises(ValueError, match="lr_schedule"):
        lr_schedule(dataclasses.replace(cfg, lr_schedule="nope"))


def test_ema_tracks_params():
    """EMA follows the TF OD API convention: decay ramps in as
    min(ema_decay, (1+n)/(10+n)) over optimizer updates n."""
    import dataclasses

    cfg = small_cfg(batch_size=8)
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, ema_decay=0.9, weight_decay=0.0))
    model = _LinearStubModel()
    state = create_train_state(model, cfg.train, jax.random.key(0))
    assert state.ema_params is not None
    step = make_train_step(model, cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 4)), jnp.float32)
    batch = {"x": x}

    ema_expected = np.asarray(state.params["w"])
    for n in (1, 2, 3):
        state, _ = step(state, batch)
        d = min(0.9, (1.0 + n) / (10.0 + n))
        ema_expected = d * ema_expected + (1 - d) * np.asarray(
            state.params["w"])
        np.testing.assert_allclose(
            np.asarray(state.ema_params["w"]), ema_expected, rtol=1e-6)
    # EMA differs from raw params but moved off the init.
    assert not np.allclose(
        np.asarray(state.ema_params["w"]), np.asarray(state.params["w"]))
    assert np.abs(np.asarray(state.ema_params["w"])).max() > 0

    # Disabled EMA keeps the field None (tree shape unchanged).
    cfg0 = small_cfg()
    s0 = create_train_state(_LinearStubModel(), cfg0.train, jax.random.key(0))
    assert s0.ema_params is None
    with pytest.raises(ValueError, match="ema_decay"):
        create_train_state(
            _LinearStubModel(),
            dataclasses.replace(cfg0.train, ema_decay=1.0),
            jax.random.key(0),
        )


def test_eval_variables_selects_ema():
    import dataclasses

    cfg = small_cfg()
    model = FasterRCNN(cfg)
    state = create_train_state(model, cfg.train, jax.random.key(0))
    with pytest.raises(ValueError, match="ema"):
        state.eval_variables(use_ema=True)
    assert state.eval_variables(False)["params"] is state.params

    cfg = cfg.replace(train=dataclasses.replace(cfg.train, ema_decay=0.99))
    state = create_train_state(model, cfg.train, jax.random.key(0))
    v = state.eval_variables(True)
    assert v["params"] is state.ema_params
    assert set(v) == set(state.variables)


def test_ema_checkpoint_and_warm_start(tmp_path):
    """EMA survives a checkpoint round-trip; restore_params (stage
    transition) restarts the average from the loaded weights."""
    import dataclasses
    from tpudet.train.checkpoint import CheckpointManager

    cfg = small_cfg(batch_size=8)
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, ema_decay=0.9, weight_decay=0.0))
    model = _LinearStubModel()
    state = create_train_state(model, cfg.train, jax.random.key(0))
    step = make_train_step(model, cfg)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(8, 4)), jnp.float32)
    for _ in range(3):
        state, _ = step(state, {"x": x})

    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=1)
    assert mgr.save(state, force=True)
    mgr.wait()
    fresh = create_train_state(model, cfg.train, jax.random.key(5))
    restored = mgr.restore(fresh)
    np.testing.assert_array_equal(
        np.asarray(restored.ema_params["w"]), np.asarray(state.ema_params["w"]))
    np.testing.assert_array_equal(
        np.asarray(restored.params["w"]), np.asarray(state.params["w"]))

    warm = mgr.restore_params(create_train_state(
        model, cfg.train, jax.random.key(6)))
    mgr.close()
    # Warm start: EMA == params (the average restarts with the new stage).
    np.testing.assert_array_equal(
        np.asarray(warm.ema_params["w"]), np.asarray(warm.params["w"]))
    np.testing.assert_array_equal(
        np.asarray(warm.params["w"]), np.asarray(state.params["w"]))


def test_ema_restore_reconciliation(tmp_path):
    """The EMA subtree is reconciled against the checkpoint, not strictly
    matched (a strict orbax StandardRestore would crash every cross-config
    workflow): an EMA-trained checkpoint restores its average into a
    template that didn't enable EMA, and a pre-EMA checkpoint restores into
    an EMA-enabled template with the average restarted from the params."""
    import dataclasses
    from tpudet.train.checkpoint import CheckpointManager

    model = _LinearStubModel()
    # Identical optimizer chain in both configs (only the EMA flag differs,
    # so the opt_state trees match and ONLY the ema subtree is at stake).
    cfg = small_cfg(batch_size=8, weight_decay=0.0)
    ema_cfg = dataclasses.replace(cfg.train, ema_decay=0.9)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(8, 4)), jnp.float32)

    # Train WITH EMA, save.
    st = create_train_state(model, ema_cfg, jax.random.key(0))
    step = make_train_step(model, cfg.replace(train=ema_cfg))
    for _ in range(3):
        st, _ = step(st, {"x": x})
    mgr = CheckpointManager(str(tmp_path / "with_ema"), keep=1)
    assert mgr.save(st, force=True)
    mgr.wait()
    # (a) Restore into a NO-EMA template (e.g. eval without the train-time
    # --set): must not crash, and must carry the REAL average through.
    plain = create_train_state(model, cfg.train, jax.random.key(5))
    assert plain.ema_params is None
    restored = mgr.restore(plain)
    mgr.close()
    assert restored.ema_params is not None
    np.testing.assert_array_equal(
        np.asarray(restored.ema_params["w"]), np.asarray(st.ema_params["w"]))
    assert restored.eval_variables(True)["params"] is restored.ema_params

    # Train WITHOUT EMA, save.
    st0 = create_train_state(model, cfg.train, jax.random.key(0))
    step0 = make_train_step(model, cfg)
    st0, _ = step0(st0, {"x": x})
    mgr0 = CheckpointManager(str(tmp_path / "no_ema"), keep=1)
    assert mgr0.save(st0, force=True)
    mgr0.wait()
    # (b) Restore into an EMA-enabled template (EMA newly switched on):
    # the average restarts from the restored params and the step runs.
    fresh = create_train_state(model, ema_cfg, jax.random.key(9))
    warm = mgr0.restore(fresh)
    mgr0.close()
    np.testing.assert_array_equal(
        np.asarray(warm.ema_params["w"]), np.asarray(warm.params["w"]))
    np.testing.assert_array_equal(
        np.asarray(warm.params["w"]), np.asarray(st0.params["w"]))
    warm, _ = step(warm, {"x": x})
    assert np.isfinite(float(warm.ema_params["w"].sum()))


def test_backbone_lr_factor_scales_updates():
    """train.backbone_lr_factor multiplies the backbone subtree's effective
    step exactly (torch param-group-lr semantics: the whole update, decay
    included) while leaving every other subtree bit-identical."""
    import flax.traverse_util as tu

    def one_step(factor):
        cfg = small_cfg(momentum=0.0, backbone_lr_factor=factor)
        model = FasterRCNN(cfg)
        state = create_train_state(model, cfg.train, jax.random.key(0))
        init = jax.device_get(state.params)
        step = make_train_step(model, cfg)
        raw = make_train_batch(cfg)
        batch = device_preprocess(cfg, raw, jax.random.key(0), training=False)
        state, _ = step(state, batch)
        final = jax.device_get(state.params)
        i = tu.flatten_dict(init, sep="/")
        f = tu.flatten_dict(final, sep="/")
        return {k: f[k] - i[k] for k in i}

    base = one_step(1.0)
    half = one_step(0.5)
    for k in base:
        if k.startswith("backbone/"):
            # atol: the deltas are read back through f32 params (magnitude
            # up to ~1), so each carries ~eps(1) = 1.2e-7 of quantization.
            np.testing.assert_allclose(half[k], 0.5 * base[k],
                                       rtol=1e-3, atol=3e-7, err_msg=k)
        else:
            np.testing.assert_array_equal(half[k], base[k], err_msg=k)
    assert any(np.abs(v).max() > 0 for k, v in base.items()
               if k.startswith("backbone/"))


def test_train_step_tensor_parallel_detr():
    """dp=4 x tp=2 over 8 fake devices for the transformer family: the
    Megatron attention/FFN rules shard q/k/v/out over heads and fc1/fc2
    column/row over 'model' (optimizer state included), the step runs, and
    the TP layout survives donation."""
    import dataclasses

    from tpudet.config import tiny_detr_config
    from tpudet.models import build_model
    from tpudet.parallel.sharding_rules import shard_train_state

    cfg = tiny_detr_config()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, batch_size=4, learning_rate=1e-3, optimizer="adam",
        warmup_steps=0, checkpoint_every=10**9,
    ))
    model = build_model(cfg)
    mesh = make_mesh(num_data=4, num_model=2)
    state = shard_train_state(
        mesh, create_train_state(model, cfg.train, jax.random.key(0))
    )
    qkv = state.params["enc0"]["self_attn"]["query"]["kernel"]
    ffn = state.params["dec1"]["ffn"]["fc1"]["kernel"]
    out = state.params["dec0"]["cross_attn"]["out"]["kernel"]
    for leaf in (qkv, ffn, out):
        assert not leaf.sharding.is_fully_replicated

    step = make_train_step(model, cfg, mesh=mesh, state_example=state)
    raw = make_train_batch(cfg, b=4)
    batch = device_preprocess(cfg, raw, jax.random.key(0), training=False)
    batch = shard_batch(mesh, batch)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    qkv = state.params["enc0"]["self_attn"]["query"]["kernel"]
    assert not qkv.sharding.is_fully_replicated
    # Backbone and the tiny class head stay replicated.
    stem = jax.tree_util.tree_leaves(state.params["backbone"])[0]
    assert stem.sharding.is_fully_replicated
    assert state.params["class_head"]["kernel"].sharding.is_fully_replicated
