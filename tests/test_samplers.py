import numpy as np
import jax
import jax.numpy as jnp

from tpudet.ops.samplers import sample_balanced


def test_sampler_balanced_counts():
    labels = jnp.asarray([1] * 30 + [0] * 500 + [-1] * 100)
    idx, is_pos, valid = sample_balanced(labels, jax.random.key(0), 64, 0.5)
    idx, is_pos, valid = map(np.asarray, (idx, is_pos, valid))
    assert valid.all()
    # 30 positives < 32 cap -> all sampled; rest negatives.
    assert is_pos.sum() == 30
    lab = np.asarray(labels)[idx]
    assert (lab[is_pos] == 1).all()
    assert (lab[~is_pos] == 0).all()
    assert len(set(idx.tolist())) == 64  # no duplicates


def test_sampler_caps_positives():
    labels = jnp.asarray([1] * 200 + [0] * 200)
    idx, is_pos, valid = sample_balanced(labels, jax.random.key(1), 64, 0.25)
    assert int(np.asarray(is_pos).sum()) == 16
    assert np.asarray(valid).all()


def test_sampler_few_candidates():
    labels = jnp.asarray([1, 0, -1, -1, -1, -1, -1, -1])
    idx, is_pos, valid = sample_balanced(labels, jax.random.key(2), 4, 0.5)
    valid = np.asarray(valid)
    assert valid.sum() == 2
    picked = set(np.asarray(idx)[valid].tolist())
    assert picked == {0, 1}


def test_sampler_randomizes_across_keys():
    labels = jnp.asarray([1] * 100 + [0] * 100)
    a = np.asarray(sample_balanced(labels, jax.random.key(0), 32, 0.5)[0])
    b = np.asarray(sample_balanced(labels, jax.random.key(1), 32, 0.5)[0])
    assert set(a.tolist()) != set(b.tolist())
