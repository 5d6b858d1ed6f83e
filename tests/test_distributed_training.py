"""Sharded wideband training: convergence + mesh-invariance tests."""

import numpy as np
import jax
import jax.numpy as jnp

from cognitive_radio_network_tpu.models.distributed import (
    make_sharded_apply,
    make_sharded_train_step,
    wideband_features,
)
from cognitive_radio_network_tpu.parallel import MeshSpec, WidebandConfig, make_mesh
from cognitive_radio_network_tpu.signal.iq import to_planes


def _make_batch(rng, cfg, b, t_total, tone_amp=1.0):
    """Batch of wide streams with random per-cycle-constant channel activity."""
    m = cfg.num_channels
    c = t_total // cfg.block_len
    labels = rng.integers(0, 2, (b, 1, m)).repeat(c, axis=1).astype(np.float32)
    x = 0.01 * (
        rng.standard_normal((b, t_total * m)) + 1j * rng.standard_normal((b, t_total * m))
    ).astype(np.complex64)
    n = np.arange(t_total * m)
    for i in range(b):
        for k in range(m):
            if labels[i, 0, k]:
                x[i] += tone_amp * np.exp(2j * np.pi * (k / m) * n + 1j * rng.uniform(0, 6.28))
    return jnp.asarray(to_planes(x)), jnp.asarray(labels)


class TestShardedTraining:
    def test_loss_decreases_and_classifies(self, rng):
        cfg = WidebandConfig(num_channels=8, taps_per_channel=4, block_len=32)
        mesh = make_mesh(MeshSpec(time=2, channel=2, data=2))
        init_fn, step_fn = make_sharded_train_step(mesh, cfg, learning_rate=3e-2)
        state = init_fn(jax.random.key(0))

        t_total = 4 * cfg.block_len
        planes, labels = _make_batch(rng, cfg, b=8, t_total=t_total)
        losses = []
        for _ in range(150):
            state, loss = step_fn(state, planes, labels)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.5
        assert losses[-1] < 0.2

        apply_fn = make_sharded_apply(mesh, cfg)
        probs = np.asarray(apply_fn(state.params, planes))
        acc = np.mean((probs > 0.5) == (np.asarray(labels) > 0.5))
        assert acc > 0.95

    def test_mesh_invariance(self, rng):
        """Same data, same init: 1-device and 8-device meshes give the same
        loss (the sharded graph is numerically equivalent)."""
        cfg = WidebandConfig(num_channels=8, taps_per_channel=4, block_len=16)
        t_total = 2 * cfg.block_len
        planes, labels = _make_batch(rng, cfg, b=4, t_total=t_total)

        results = []
        for spec in [MeshSpec(), MeshSpec(time=2, channel=2, data=2)]:
            mesh = make_mesh(spec)
            init_fn, step_fn = make_sharded_train_step(mesh, cfg)
            state = init_fn(jax.random.key(1))
            _, loss = step_fn(state, planes, labels)
            results.append(float(loss))
        np.testing.assert_allclose(results[0], results[1], rtol=1e-5)


class TestWidebandFeatures:
    def test_neighbor_wrap(self):
        e = jnp.arange(8, dtype=jnp.float32)[None, None, :]  # (1,1,8)
        nf = jnp.zeros((1, 1, 1))
        f = np.asarray(wideband_features(e, nf))[0, 0]
        assert f[0, 1] == 7  # left neighbor of channel 0 wraps to 7
        assert f[7, 3] == 0  # right neighbor of channel 7 wraps to 0
        assert (f[:, 2] == np.arange(8)).all()
