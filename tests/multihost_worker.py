"""Worker process for the real multi-process jax.distributed test.

Launched N times by tests/test_multihost.py (and usable standalone):

    python tests/multihost_worker.py <process_id> <num_processes> <port>

Each process contributes 2 virtual CPU devices; the global mesh spans all
processes (the N>=2 hosts scaling point of BASELINE.md), and the FULL
sharded wideband training step — ppermute halo exchange, channel
all-to-all, psum gradients — runs over it, with the cross-shard
collectives crossing real process boundaries.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from cognitive_radio_network_tpu.parallel import multihost

    multihost.initialize(f"127.0.0.1:{port}", nprocs, pid)
    assert jax.process_count() == nprocs, jax.process_count()
    assert multihost.is_distributed()

    import numpy as np

    from cognitive_radio_network_tpu.models.distributed import make_sharded_train_step
    from cognitive_radio_network_tpu.parallel import MeshSpec, WidebandConfig
    from cognitive_radio_network_tpu.parallel.multihost import global_mesh

    n_global = 2 * nprocs
    spec = MeshSpec(time=2, channel=n_global // 2)
    mesh = global_mesh(spec)
    assert mesh.devices.size == n_global

    cfg = WidebandConfig(num_channels=8, taps_per_channel=4, block_len=16)
    m = cfg.num_channels
    t_total = spec.time * 2 * cfg.block_len
    b, c = 2, t_total // cfg.block_len

    rng = np.random.default_rng(0)  # same seed everywhere -> same global data
    planes = rng.standard_normal((b, t_total * m, 2)).astype(np.float32)
    labels = rng.integers(0, 2, (b, c, m)).astype(np.float32)

    from jax.sharding import NamedSharding, PartitionSpec as P

    def globalize(arr, pspec):
        sharding = NamedSharding(mesh, pspec)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    # same axis resolution as make_sharded_train_step (absent axes -> None)
    data_ax = "data" if "data" in mesh.axis_names else None
    time_ax = "time" if "time" in mesh.axis_names else None
    g_planes = globalize(planes, P(data_ax, time_ax))
    g_labels = globalize(labels, P(data_ax))

    init_fn, step_fn = make_sharded_train_step(mesh, cfg)
    state = init_fn(jax.random.key(0))
    state, loss = step_fn(state, g_planes, g_labels)
    loss_val = float(np.asarray(loss))  # replicated -> fully addressable
    assert np.isfinite(loss_val)
    multihost.host_local_sync(7)
    print(f"MHOK pid={pid} procs={nprocs} loss={loss_val:.6f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
