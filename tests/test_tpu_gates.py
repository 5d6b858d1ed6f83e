"""Hardware correctness gates as a first-class test target.

Run on the real chip:  CRN_TPU_TESTS=1 timeout 550 python -m pytest -m tpu -q

CRN_TPU_TESTS=1 stops tests/conftest.py from pinning the platform to the
virtual CPU mesh, so these run on the ambient backend (the tunneled TPU).
Without it (the normal suite) they are SKIPPED — on CPU they would only
re-test what the golden unit tests already cover.  bench.py imports the
same gate helpers (tests/tpu_gates.py), so bench numbers stay gated on
on-chip correctness either way.
"""

import jax
import numpy as np
import pytest

import tpu_gates

requires_tpu = pytest.mark.skipif(
    jax.default_backend() in ("cpu", "gpu"),
    reason="needs the real TPU backend (CRN_TPU_TESTS=1 pytest -m tpu)",
)


@pytest.mark.tpu
@requires_tpu
class TestOnChipGates:
    def test_fused_sense_matches_golden(self):
        tpu_gates.gate_fused_sense(np.random.default_rng(0))

    def test_fused_wideband_matches_numpy_oracle(self):
        tpu_gates.gate_fused_wideband(np.random.default_rng(0))

    def test_ofdm_block_decode_intact(self):
        tpu_gates.gate_ofdm_decode(np.random.default_rng(0))

    def test_fused_wideband_history_seed(self):
        tpu_gates.gate_sharded_wideband_history(np.random.default_rng(1))

    def test_adaptive_stream_decodes_on_chip(self):
        """The fused adaptive streaming step (in-graph resolution +
        speculative decode + device residual) on real hardware."""
        tpu_gates.gate_adaptive_stream(np.random.default_rng(5))

    def test_perf_floors(self):
        """~10 s perf smoke: the chip numbers must not silently collapse
        (floors are generous — far below normal variance, far above any
        real regression; tpu_gates.PERF_FLOORS, shared with bench.py)."""
        tpu_gates.gate_perf_floors(np.random.default_rng(2))

    def test_scenario_nodes_survive_ambient_backend(self):
        """Round-4 regression: under the ambient TPU backend, the scenario
        runtime's phy_placement="host" context must route kernel selection
        to the CPU device (utils/platform.effective_platform) — with
        backend-keyed selection, every node died at t=0 with "Only
        interpret mode is supported on CPU backend" and the realtime
        factor silently measured an empty scenario."""
        from pathlib import Path

        from cognitive_radio_network_tpu.runtime.config import load_scenario
        from cognitive_radio_network_tpu.runtime.controller import (
            ScenarioRuntime,
        )

        cfg = load_scenario(
            Path(__file__).parent.parent / "scenarios" / "predictive_model.cfg"
        )
        cfg.run_time = 0.4
        rt = ScenarioRuntime(cfg)
        rt.run()
        assert not rt.failed_nodes, rt.failed_nodes
        assert len(getattr(rt.nodes[1].engine, "decisions", [])) > 0
