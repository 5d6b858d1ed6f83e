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
