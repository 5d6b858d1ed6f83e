"""Pallas kernel tests (interpreter mode on the CPU test mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import cognitive_radio_network_tpu.ops.fused_sense as fsops
from cognitive_radio_network_tpu.signal.bands import band_features
from cognitive_radio_network_tpu.signal.fft import averaged_magnitude_spectrum


def test_fused_band_features_matches_xla(rng, monkeypatch):
    # run the kernel in interpreter mode (no TPU in unit tests)
    orig = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        kw.pop("cost_estimate", None)
        return orig(*args, **kw)

    monkeypatch.setattr(fsops.pl, "pallas_call", interp_call)

    iq = rng.standard_normal((16, 10, 512, 2)).astype(np.float32)
    want = np.asarray(
        band_features(averaged_magnitude_spectrum(jnp.asarray(iq), precision="highest"))
    )
    got = np.asarray(fsops.fused_band_features(jnp.asarray(iq), tile_c=8))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_tile_divisibility_error(rng):
    iq = jnp.zeros((10, 10, 512, 2), jnp.float32)
    try:
        fsops.fused_band_features(iq, tile_c=16)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "multiple" in str(e)
