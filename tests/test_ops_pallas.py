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


class TestFusedSenseCT:
    """The Cooley-Tukey fused sense kernel (ops/fused_sense_ct.py)."""

    def _ref(self, iq_planes):
        avg = averaged_magnitude_spectrum(
            jnp.asarray(iq_planes), mode="dft_matmul", precision="highest"
        )
        return np.asarray(avg), np.asarray(band_features(avg))

    def test_matches_xla_reference(self, rng):
        from cognitive_radio_network_tpu.ops.fused_sense_ct import fused_sense_ct

        iq = rng.standard_normal((7, 10, 512, 2)).astype(np.float32)
        want_avg, want_feats = self._ref(iq)
        avg, feats = fused_sense_ct(jnp.asarray(iq), tile_c=4, interpret=True)
        np.testing.assert_allclose(np.asarray(avg), want_avg, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(feats), want_feats, rtol=1e-4)

    def test_planar_2d_layout_matches(self, rng):
        """Buffers-flat planar (C*A, N) tuple — the zero-relayout fast path —
        produces identical results to interleaved planes."""
        from cognitive_radio_network_tpu.ops.fused_sense_ct import fused_sense_ct

        iq = rng.standard_normal((8, 10, 512, 2)).astype(np.float32)
        xr = np.ascontiguousarray(iq[..., 0]).reshape(-1, 512)
        xi = np.ascontiguousarray(iq[..., 1]).reshape(-1, 512)
        a_pl, f_pl = fused_sense_ct(
            (jnp.asarray(xr), jnp.asarray(xi)), tile_c=4, interpret=True
        )
        a_il, f_il = fused_sense_ct(jnp.asarray(iq), tile_c=4, interpret=True)
        np.testing.assert_array_equal(np.asarray(a_pl), np.asarray(a_il))
        np.testing.assert_array_equal(np.asarray(f_pl), np.asarray(f_il))

    def test_cycle_padding(self, rng):
        """C not a multiple of tile_c is padded internally and sliced back."""
        from cognitive_radio_network_tpu.ops.fused_sense_ct import fused_sense_ct

        iq = rng.standard_normal((5, 10, 512, 2)).astype(np.float32)
        avg, feats = fused_sense_ct(jnp.asarray(iq), tile_c=4, interpret=True)
        assert avg.shape == (5, 512) and feats.shape == (5, 4)
        want_avg, want_feats = self._ref(iq)
        np.testing.assert_allclose(np.asarray(feats), want_feats, rtol=1e-4)

    def test_ct_xla_mode_matches_dense(self, rng):
        """signal/fft.py mode='ct_matmul' == dense DFT matmul (pure XLA)."""
        iq = rng.standard_normal((4, 10, 512, 2)).astype(np.float32)
        dense = averaged_magnitude_spectrum(
            jnp.asarray(iq), mode="dft_matmul", precision="highest"
        )
        ct = averaged_magnitude_spectrum(
            jnp.asarray(iq), mode="ct_matmul", precision="highest"
        )
        np.testing.assert_allclose(
            np.asarray(ct), np.asarray(dense), rtol=1e-4, atol=1e-5
        )

    def test_sense_classify_planar_equals_planes(self, rng):
        """The full pipeline accepts planar tuples and agrees bit-for-bit on
        decisions with the planes path (CPU: both use the XLA graph)."""
        from cognitive_radio_network_tpu.models import SenseConfig, sense_classify
        from cognitive_radio_network_tpu.signal.mlp import reference_weights

        cfg = SenseConfig()
        iq = rng.standard_normal((6, 10, 512, 2)).astype(np.float32) * 0.1
        xr = np.ascontiguousarray(iq[..., 0]).reshape(-1, 512)
        xi = np.ascontiguousarray(iq[..., 1]).reshape(-1, 512)
        params = reference_weights()
        r1 = sense_classify(jnp.asarray(iq), params, cfg)
        r2 = sense_classify((jnp.asarray(xr), jnp.asarray(xi)), params, cfg)
        np.testing.assert_array_equal(
            np.asarray(r1["decision"]), np.asarray(r2["decision"])
        )
        np.testing.assert_allclose(
            np.asarray(r1["features"]), np.asarray(r2["features"]), rtol=1e-5
        )

    def test_bf16_input_mode(self, rng):
        """bf16 planar ingest (half HBM traffic) stays within ~1% of the
        f32 reference features — inside any SDR ADC's noise floor."""
        from cognitive_radio_network_tpu.ops.fused_sense_ct import fused_sense_ct

        iq = rng.standard_normal((4, 10, 512, 2)).astype(np.float32)
        xr = np.ascontiguousarray(iq[..., 0]).reshape(-1, 512)
        xi = np.ascontiguousarray(iq[..., 1]).reshape(-1, 512)
        _, want = fused_sense_ct(
            (jnp.asarray(xr), jnp.asarray(xi)), tile_c=4, interpret=True
        )
        xr16 = jnp.asarray(xr).astype(jnp.bfloat16)
        xi16 = jnp.asarray(xi).astype(jnp.bfloat16)
        _, got = fused_sense_ct(
            (xr16, xi16), tile_c=4, precision="default", interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-2
        )


class TestExtractWindows:
    """Dynamic-offset window extraction (ops/extract.py) — the DMA gather
    feeding the OFDM rx graphs.  CPU runs the dynamic-slice fallback; the
    Pallas path is exercised on TPU (same contract)."""

    def test_rows_match_slices(self, rng):
        from cognitive_radio_network_tpu.ops.extract import extract_windows

        n, wlen = 50000, 470
        rr = rng.standard_normal(n).astype(np.float32)
        ri = rng.standard_normal(n).astype(np.float32)
        offs = rng.integers(0, n - wlen, 13).astype(np.int32)
        wr, wi = extract_windows(jnp.asarray(rr), jnp.asarray(ri), jnp.asarray(offs), wlen)
        for k, o in enumerate(offs):
            np.testing.assert_array_equal(np.asarray(wr)[k], rr[o : o + wlen])
            np.testing.assert_array_equal(np.asarray(wi)[k], ri[o : o + wlen])

    def test_offsets_clipped(self, rng):
        from cognitive_radio_network_tpu.ops.extract import extract_windows

        n, wlen = 4096, 512
        rr = rng.standard_normal(n).astype(np.float32)
        ri = rng.standard_normal(n).astype(np.float32)
        offs = np.asarray([-7, n - 3, n + 100, 0], np.int32)
        wr, _ = extract_windows(jnp.asarray(rr), jnp.asarray(ri), jnp.asarray(offs), wlen)
        for k, o in enumerate(offs):
            oc = min(max(int(o), 0), n - wlen)
            np.testing.assert_array_equal(np.asarray(wr)[k], rr[oc : oc + wlen])


class TestFusedWideband:
    """The fused wideband energy kernel (ops/fused_wideband.py)."""

    def _case(self, rng, t_chan, tile_q, precision="highest"):
        from cognitive_radio_network_tpu.ops.fused_wideband import (
            wideband_energy_fused,
        )
        from cognitive_radio_network_tpu.parallel.wideband import (
            WidebandConfig,
            wideband_energy_packed,
        )
        from cognitive_radio_network_tpu.signal.channelizer import polyphase_taps

        cfg = WidebandConfig()
        taps = jnp.asarray(polyphase_taps(64, 8))
        xr = jnp.asarray(rng.standard_normal(t_chan * 64).astype(np.float32))
        xi = jnp.asarray(rng.standard_normal(t_chan * 64).astype(np.float32))
        got = wideband_energy_fused(
            xr, xi, taps, cfg, precision=precision, tile_q=tile_q,
            interpret=True,
        )
        want = wideband_energy_packed(xr, xi, taps, cfg, precision="highest")
        return np.asarray(got), np.asarray(want)

    def test_matches_packed_reference(self, rng):
        """One tile: FIR from rest + DFT + energy means match the XLA path."""
        got, want = self._case(rng, t_chan=1024, tile_q=512)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)

    def test_halo_seam_across_tiles(self, rng):
        """Multiple tiles: the 4-row pair halo carries the FIR state so
        cycle boundaries falling on tile seams are bit-continuous."""
        got, want = self._case(rng, t_chan=4096, tile_q=512)
        assert got.shape == want.shape == (32, 64)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)

    def test_bf16_3x_close(self, rng):
        got, want = self._case(rng, t_chan=1024, tile_q=512, precision="high")
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)

    def test_shape_constraints(self):
        from cognitive_radio_network_tpu.ops.fused_wideband import (
            wideband_energy_fused,
        )
        from cognitive_radio_network_tpu.parallel.wideband import WidebandConfig

        cfg = WidebandConfig()
        taps = np.zeros((8, 64), np.float32)
        x = jnp.zeros(1000 * 64, jnp.float32)
        try:
            wideband_energy_fused(x, x, taps, cfg, tile_q=512)
            assert False, "expected ValueError"
        except ValueError as e:
            assert "tiles" in str(e)
