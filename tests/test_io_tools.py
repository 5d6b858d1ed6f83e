"""io (IQ files, checkpoints) + tools (spectrum analyzer) + training tests."""

import numpy as np
import jax
import jax.numpy as jnp

from cognitive_radio_network_tpu.io import (
    IQReader,
    IQWriter,
    StreamCursor,
    load_mlp,
    save_mlp,
    load_state,
    save_state,
)
from cognitive_radio_network_tpu.signal.mlp import reference_weights, init_mlp
from cognitive_radio_network_tpu.tools import spectrum_analyzer as sa


class TestIQFiles:
    def test_roundtrip_and_meta(self, tmp_path, rng):
        iq = (rng.standard_normal(1000) + 1j * rng.standard_normal(1000)).astype(
            np.complex64
        )
        p = tmp_path / "cap.iq"
        with IQWriter(p, 13e6, 833e6) as w:
            w.write(iq)
        r = IQReader(p)
        assert r.sample_rate_hz == 13e6 and r.center_hz == 833e6
        assert r.num_samples == 1000
        got = r.read(1000, as_planes=False)
        np.testing.assert_allclose(got, iq, rtol=1e-6)

    def test_cursor_resume(self, tmp_path, rng):
        iq = (rng.standard_normal(600) + 1j * rng.standard_normal(600)).astype(
            np.complex64
        )
        p = tmp_path / "cap.iq"
        with IQWriter(p, 1e6, 0.0) as w:
            w.write(iq)
        r1 = IQReader(p)
        a = r1.read(200, as_planes=False)
        r1.cursor.save(tmp_path / "cursor.json")
        # resume in a "new process"
        r2 = IQReader(p, StreamCursor.load(tmp_path / "cursor.json"))
        b = r2.read(400, as_planes=False)
        np.testing.assert_allclose(np.concatenate([a, b]), iq, rtol=1e-6)

    def test_blocks_iterator(self, tmp_path, rng):
        iq = (rng.standard_normal(1024) + 1j * rng.standard_normal(1024)).astype(
            np.complex64
        )
        p = tmp_path / "cap.iq"
        with IQWriter(p, 1e6, 0.0) as w:
            w.write(iq)
        blocks = list(IQReader(p).blocks(256))
        assert len(blocks) == 4 and blocks[0].shape == (256, 2)


class TestCheckpoint:
    def test_mlp_roundtrip(self, tmp_path):
        params = reference_weights()
        save_mlp(tmp_path / "p.npz", params)
        loaded = load_mlp(tmp_path / "p.npz")
        for a, b in zip(params, loaded):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_state_tree_roundtrip(self, tmp_path):
        import optax

        from cognitive_radio_network_tpu.models.train import TrainState

        params = init_mlp(jax.random.key(0))
        opt = optax.adam(1e-3)
        state = TrainState(params, opt.init(params), jnp.int32(7))
        save_state(tmp_path / "s.npz", state)
        restored = load_state(tmp_path / "s.npz", state)
        assert int(restored.step) == 7
        np.testing.assert_array_equal(
            np.asarray(restored.params.w1), np.asarray(params.w1)
        )


class TestSpectrumAnalyzer:
    def test_waterfall_tone(self, rng):
        cfg = sa.SpectrumConfig(fft_length=256, average=4, sample_rate_hz=1e6, center_hz=0.0)
        n = 256 * 4 * 6
        tone = np.exp(2j * np.pi * 0.25 * np.arange(n)).astype(np.complex64)
        tone += 0.001 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
        wf = np.asarray(sa.waterfall(jnp.asarray(tone), cfg))
        assert wf.shape == (6, 256)
        peak_bin = wf.mean(axis=0).argmax()
        f = sa.freq_axis_hz(cfg)
        assert abs(f[peak_bin] - 0.25e6) < 2 * 1e6 / 256

    def test_psd_and_ascii(self, rng):
        cfg = sa.SpectrumConfig(fft_length=128, average=2, sample_rate_hz=1e6)
        x = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)).astype(
            np.complex64
        )
        p = np.asarray(sa.psd(jnp.asarray(x), cfg))
        assert p.shape == (128,)
        art = sa.render_ascii(np.asarray(sa.waterfall(jnp.asarray(x), cfg)))
        assert len(art.splitlines()) >= 1

    def test_700M_variant_defaults(self):
        assert sa.BAND_700M.center_hz == 766e6
        assert sa.BAND_700M.sample_rate_hz == 10e6


class TestTraining:
    def test_fit_learns_synthetic_dataset(self):
        from cognitive_radio_network_tpu.models.train import (
            TrainConfig,
            fit,
            make_dataset,
        )
        from cognitive_radio_network_tpu.signal.mlp import mlp_forward

        feats, labels = make_dataset(jax.random.key(0), num_examples=200)
        params, losses = fit(
            jax.random.key(1),
            feats,
            labels,
            TrainConfig(num_steps=600, learning_rate=1e-2),
        )
        assert losses[-1] < losses[0] * 0.5
        preds = mlp_forward(params, jnp.log1p(feats)) > 0.5
        acc = float(jnp.mean(preds == (labels > 0.5)))
        assert acc > 0.9, f"accuracy {acc}"


class TestSenseCLI:
    def test_sense_capture_roundtrip(self, tmp_path):
        """Generate a Markov-PU capture, stream it through the `sense` CLI
        (native prefetcher when available), and check the decisions track
        the PU trace and the cursor supports resume."""
        import jax
        import numpy as np

        from cognitive_radio_network_tpu.__main__ import main as cli_main
        from cognitive_radio_network_tpu.env import markov_pu_trace
        from cognitive_radio_network_tpu.env.scene import (
            occupancy_to_powers,
            synthesize_scene,
        )
        from cognitive_radio_network_tpu.io.iq import IQWriter
        from cognitive_radio_network_tpu.models import SenseConfig

        cfg = SenseConfig()
        c = 64
        trace = np.asarray(markov_pu_trace(jax.random.key(5), c))
        powers = occupancy_to_powers(jax.numpy.asarray(trace), 3, power=0.05)
        iq = synthesize_scene(
            jax.random.key(2), powers, cfg.samples_per_cycle, as_planes=True
        )
        cap = tmp_path / "cap.iq"
        with IQWriter(cap, 13e6, 833e6) as w:
            w.write(np.asarray(iq).reshape(-1, 2))

        out = tmp_path / "out.npz"
        cursor = tmp_path / "cursor.json"
        rc = cli_main(
            ["sense", str(cap), "-o", str(out), "-c", "32", "--cursor", str(cursor)]
        )
        assert rc == 0
        data = np.load(out)
        np.testing.assert_array_equal(data["decision"], trace + 1)
        assert len(data["tx_freq"]) == c
        # cursor advanced to the end; resuming senses nothing new
        import json

        assert json.loads(cursor.read_text())["sample_index"] == c * 5120
        rc2 = cli_main(["sense", str(cap), "--cursor", str(cursor)])
        assert rc2 == 1  # nothing left to sense


class TestMasterCLI:
    def test_master_runs_scenarios(self, tmp_path):
        """The master CLI parses a master file and runs its scenario list
        (regression: a local pathlib import used to shadow Path for every
        non-export branch)."""
        (tmp_path / "mini.cfg").write_text(
            'num_nodes = 1;\nrun_time = 0.01;\n'
            'node1 : { node_type = "cognitive radio"; };\n'
        )
        (tmp_path / "master.cfg").write_text(
            "num_scenarios = 1;\nreps_all_scenarios = 1;\n"
            'scenario_1 = "mini";\n'
        )
        from cognitive_radio_network_tpu.__main__ import main as cli_main

        rc = cli_main(
            ["master", str(tmp_path / "master.cfg"), "-l", str(tmp_path / "logs")]
        )
        assert rc == 0


class TestLiveMonitor:
    """The runtime-tunable live waterfall (the reference QT GUI's
    interactivity, spectrum_analyzer.py:489-533): key handling and frame
    production are pure methods, tested without a tty."""

    def _monitor(self):
        from cognitive_radio_network_tpu.tools.spectrum_analyzer import (
            BAND_800M,
            LiveMonitor,
            scene_source,
        )

        return LiveMonitor(scene_source(seed=3), BAND_800M, height=8)

    def test_keys_retune_like_the_reference_gui(self):
        m = self._monitor()
        f0, r0 = m.cfg.center_hz, m.cfg.sample_rate_hz
        m.handle_key("F")
        assert m.cfg.center_hz == f0 + m.FREQ_STEP_HZ
        m.handle_key("f")
        m.handle_key("f")
        assert m.cfg.center_hz == f0 - m.FREQ_STEP_HZ
        m.handle_key("R")
        assert m.cfg.sample_rate_hz == 2 * r0
        m.handle_key("g")
        assert m.gain_db == -5.0
        m.handle_key(" ")
        assert m.paused
        m.handle_key("q")
        assert m.done

    def test_step_renders_and_advances(self):
        m = self._monitor()
        frame1 = m.step(width=60)
        assert "fc=833.0 MHz" in frame1
        assert "rate=13.0 MS/s" in frame1
        rows_after = m._rows.copy()
        # PAUSED: the waterfall must freeze while the header updates
        m.handle_key(" ")
        frame2 = m.step(width=60)
        assert "[PAUSED]" in frame2
        np.testing.assert_array_equal(m._rows, rows_after)
        # resume + retune: header reflects the new tuning
        m.handle_key(" ")
        m.handle_key("F")
        frame3 = m.step(width=60)
        assert "fc=834.0 MHz" in frame3
        # the scene has real occupancancy: rendered rows are not blank
        body = frame3.split("\n", 1)[1]
        assert any(c != " " for c in body)

    def test_run_headless_without_tty(self, capsys):
        # stdin is not a tty under pytest: run() must degrade to plain
        # frame printing and stop at max_steps
        m = self._monitor()
        m.run(max_steps=2, interval_s=0.0)
        out = capsys.readouterr().out
        assert out.count("fc=833.0 MHz") == 2
