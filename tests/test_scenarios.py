"""Scenario-level integration tests: the predictive sense->retune loop and
interferer behavior, mirroring the reference's scenario-as-test strategy
(SURVEY.md §4) but automated and deterministic."""

import numpy as np
import pytest

from cognitive_radio_network_tpu.runtime import (
    NodeConfig,
    ScenarioConfig,
    ScenarioRuntime,
)


def _predictive_scenario(run_time=0.45, pu_engine="CE_TX_CHANNEL_X", pu_args="-c 1"):
    """PU transmitting on a channel + CE_Predictive_Node SU sensing
    fc=833 MHz / 13 MS/s (the reference predictive_model scenario shape)."""
    pu = NodeConfig(
        cognitive_engine=pu_engine,
        ce_args=pu_args,
        ce_timeout_ms=50.0,
        net_mean_throughput=3e6,
        tx_freq=833e6,
        tx_rate=1.3e6,
        tx_gain=33.0,
        rx_freq=870e6,
        rx_rate=1e6,
    )
    su = NodeConfig(
        cognitive_engine="CE_Predictive_Node",
        ce_timeout_ms=10.0,
        net_mean_throughput=1e6,
        tx_freq=833e6,
        tx_rate=1e6,
        tx_gain=25.0,
        rx_freq=833e6,
        rx_rate=13e6,
    )
    return ScenarioConfig(
        num_nodes=2,
        run_time=run_time,
        nodes=[pu, su],
        medium_rate=13e6,
        medium_center=833e6,
        medium_block_len=65536,
        medium_noise_power=1e-7,
        name="predictive_test",
    )


class TestPredictiveScenario:
    def test_su_detects_pu_and_retunes(self):
        """PU parked on CH1 (833 MHz) -> the predictive SU must decide
        'channel 1 occupied' and retune its tx to CH2 = 835 MHz
        (CE_Predictive_Node.cpp:245-248)."""
        rt = ScenarioRuntime(_predictive_scenario())
        rt.run()
        su = rt.nodes[1]
        eng = su.engine
        assert len(eng.decisions) >= 2, f"only {len(eng.decisions)} sense cycles ran"
        # PU occupies CH1 continuously; dominant decision must be 1
        from collections import Counter

        common = Counter(eng.decisions).most_common(1)[0][0]
        assert common == 1, f"decisions={eng.decisions}"
        assert su.radio.get_tx_freq() == 835e6

    def test_su_follows_pu_channel_3(self):
        rt = ScenarioRuntime(
            _predictive_scenario(pu_engine="CE_TX_CHANNEL_X", pu_args="-c 3")
        )
        rt.run()
        eng = rt.nodes[1].engine
        from collections import Counter

        common = Counter(eng.decisions).most_common(1)[0][0]
        assert common == 3, f"decisions={eng.decisions}"
        # decision 3 -> CHANNEL2 (CE_Predictive_Node.cpp:255-258)
        assert rt.nodes[1].radio.get_tx_freq() == 835e6


class TestInterfererScenario:
    def test_cw_interferer_occupies_band(self):
        """A CW interferer at 835 MHz must drive the predictive SU's CH2
        energy up (sensed via its decisions)."""
        cfg = _predictive_scenario(run_time=0.35)
        cfg.nodes[0] = NodeConfig(
            node_type="interferer",
            interference_type="cw",
            period=1.0,
            duty_cycle=1.0,
            tx_freq=835e6,
            tx_rate=1e6,
            tx_gain_soft=18.0,
        )
        rt = ScenarioRuntime(cfg)
        rt.run()
        eng = rt.nodes[1].engine
        assert len(eng.decisions) >= 2
        from collections import Counter

        common = Counter(eng.decisions).most_common(1)[0][0]
        assert common == 2, f"decisions={eng.decisions}"

    def test_interferer_sweep_hops(self):
        from cognitive_radio_network_tpu.env.interference import InterfererConfig
        from cognitive_radio_network_tpu.runtime.node import InterfererNode

        node = InterfererNode(
            0,
            13e6,
            833e6,
            InterfererConfig(
                interference_type="noise",
                tx_freq_behavior="sweep",
                tx_freq_hz=833e6,
                tx_freq_min_hz=833e6,
                tx_freq_max_hz=838e6,
                tx_freq_dwell_s=0.001,
                tx_freq_resolution_hz=1e6,
            ),
        )
        node.start()
        freqs = []
        for _ in range(80):
            node.pull_tx_block(16384)
            freqs.append(node.tx_freq)
        # swept up and reflected back
        assert max(freqs) >= 838e6 and min(freqs) <= 834e6
        assert len(set(freqs)) >= 5


class TestTrainedWeightsDeployment:
    def test_train_checkpoint_deploy_roundtrip(self, tmp_path):
        """Train the classifier on synthetic scenes, checkpoint it (with the
        feature transform recorded), load it into CE_Predictive_Node via
        `-w`, and verify it still detects a parked PU and retunes."""
        import jax
        import jax.numpy as jnp

        from cognitive_radio_network_tpu.io.checkpoint import (
            load_mlp_with_meta,
            save_mlp,
        )
        from cognitive_radio_network_tpu.models.train import (
            TrainConfig,
            fit,
            make_dataset,
        )

        feats, labels = make_dataset(jax.random.key(0), 400)
        # enough steps to push occupied-channel outputs past the reference's
        # 0.8 decision threshold (undertrained nets plateau near ~0.7)
        tcfg = TrainConfig(num_steps=1500, learning_rate=3e-3)
        params, losses = fit(jax.random.key(1), feats, labels, tcfg)
        assert losses[-1] < losses[0]
        ckpt = tmp_path / "mlp.npz"
        save_mlp(ckpt, params, feature_transform="log1p")
        _, meta = load_mlp_with_meta(ckpt)
        assert meta["feature_transform"] == "log1p"

        cfg = _predictive_scenario()
        cfg.nodes[1].ce_args = f"-w {ckpt}"
        rt = ScenarioRuntime(cfg)
        rt.run()
        eng = rt.nodes[1].engine
        assert eng.cfg.feature_transform == "log1p"
        assert len(eng.decisions) >= 2
        # PU parked on CH1 -> trained model must call CH1 occupied
        assert eng.decisions[-1] == 1, eng.decisions
        assert rt.nodes[1].radio.get_tx_freq() == 835e6

    def test_trained_matches_or_beats_reference_on_markov_trace(self):
        """Training parity: a ~400-example train-pipeline checkpoint must
        match or beat the shipped reference weights
        (CE_Predictive_Node.cpp:74-121, trained offline on ~400 examples
        per the reference README.md:104) on a held-out Markov-PU trace.
        The wide power jitter (+-2.5 decades) is what buys the low-SNR
        advantage — see README "Training parity" for the full sweep."""
        import dataclasses

        import jax
        import numpy as np

        from cognitive_radio_network_tpu.env import markov_pu_trace
        from cognitive_radio_network_tpu.env.scene import (
            occupancy_to_powers,
            synthesize_scene,
        )
        from cognitive_radio_network_tpu.models import (
            SenseConfig,
            sense_classify,
        )
        from cognitive_radio_network_tpu.models.train import (
            TrainConfig,
            fit,
            make_dataset,
        )
        from cognitive_radio_network_tpu.signal.mlp import reference_weights

        feats, labels = make_dataset(
            jax.random.key(0), 400, signal_power=0.005, power_jitter_decades=2.5
        )
        params, _ = fit(
            jax.random.key(1), feats, labels, TrainConfig(num_steps=3000)
        )
        cfg = SenseConfig()
        cfg_t = dataclasses.replace(cfg, feature_transform="log1p")
        trace = markov_pu_trace(jax.random.key(42), 256)
        truth = np.asarray(trace) + 1  # decision = occupied channel + 1
        syn = jax.jit(
            synthesize_scene,
            static_argnums=(2,),
            static_argnames=("as_planes",),
        )

        def acc(weights, scfg, iq):
            dec = np.asarray(sense_classify(iq, weights, scfg)["decision"])
            return float(np.mean(dec == truth))

        ref_w = reference_weights()
        for power in (0.05, 5e-3, 5e-4, 2e-4, 1e-4):
            powers = occupancy_to_powers(trace, 3, power=power)
            iq = syn(
                jax.random.key(8), powers, cfg.samples_per_cycle, as_planes=True
            ).reshape(256, cfg.averaging, cfg.fft_length, 2)
            a_ref = acc(ref_w, cfg, iq)
            a_tr = acc(params, cfg_t, iq)
            assert a_tr >= a_ref - 1e-9, (power, a_ref, a_tr)
        # the lowest power is where training with jitter clearly wins
        assert a_tr >= 0.95 and a_ref <= 0.9, (a_ref, a_tr)


class TestManyNodeScenario:
    def test_eight_node_mixed_scenario(self):
        """8 nodes in one medium — 3 FDD radio pairs + 2 interferers (the
        reference supports up to 48 nodes/scenario, include/crts.hpp:189).
        Each pair's link still decodes despite the other transmitters."""
        common = dict(
            cognitive_engine="CE_Template",
            ce_timeout_ms=1000.0,
            net_mean_throughput=200e3,
            tx_rate=1e6,
            rx_rate=1e6,
            tx_gain=20.0,
            rx_gain=20.0,
            tx_gain_soft=-6.0,
        )
        nodes = []
        # pairs at 461/463, 465/467, 469/471 MHz inside a 16 MHz medium
        for base in (461e6, 465e6, 469e6):
            nodes.append(NodeConfig(tx_freq=base, rx_freq=base + 2e6, **common))
            nodes.append(NodeConfig(tx_freq=base + 2e6, rx_freq=base, **common))
        nodes.append(
            NodeConfig(
                node_type="interferer",
                interference_type="cw",
                tx_freq=473e6,
                tx_gain=15.0,
                duty_cycle=0.5,
                period=0.01,
            )
        )
        nodes.append(
            NodeConfig(
                node_type="interferer",
                interference_type="noise",
                tx_freq=459e6,
                tx_gain=10.0,
                tx_freq_behavior="sweep",
                tx_freq_min=458e6,
                tx_freq_max=460e6,
                tx_freq_dwell_time=0.005,
                tx_freq_resolution=0.5e6,
            )
        )
        cfg = ScenarioConfig(
            num_nodes=8,
            run_time=0.08,
            nodes=nodes,
            medium_rate=16e6,
            medium_center=466e6,
            medium_block_len=65536,
            medium_noise_power=1e-8,
            name="eight_node",
        )
        rt = ScenarioRuntime(cfg)
        summary = rt.run()
        assert not rt.failed_nodes, rt.failed_nodes
        for i in range(6):  # every radio both sent and received
            assert summary.bytes_sent[i] > 0
            assert summary.valid_frames[i] > 0, (
                f"node {i}: {summary.valid_frames}"
            )

    def test_forty_eight_node_scenario(self):
        """The reference's node cap: 48 nodes in one scenario
        (include/crts.hpp:189).  8 spatial cells x (2 FDD pairs + 2
        interferers) with frequency reuse across cells — the medium gain
        matrix isolates cells (cross-cell gain 0), which is how a real
        48-node deployment shares spectrum.  Flushes O(N^2) medium and
        per-node bookkeeping issues; wall-time bounded."""
        import time as _time

        common = dict(
            cognitive_engine="CE_Template",
            ce_timeout_ms=1000.0,
            net_mean_throughput=400e3,
            tx_rate=2e6,
            rx_rate=2e6,
            tx_gain=20.0,
            rx_gain=20.0,
            tx_gain_soft=-6.0,
        )
        nodes = []
        cells = 8
        per_cell = 6
        for _cell in range(cells):
            for base in (461e6, 465e6):  # two FDD pairs, reused per cell
                nodes.append(
                    NodeConfig(tx_freq=base, rx_freq=base + 2e6, **common)
                )
                nodes.append(
                    NodeConfig(tx_freq=base + 2e6, rx_freq=base, **common)
                )
            nodes.append(
                NodeConfig(
                    node_type="interferer",
                    interference_type="cw",
                    tx_freq=470e6,
                    tx_gain=10.0,
                    duty_cycle=0.5,
                    period=0.01,
                )
            )
            nodes.append(
                NodeConfig(
                    node_type="interferer",
                    interference_type="noise",
                    tx_freq=459e6,
                    tx_gain=5.0,
                )
            )
        assert len(nodes) == 48
        cfg = ScenarioConfig(
            num_nodes=48,
            run_time=0.05,
            nodes=nodes,
            medium_rate=16e6,
            medium_center=466e6,
            medium_block_len=65536,
            medium_noise_power=1e-8,
            max_wall_time_s=300.0,
            name="forty_eight_node",
        )
        rt = ScenarioRuntime(cfg)
        gains = np.zeros((48, 48), np.float32)
        for c in range(cells):
            s = c * per_cell
            gains[s : s + per_cell, s : s + per_cell] = 1.0
        np.fill_diagonal(gains, 0.0)
        rt.medium.gains = gains
        t0 = _time.monotonic()
        summary = rt.run()
        wall = _time.monotonic() - t0
        assert not rt.failed_nodes, rt.failed_nodes
        assert not rt.terminated, f"hit wall-clock guard after {wall:.0f}s"
        radios = [i for i in range(48) if i % per_cell < 4]
        assert len(radios) == 32
        for i in radios:
            assert summary.bytes_sent[i] > 0, f"node {i} sent nothing"
        decoded = sum(1 for i in radios if summary.valid_frames[i] > 0)
        # every in-cell link is clean (cross-cell gain is 0); allow a
        # couple of stragglers whose first frame straddles the run end
        assert decoded >= 30, (decoded, summary.valid_frames)
