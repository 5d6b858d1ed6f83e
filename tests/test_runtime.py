"""Runtime layer tests: traffic, stats, config, and the two-node link."""

import numpy as np
import pytest

from cognitive_radio_network_tpu.runtime import (
    CrtsParam,
    LogSink,
    NodeConfig,
    ScenarioConfig,
    ScenarioRuntime,
    TrafficConfig,
    TrafficSource,
    engine_names,
    controller_names,
    parse_cfg,
    scenario_from_dict,
)
from cognitive_radio_network_tpu.runtime.stats import RxStatistics


class TestTraffic:
    def test_stream_pacing(self):
        src = TrafficSource(TrafficConfig("stream", mean_throughput_bps=2048e3))
        # 2048 bits/packet at 2.048 Mb/s -> 1000 packets/s
        pkts = src.packets_until(0.1)
        assert len(pkts) in (100, 101)  # t=0 inclusive; fp boundary tolerance
        nums = [TrafficSource.packet_number(p) for _, p in pkts]
        assert nums == list(range(len(pkts)))

    def test_poisson_mean(self):
        src = TrafficSource(TrafficConfig("poisson", mean_throughput_bps=2048e3), seed=3)
        pkts = src.packets_until(2.0)
        assert 1600 < len(pkts) < 2400  # ~2000 expected

    def test_payload_is_msequence(self):
        src = TrafficSource(TrafficConfig())
        _, p = src.packets_until(0.0)[0]
        from cognitive_radio_network_tpu.signal.msequence import msequence_bytes

        np.testing.assert_array_equal(p[4:], msequence_bytes(256)[4:])


class TestRxStatistics:
    def test_window_and_ber(self):
        st = RxStatistics(tracking_period_s=1.0)
        payload = st.known_payload.copy()
        payload[10] ^= 0x01  # 1 bit error
        st.record_frame(0.5, True, -20.0, -40.0, payload)
        st.record_frame(0.9, False, 0.0, -40.0, None)
        s = st.snapshot(1.0)
        assert s.frames_received == 2 and s.valid_frames == 1
        assert s.per == 0.5
        assert s.ber_uncoded == pytest.approx(1 / (252 * 8))
        # window slides: everything expires
        s2 = st.snapshot(3.0)
        assert s2.frames_received == 0

    def test_linear_domain_averaging(self):
        st = RxStatistics(1.0)
        st.record_frame(0.1, True, -10.0, -10.0, None)
        st.record_frame(0.2, True, -30.0, -30.0, None)
        s = st.snapshot(0.5)
        # linear mean of 0.1 and 0.001 -> 0.0505 -> -12.97 dB (NOT -20)
        assert s.evm_dB == pytest.approx(-12.97, abs=0.05)


class TestConfig:
    def test_parse_cfg_groups(self):
        d = parse_cfg(
            """
            // comment
            num_nodes = 2;
            run_time = 20.0;
            node1 : { node_type = "interferer"; tx_freq = 833e6; log_phy_tx = 1; };
            node2 : { cognitive_engine = "CE_Template"; };
            """
        )
        assert d["num_nodes"] == 2
        assert d["node1"]["node_type"] == "interferer"
        assert d["node1"]["tx_freq"] == 833e6

    def test_scenario_from_dict_defaults(self):
        sc = scenario_from_dict(
            {"num_nodes": 1, "run_time": 5.0, "node1": {"tx_gain": 25}}
        )
        assert sc.nodes[0].tx_gain == 25.0
        # crts.cpp defaults: 32 subcarriers is the ECR default
        assert sc.nodes[0].tx_subcarriers == 32
        assert sc.nodes[0].tx_modulation == "qam4"

    def test_repo_scenario_loads(self):
        from cognitive_radio_network_tpu.runtime import load_scenario, load_master

        sc = load_scenario("scenarios/predictive_model.cfg")
        assert sc.num_nodes == 2
        assert sc.nodes[1].cognitive_engine == "CE_Predictive_Node"
        assert sc.nodes[1].rx_rate == 13e6
        m = load_master("scenarios/scenario_master_template.cfg")
        assert m.scenarios == [("predictive_model", 1)]


class TestRegistries:
    def test_builtin_engines_registered(self):
        names = engine_names()
        for ce in (
            "CE_Template",
            "CE_PU_MARKOV_Chain_Tx",
            "CE_Random_Behaviour_PU",
            "CE_Predictive_Node",
            "CE_TX_CHANNEL_X",
        ):
            assert ce in names
        assert "SC_Template" in controller_names()


def _link_scenario(run_time=0.25):
    """Two nodes, FDD link: each direction on its own 1 MS/s channel inside
    a 4 MHz medium (both transmitting full-duplex like the reference's
    dual-USRP nodes — same-frequency operation would simply collide)."""
    common = dict(
        tx_rate=1e6,
        rx_rate=1e6,
        tx_gain=20.0,
        rx_gain=20.0,
        tx_gain_soft=-6.0,
        ce_timeout_ms=1000.0,
    )
    return ScenarioConfig(
        num_nodes=2,
        run_time=run_time,
        nodes=[
            NodeConfig(
                net_mean_throughput=200e3, tx_freq=464e6, rx_freq=466e6, **common
            ),
            NodeConfig(
                net_mean_throughput=200e3, tx_freq=466e6, rx_freq=464e6, **common
            ),
        ],
        medium_rate=4e6,
        medium_center=465e6,
        medium_block_len=16384,
        medium_noise_power=1e-7,
        name="two_node_link",
    )


class TestTwoNodeLink:
    def test_packets_flow_both_ways(self):
        rt = ScenarioRuntime(_link_scenario())
        summary = rt.run()
        n0, n1 = rt.nodes
        # ~24 packets each way in 0.25 s at 200 kb/s
        assert len(n0.rx_packets) >= 5, f"node0 got {len(n0.rx_packets)} packets"
        assert len(n1.rx_packets) >= 5
        # BER oracle: payloads decode exactly (clean channel, CRC+FEC pass)
        from cognitive_radio_network_tpu.signal.msequence import msequence_bytes

        known = msequence_bytes(256)
        for _, num, p in n1.rx_packets[:5]:
            np.testing.assert_array_equal(p[4:], known[4:])
        assert summary.bytes_received[0] > 0 and summary.bytes_received[1] > 0

    def test_rx_stats_populated(self):
        rt = ScenarioRuntime(_link_scenario())
        rt.run()
        st = rt.nodes[1].radio.get_rx_stats(rt.t)
        assert st.frames_received > 0
        assert st.per < 0.5
        assert st.evm_dB < -10

    def test_sc_control_changes_node_params(self):
        rt = ScenarioRuntime(_link_scenario(run_time=0.05))
        rt.start()
        rt.apply_control(0, CrtsParam.TX_FREQ, 470e6)
        rt.apply_control(0, CrtsParam.TX_MOD, "qam16")
        assert rt.nodes[0].radio.get_tx_freq() == 470e6
        assert rt.nodes[0].radio.get_tx_modulation() == "qam16"

    def test_logging_and_octave_export(self, tmp_path):
        cfg = _link_scenario(run_time=0.1)
        sink = LogSink()
        rt = ScenarioRuntime(cfg, sink)
        rt.run()
        assert len(sink.phy_tx) > 0 and len(sink.net_tx) > 0
        sink.save_npz(tmp_path / "run.npz")
        data = np.load(tmp_path / "run.npz", allow_pickle=True)
        assert "phy_tx.tx_freq" in data
        sink.export_octave(tmp_path / "run.m")
        text = (tmp_path / "run.m").read_text()
        assert "phy_tx_tx_freq = [" in text


class TestCustomSubcarrierAlloc:
    """Custom-mode run-length allocation through the config layer
    (sc_type_N / sc_num_N groups, src/crts.cpp:429-481)."""

    CFG = """
num_nodes = 1;
run_time = 1.0;
node1 : {
  node_type = "cognitive radio";
  tx_subcarriers = 32;
  tx_subcarrier_alloc_method = "custom";
  tx_subcarrier_alloc : {
    sc_type_1 = "null";
    sc_num_1 = 4;
    sc_type_2 = "pilot";
    sc_type_3 = "data";
    sc_num_3 = 27;
  };
};
"""

    def test_parse_and_build(self):
        from cognitive_radio_network_tpu.phy import subcarriers as sc_mod
        from cognitive_radio_network_tpu.runtime.config import (
            parse_cfg,
            scenario_from_dict,
        )
        from cognitive_radio_network_tpu.runtime.control import _alloc_for

        sc = scenario_from_dict(parse_cfg(self.CFG))
        node = sc.nodes[0]
        assert node.tx_subcarrier_alloc_method == "custom"
        assert node.tx_subcarrier_alloc == [("null", 4), ("pilot", 1), ("data", 27)]
        alloc = _alloc_for(node, "tx")
        want = sc_mod.custom_alloc(32, [("null", 4), ("pilot", 1), ("data", 27)])
        assert alloc == tuple(want)
        # sc_num omitted means 1 (crts.cpp:445)
        assert list(alloc).count(sc_mod.SC_PILOT) == 1

    def test_loopback_with_custom_alloc(self):
        """A link whose tx/rx share a custom allocation still decodes."""
        from cognitive_radio_network_tpu.runtime.config import (
            parse_cfg,
            scenario_from_dict,
        )

        spec_alloc = """
    sc_type_1 = "null";
    sc_num_1 = 3;
    sc_type_2 = "data";
    sc_num_2 = 12;
    sc_type_3 = "pilot";
    sc_type_4 = "data";
    sc_num_4 = 13;
    sc_type_5 = "null";
    sc_num_5 = 3;
"""
        nodes = []
        for tx_f, rx_f in ((464e6, 466e6), (466e6, 464e6)):
            nodes.append(
                f"""
  node_type = "cognitive radio";
  net_mean_throughput = 200e3;
  tx_rate = 1e6; rx_rate = 1e6; tx_gain = 20.0; rx_gain = 20.0;
  tx_gain_soft = -6.0; ce_timeout_ms = 1000.0;
  tx_freq = {tx_f}; rx_freq = {rx_f};
  tx_subcarrier_alloc_method = "custom";
  tx_subcarrier_alloc : {{ {spec_alloc} }};
  rx_subcarrier_alloc_method = "custom";
  rx_subcarrier_alloc : {{ {spec_alloc} }};
"""
            )
        text = f"""
num_nodes = 2;
run_time = 0.1;
medium_rate = 4e6; medium_center = 465e6;
medium_block_len = 16384; medium_noise_power = 1e-7;
node1 : {{ {nodes[0]} }};
node2 : {{ {nodes[1]} }};
"""
        sc = scenario_from_dict(parse_cfg(text))
        rt = ScenarioRuntime(sc)
        rt.run()
        assert len(rt.nodes[1].rx_packets) >= 2
