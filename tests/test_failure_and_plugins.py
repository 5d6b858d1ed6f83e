"""Failure detection, wall-clock guard, and third-party python radios."""

import numpy as np
import pytest

from cognitive_radio_network_tpu.runtime import (
    NodeConfig,
    ScenarioConfig,
    ScenarioRuntime,
)


def _tiny_scenario(**kw):
    common = dict(
        tx_freq=460e6, rx_freq=460e6, tx_rate=1e6, rx_rate=1e6, ce_timeout_ms=50.0
    )
    return ScenarioConfig(
        num_nodes=2,
        run_time=0.1,
        nodes=[NodeConfig(**common), NodeConfig(**common)],
        medium_rate=1e6,
        medium_center=460e6,
        medium_block_len=4096,
        name="tiny",
        **kw,
    )


class _ExplodingEngine:
    pass


class TestFailureDetection:
    def test_node_exception_terminates(self):
        from cognitive_radio_network_tpu.runtime.engine import (
            CognitiveEngine,
            register_engine,
        )

        @register_engine("CE_Exploder")
        class CEExploder(CognitiveEngine):
            def execute(self):
                raise RuntimeError("engine blew up")

        cfg = _tiny_scenario()
        cfg.nodes[0].cognitive_engine = "CE_Exploder"
        rt = ScenarioRuntime(cfg)
        rt.run()
        assert 0 in rt.failed_nodes
        assert "engine blew up" in rt.failed_nodes[0]
        assert rt.terminated  # default policy terminates
        assert rt.t < cfg.run_time  # stopped early

    def test_continue_policy_keeps_running(self):
        from cognitive_radio_network_tpu.runtime.engine import register_engine
        from cognitive_radio_network_tpu.runtime.engine import CognitiveEngine

        @register_engine("CE_Exploder2")
        class CEExploder2(CognitiveEngine):
            def execute(self):
                raise RuntimeError("boom")

        cfg = _tiny_scenario(on_node_failure="continue")
        cfg.nodes[0].cognitive_engine = "CE_Exploder2"
        rt = ScenarioRuntime(cfg)
        rt.run()
        assert 0 in rt.failed_nodes
        assert not rt.terminated
        assert rt.t >= cfg.run_time  # ran to completion

    def test_wall_clock_guard(self):
        cfg = _tiny_scenario(max_wall_time_s=0.0)  # trip immediately
        rt = ScenarioRuntime(cfg)
        rt.run()
        assert rt.terminated


PYTHON_RADIO = '''
import numpy as np

class SilentNode:
    """Minimal third-party radio implementing the node-step protocol."""
    def __init__(self, node_id):
        self.node_id = node_id
        self.started = False
        self.blocks_seen = 0
        self.rx_packets = []
        self.traffic = None
    def start(self): self.started = True
    def poll_traffic(self, t): pass
    def pull_tx_block(self, n): return None
    def push_rx_block(self, block, t): self.blocks_seen += 1
    def run_ce(self, t): pass
    def drain_rx_packets(self, t): pass

def create_node(node_id, medium_rate, medium_center, config):
    return SilentNode(node_id)
'''


class TestPythonRadio:
    def test_python_file_node_loads_and_steps(self, tmp_path):
        f = tmp_path / "user_radio.py"
        f.write_text(PYTHON_RADIO)
        cfg = _tiny_scenario()
        cfg.nodes[1].cognitive_radio_type = "python"
        cfg.nodes[1].python_file = str(f)
        rt = ScenarioRuntime(cfg)
        rt.run()
        assert type(rt.nodes[1]).__name__ == "SilentNode"
        assert rt.nodes[1].blocks_seen > 10
