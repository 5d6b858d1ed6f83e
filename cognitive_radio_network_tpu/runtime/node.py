"""Node runtimes: cognitive-radio node and interferer node.

Port of the two node processes (src/crts_cognitive_radio.cpp:507-968,
src/crts_interferer.cpp:314-420) as block-stepped simulation actors: the
radio node couples a :class:`Radio` to a traffic source and a cognitive
engine (event loop semantics of ECR_ce_worker,
src/extensible_cognitive_radio.cpp:1761-1808); the interferer node drives the
waveform builders of :mod:`..env.interference` with duty-cycle and
frequency-hop state machines (src/interferer.cpp:360-452).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np

from cognitive_radio_network_tpu.env.interference import (
    InterfererConfig,
    synthesize_interference,
)
from cognitive_radio_network_tpu.runtime.engine import (
    CEEvent,
    CEMetrics,
    create_engine,
)
from cognitive_radio_network_tpu.runtime.radio import Radio, _mix
from cognitive_radio_network_tpu.runtime.traffic import TrafficConfig, TrafficSource

__all__ = ["RadioNode", "InterfererNode"]

import functools


@functools.lru_cache(maxsize=16)
def _block_arange(n: int) -> np.ndarray:
    return np.arange(n, dtype=np.int64)


@functools.lru_cache(maxsize=32)
def _waveform_pool(cfg: InterfererConfig, seed: int) -> np.ndarray:
    """~1M-sample ON-burst pool, synthesized ONCE per (config, seed):
    fresh per-block jax.random synthesis + fetch was the interferer
    node's dominant CPU cost (VERDICT r4 #2).  Blocks are served by a
    cyclic cursor walk over the pool — phase/waveform-continuous within
    the pool, with a burst-boundary seam every pool length (the reference
    likewise rebuilds its transmission buffer per ON burst,
    src/interferer.cpp:423-446).  Deterministic per (config, seed)."""
    n = 1 << 20
    return np.ascontiguousarray(
        np.asarray(synthesize_interference(jax.random.key(seed), cfg, n)),
        dtype=np.complex64,
    )


class RadioNode:
    """Cognitive-radio node: radio + traffic + engine event loop."""

    def __init__(
        self,
        node_id: int,
        medium_rate: float,
        medium_center: float,
        engine_name: str = "CE_Template",
        ce_args: list[str] | None = None,
        ce_timeout_ms: float = 1000.0,
        traffic: TrafficConfig | None = None,
        log_sink=None,
        rx_overflow_interval: int = 0,
        udp_bridge=None,
    ):
        self.node_id = node_id
        self.radio = Radio(medium_rate, medium_center, node_id, log_sink)
        self.radio.set_ce_timeout_ms(ce_timeout_ms)
        self.engine = create_engine(engine_name, self.radio, ce_args)
        self.traffic = TrafficSource(traffic or TrafficConfig(), seed=node_id)
        # real-application data plane (runtime/traffic.py::UdpBridge):
        # replaces the synthetic traffic source with real ingress datagrams
        self.udp_bridge = udp_bridge
        self.log_sink = log_sink
        self._last_ce_t = 0.0
        self.rx_packets: list[tuple[float, int, np.ndarray]] = []
        self.started = False
        # fault injection: drop every Nth rx block, surfacing UHD_OVERFLOW
        # (the reference's uhd_msg_handler 'O' path,
        # src/extensible_cognitive_radio.cpp:1326-1347)
        self.rx_overflow_interval = int(rx_overflow_interval)
        self._rx_block_count = 0

    def start(self) -> None:
        self.radio.start_rx()
        self.radio.start_tx()
        self.radio.start_ce()
        self.started = True

    # -- block-step API (called by the scenario runtime) --

    def poll_traffic(self, t: float) -> None:
        if not self.started or self.radio.tx_state == 0:
            # reference: traffic still accumulates in the kernel socket; we
            # model only the in-flight queue, so skip generation when stopped
            self.traffic._next_t = max(self.traffic._next_t, t)
            return
        if self.udp_bridge is not None:
            # real ingress datagrams instead of the synthetic source; the
            # source's packet counter doubles as the sent-packet count
            for pkt in self.udp_bridge.poll():
                self.radio.enqueue_packet(pkt)
                self.traffic.packet_num += 1
                if self.log_sink is not None:
                    self.log_sink.log_net_tx(self.node_id, t, pkt)
            return
        for ts, pkt in self.traffic.packets_until(t):
            self.radio.enqueue_packet(pkt)
            if self.log_sink is not None:
                self.log_sink.log_net_tx(self.node_id, ts, pkt)

    def pull_tx_block(self, n: int) -> Optional[np.ndarray]:
        if not self.started:
            return None
        return self.radio.pull_tx_block(n)

    def push_rx_block(
        self, block: np.ndarray | None, t: float, n: int | None = None
    ) -> None:
        if not self.started:
            return
        self._rx_block_count += 1
        if (
            self.rx_overflow_interval > 0
            and self._rx_block_count % self.rx_overflow_interval == 0
        ):
            # injected overflow: the block is LOST (samples dropped, like a
            # USRP rx ring overrun) and the CE sees UHD_OVERFLOW
            self.radio.notify_overflow(t)
            return
        self.radio.push_rx_block(block, t, n)

    def push_rx_silence(self, n: int, t: float) -> None:
        """No transmitter heard this block (runtime/medium.py returns None);
        the radio still advances and adds its own thermal noise if it must
        (sensing CEs), or squelch-skips for free."""
        self.push_rx_block(None, t, n)

    def run_ce(self, t: float) -> None:
        """Drain radio events into engine executions + timeout semantics
        (pthread_cond_timedwait loop of ECR_ce_worker)."""
        if not (self.started and self.radio.ce_running):
            return
        events = self.radio.drain_events()
        for ev in events:
            self.radio.CE_metrics = ev
            self.engine.execute()
            self._last_ce_t = t
        timeout_s = self.radio.ce_timeout_ms / 1e3
        if not events and (t - self._last_ce_t) >= timeout_s:
            self.radio.CE_metrics = CEMetrics(ce_event=CEEvent.TIMEOUT, time_s=t)
            self.engine.execute()
            self._last_ce_t = t

    def drain_rx_packets(self, t: float) -> None:
        while self.radio.rx_packet_sink:
            num, payload = self.radio.rx_packet_sink.popleft()
            self.rx_packets.append((t, num, payload))
            if self.udp_bridge is not None:
                self.udp_bridge.forward_payload(payload)
            if self.log_sink is not None:
                self.log_sink.log_net_rx(self.node_id, t, payload)

    def finalize(self, t: float) -> None:
        """End-of-run: flush the batched rx scan (rx_scan_blocks may hold
        up to N-1 hot blocks whose frames would otherwise be lost) and
        drain the resulting packets/events."""
        self.radio.flush_rx_scan(t)
        self.run_ce(t)
        self.drain_rx_packets(t)

    def close(self) -> None:
        if self.udp_bridge is not None:
            self.udp_bridge.close()


class InterfererNode:
    """Interferer: waveform builder + duty cycle + frequency hopping."""

    def __init__(
        self,
        node_id: int,
        medium_rate: float,
        medium_center: float,
        cfg: InterfererConfig,
        log_sink=None,
        seed: int = 0,
    ):
        self.node_id = node_id
        self.cfg = cfg
        self.medium_rate = medium_rate
        self.medium_center = medium_center
        self.log_sink = log_sink
        self.tx_freq = cfg.tx_freq_hz
        self._sweep_coeff = 1.0
        self._dwell_t = 0.0
        self._cursor = 0
        self._seed = seed
        self.started = False
        self.tx_state = 1
        self._rng = np.random.default_rng(seed)

    def start(self) -> None:
        self.started = True

    # control-parameter application (apply_control_msg equivalents,
    # src/crts_interferer.cpp:314-420)
    def set_tx_freq(self, f: float) -> None:
        self.tx_freq = float(f)

    def update_frequency(self) -> None:
        """src/interferer.cpp:334-355."""
        c = self.cfg
        if c.tx_freq_behavior == "sweep":
            self.tx_freq += c.tx_freq_resolution_hz * self._sweep_coeff
            if self.tx_freq > c.tx_freq_max_hz or self.tx_freq < c.tx_freq_min_hz:
                self._sweep_coeff *= -1.0
                self.tx_freq += 2.0 * c.tx_freq_resolution_hz * self._sweep_coeff
        elif c.tx_freq_behavior == "random":
            bw = c.tx_freq_max_hz - c.tx_freq_min_hz
            draw = self._rng.uniform(0, bw)
            self.tx_freq = (
                c.tx_freq_resolution_hz * round(draw / c.tx_freq_resolution_hz)
                + c.tx_freq_min_hz
            )

    def poll_traffic(self, t: float) -> None:  # interferers carry no traffic
        pass

    def push_rx_block(self, block, t) -> None:  # and do not receive
        pass

    def run_ce(self, t: float) -> None:
        pass

    def drain_rx_packets(self, t: float) -> None:
        pass

    def pull_tx_block(self, n: int) -> Optional[np.ndarray]:
        if not self.started or not self.tx_state:
            self._cursor += n
            return None
        c = self.cfg
        t0 = self._cursor / self.medium_rate
        # frequency dwell
        if c.tx_freq_behavior != "fixed" and t0 - self._dwell_t >= c.tx_freq_dwell_s:
            self.update_frequency()
            self._dwell_t = t0
            if self.log_sink is not None:
                self.log_sink.log_int_tx(self.node_id, t0, self.tx_freq)
        # duty-cycle gate over the block, in integer sample arithmetic
        # (src/interferer.cpp:394-420 gates on timers; one block crosses at
        # most a few on/off boundaries).  duty >= 1 skips the gate outright.
        gate = None
        if c.duty_cycle < 1.0:
            period = max(int(round(max(c.period_s, 1e-9) * self.medium_rate)), 1)
            # floor at 1 sample: a sub-sample duty (duty*period < 0.5) must
            # still emit SOMETHING each period, matching the old fractional
            # gate's first-sample emission (ADVICE r4)
            on = max(int(round(c.duty_cycle * period)), 1)
            phase = (self._cursor + _block_arange(n)) % period
            gate = phase < on
            if not gate.any():
                self._cursor += n
                return None
            if gate.all():
                gate = None
        # serve the block from the synthesized pool at the stream cursor
        pool = _waveform_pool(c, self._seed)
        start = self._cursor % len(pool)
        if start + n <= len(pool):
            wf = pool[start : start + n]  # view; never mutated below
        else:
            parts = [pool[start:]]
            rem = n - (len(pool) - start)
            parts += [pool] * (rem // len(pool)) + [pool[: rem % len(pool)]]
            wf = np.concatenate(parts)
        if gate is not None:
            wf = wf * gate
        # phase-continuous mix to the tx offset via the cached-ramp mixer
        # (same discipline as Radio tx, runtime/radio.py::_mix)
        off = (self.tx_freq - self.medium_center) / self.medium_rate
        out = _mix(wf, off, self._cursor)
        self._cursor += n
        if out is wf and wf.base is not None:
            out = out.copy()  # never hand a pool view to the medium
        return out
