#!/usr/bin/env python
"""Benchmark: sustained sense->classify throughput (MSamples/s/chip).

Measures the BASELINE.json headline metric — the fused 3-channel
512-pt-FFT x10-average -> band-energy -> MLP -> decision pipeline
(the reference's CE_Predictive_Node sensing chain, CE_Predictive_Node.cpp:127-289)
on one chip, batched over sense cycles.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MSamples/s", "vs_baseline": N}
vs_baseline is against the driver-set target of 100 MSamples/s/chip
(BASELINE.md "Target: sustained sense->classify throughput"); the reference's
implied real-time bound is 13 MSamples/s on a CPU (predictive_model.cfg:76).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from cognitive_radio_network_tpu.models import SenseConfig, make_sense_fn
from cognitive_radio_network_tpu.signal.mlp import reference_weights

TARGET_MSPS = 100.0


# the on-TPU correctness gates live in tests/tpu_gates.py — shared with
# `CRN_TPU_TESTS=1 pytest -m tpu`, so hardware correctness is a first-class
# test target and the bench aborts (instead of shipping numbers) on a
# lowering bug


def main() -> None:
    # persistent XLA compilation cache: repeated bench runs (and the node
    # processes of the distributed sections, runtime/netctl.py) share
    # compiled graphs on disk — first-run compiles over the remote-compile
    # tunnel cost minutes; cached, they load in seconds
    import os as _os

    _cache = _os.environ.get(
        "CRN_COMPILE_CACHE",
        _os.path.join(_os.path.expanduser("~"), ".cache", "crn_tpu_xla"),
    )
    if _cache:
        try:
            jax.config.update("jax_compilation_cache_dir", _cache)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        except Exception:
            pass

    cfg = SenseConfig()
    # Large enough batch to saturate the chip, small enough to iterate fast:
    # cycles * 5120 samples. 8192 cycles ~ 42 MSamples ~ 336 MB complex64.
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n = cycles * cfg.samples_per_cycle

    fn = make_sense_fn(cfg)
    params = reference_weights()

    rng = np.random.default_rng(0)
    # Planar float32 I/Q (xr, xi) — the framework's preferred zero-relayout
    # device layout (see signal/iq.py; interleaved captures are de-interleaved
    # on ingest by the native IQ loader's prefetch thread).
    # buffers-flat 2D (C*A, N): the zero-relayout device layout
    host_xr = rng.standard_normal(
        (cycles * cfg.averaging, cfg.fft_length), dtype=np.float32
    )
    host_xi = rng.standard_normal(
        (cycles * cfg.averaging, cfg.fft_length), dtype=np.float32
    )

    def run_once():
        iq = (jnp.asarray(host_xr), jnp.asarray(host_xi))
        out = fn(iq, params)
        jax.block_until_ready(out["decision"])
        return out

    # Warmup/compile + end-to-end sanity: decisions come back to the host.
    first = run_once()
    _ = np.asarray(first["decision"][:4])

    # --- on-TPU correctness gate: the fused sense kernel's on-chip output
    # vs the golden numpy transliteration (tests/golden_reference.py) on a
    # synthesized PU scene.  A Mosaic lowering bug must abort the bench, not
    # ship a throughput number (interpreter-mode unit tests cannot catch it).
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent / "tests"))
    import tpu_gates

    tpu_gates.gate_fused_sense(rng)

    # Timed: device-resident input; enqueue many dispatches and force a full
    # drain with one scalar device->host fetch (block_until_ready alone does
    # not wait for completion on tunneled remote-execution backends, and the
    # ~25 ms fetch round-trip must be amortized, not measured per dispatch).
    iq = (jnp.asarray(host_xr), jnp.asarray(host_xi))
    _ = np.asarray(fn(iq, params)["decision"][:1])  # drain once more

    reps = 8
    while True:
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(iq, params)
        _ = np.asarray(out["decision"][:1])
        elapsed = time.perf_counter() - t0
        if elapsed > 2.0 or reps >= 512:
            break
        reps *= 2

    total_samples = reps * n
    msps = total_samples / elapsed / 1e6
    amortized_block_ms = float(elapsed / (reps * cycles) * 1e3)

    # True p50/p99 BLOCK latency (the BASELINE metric).  One 64-cycle
    # sense block costs ~10 us on the chip — far below the tunneled
    # backend's ~25 ms host round trip, so a per-dispatch measurement with
    # a fetch baseline subtracted is pure noise (it produced negative
    # p50s).  Instead: run the block graph B times back-to-back inside ONE
    # jit (lax.scan with a threaded carry so nothing is elided) and take
    # the slope between two B values — the (dispatch + fetch) constant
    # cancels exactly, leaving per-block device latency.  The distribution
    # over repeats gives p50/p99.
    lat_cycles = 64  # one block ~ 64 sense cycles (a 25 ms radio block)
    iq_lat = (
        jnp.asarray(host_xr[: lat_cycles * cfg.averaging]),
        jnp.asarray(host_xi[: lat_cycles * cfg.averaging]),
    )

    def _block_chain(b: int):
        def chained(iq, params):
            def body(carry, _):
                # the carry feeds the input so iterations are data-dependent
                # — otherwise XLA hoists the loop-invariant sense call out of
                # the scan and the whole chain costs one block
                out = fn((iq[0] + carry, iq[1]), params)
                return carry + out["decision"][0].astype(jnp.float32) * 1e-30, None

            s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=b)
            return s

        return jax.jit(chained, static_argnums=())

    b1, b2 = 64, 1024
    chain1, chain2 = _block_chain(b1), _block_chain(b2)
    _ = np.asarray(chain1(iq_lat, params))  # compile + drain
    _ = np.asarray(chain2(iq_lat, params))

    def _timed(chain):
        t0 = time.perf_counter()
        _ = np.asarray(chain(iq_lat, params))
        return time.perf_counter() - t0

    # 40 slope samples; a slope sample is a DIFFERENCE of two host timings,
    # so one bad host-timing draw can push it negative — clamp at 0 and
    # report the distribution as per-block DEVICE time (steady-state
    # back-to-back scan iterations), not dispatch latency (ADVICE r3).
    lat = []
    for _ in range(40):
        lat.append(max((_timed(chain2) - _timed(chain1)) / (b2 - b1), 0.0))
    p50_block_ms = float(np.percentile(lat, 50) * 1e3)
    p99_block_ms = float(np.percentile(lat, 99) * 1e3)

    # Secondary: 64-channel wideband energy detect (BASELINE config 5's
    # per-chip building block), on the fused VMEM-resident Pallas kernel
    # (ops/fused_wideband.py) at a streaming block size — 33.5 M wide
    # samples (= 2.6 s of signal per channel at the reference's per-link
    # rate) per dispatch so the tunneled backend's ~0.7 ms dispatch
    # overhead is amortized, as a streaming monitor double-buffering real
    # blocks would.
    from cognitive_radio_network_tpu.ops.fused_wideband import (
        wideband_energy_fused,
    )
    from cognitive_radio_network_tpu.parallel.wideband import WidebandConfig
    from cognitive_radio_network_tpu.signal.channelizer import polyphase_taps

    wcfg = WidebandConfig()
    wtaps = jnp.asarray(polyphase_taps(wcfg.num_channels, wcfg.taps_per_channel))
    wfn = jax.jit(
        lambda a, b: wideband_energy_fused(a, b, wtaps, wcfg, precision="high")
    )
    t_chan = 524288
    wxr = jnp.asarray(
        rng.standard_normal(t_chan * wcfg.num_channels, dtype=np.float32)
    )
    wxi = jnp.asarray(
        rng.standard_normal(t_chan * wcfg.num_channels, dtype=np.float32)
    )
    # on-TPU correctness gates (shared with pytest -m tpu), including the
    # cross-shard initial_history path round-3 review flagged as never
    # having executed on real hardware
    tpu_gates.gate_fused_wideband(rng)
    tpu_gates.gate_sharded_wideband_history(rng)

    for _ in range(4):
        wout = wfn(wxr, wxi)
    _ = np.asarray(wout[:1, :1])
    wreps = 32
    t0 = time.perf_counter()
    for _ in range(wreps):
        wout = wfn(wxr, wxi)
    _ = np.asarray(wout[:1, :1])
    wideband_msps = wreps * t_chan * wcfg.num_channels / (
        time.perf_counter() - t0
    ) / 1e6

    # OFDM link: full-rate receive on the fused fixed-config path — top-K
    # Schmidl&Cox detect + gather + demod + FEC + CRC in ONE dispatch per
    # block (phy/framesync.py::_receive_block_graph).  The reference's
    # implied bound is sustaining 13 MS/s *including* frame sync on a CPU
    # (BASELINE.md; scenarios/predictive_model.cfg:76).
    from cognitive_radio_network_tpu.phy import (
        OFDMFrameConfig,
        OFDMFrameGen,
        OFDMFrameSync,
    )

    # gate + device-resident block come from the shared helper; n_valid is
    # device-resident OUTSIDE the timing loop (a fresh jnp.int32 per call is
    # a host->device transfer that fences dispatch pipelining, ~50 ms on
    # tunneled backends)
    orr_d, ori_d, nvalid_d, rxfn, F, n_link = tpu_gates.gate_ofdm_decode(rng)
    oreps = 16
    while True:
        t0 = time.perf_counter()
        for _ in range(oreps):
            _b, _p, _c, oo, ok = rxfn(orr_d, ori_d, nvalid_d)
        _ = np.asarray(ok[:1])
        oel = time.perf_counter() - t0
        if oel > 1.5 or oreps >= 256:
            break
        oreps *= 2
    ofdm_msps = oreps * n_link / oel / 1e6
    ofdm_fps = oreps * F / oel

    # Adaptive link: the liquid-equivalent STREAMING receiver
    # (phy/framesync.py::StreamReceiver.process — per-frame config riding
    # the coded PHY header, residual carry across blocks), the path that
    # replaces ofdmflexframesync_execute per SURVEY §2.1
    # (src/extensible_cognitive_radio.cpp:1299-1366).  A mixed-config
    # burst (alternating qam4/h128 and qam16/none payload configs) streams
    # through process(); the figure includes the scan dispatch, the per-
    # config decode dispatches, AND the host round trips — the honest
    # per-block cost of the adaptive mode.
    import dataclasses as _dcc

    from cognitive_radio_network_tpu.phy.framesync import StreamReceiver

    acfg_a = OFDMFrameConfig()
    acfg_b = _dcc.replace(acfg_a, mod_scheme="qam16", fec0="none")
    F_ad = 2048
    apay = 256
    ah = rng.integers(0, 256, (F_ad, 8)).astype(np.uint8)
    ap = rng.integers(0, 256, (F_ad, apay)).astype(np.uint8)
    # assemble the fixture stream on the host CPU backend: the tx side is
    # not what this figure measures, and assembly graphs compile in
    # seconds on CPU vs minutes over the remote-compile tunnel
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        agen_a = OFDMFrameGen(acfg_a, apay)
        agen_b = OFDMFrameGen(acfg_b, apay)
        fr_a = np.asarray(agen_a.assemble(ah[0::2], ap[0::2], as_planes=True))
        fr_b = np.asarray(agen_b.assemble(ah[1::2], ap[1::2], as_planes=True))
    agap = 512
    step_a = fr_a.shape[1] + agap
    step_b = fr_b.shape[1] + agap
    n_ad = (F_ad // 2) * (step_a + step_b)
    arr = np.zeros(n_ad, np.float32)
    ari = np.zeros(n_ad, np.float32)
    pos = 0
    for i in range(F_ad // 2):
        arr[pos : pos + fr_a.shape[1]] = fr_a[i, :, 0]
        ari[pos : pos + fr_a.shape[1]] = fr_a[i, :, 1]
        pos += step_a
        arr[pos : pos + fr_b.shape[1]] = fr_b[i, :, 0]
        ari[pos : pos + fr_b.shape[1]] = fr_b[i, :, 1]
        pos += step_b
    srx = StreamReceiver(acfg_a, max_frames_per_block=F_ad)
    # device-resident streaming (process_device): block planes live on
    # device — as an upstream jitted producer or the native loader's DMA
    # would leave them — and the residual carry stays on device; per block
    # only the packed candidate record and decoded frames cross the host
    # boundary.  The host process() API on this TUNNELED backend pays a
    # ~72 MB block upload per call (~8.7 s — transfer-bound, not compute).
    arr_d, ari_d = jnp.asarray(arr), jnp.asarray(ari)
    frames0 = srx.process_device(arr_d, ari_d, threshold=0.2)
    # correctness gate: every frame of both configs decodes with its
    # payload intact before anything is timed
    assert len(frames0) == F_ad, (len(frames0), F_ad)
    got_pay = np.stack(
        [f["payload"] for f in frames0]
    )
    assert np.array_equal(got_pay, ap), "adaptive decode mismatch"
    assert all(f["stats"].payload_valid for f in frames0)
    mods = [f["stats"].mod_scheme for f in frames0]
    assert mods[0::2] == ["qam4"] * (F_ad // 2)
    assert mods[1::2] == ["qam16"] * (F_ad // 2)
    areps = 4
    while True:
        t0 = time.perf_counter()
        for _ in range(areps):
            af = srx.process_device(arr_d, ari_d, threshold=0.2)
        ael = time.perf_counter() - t0
        assert len(af) == F_ad
        if ael > 2.0 or areps >= 64:
            break
        areps *= 2
    adaptive_msps = areps * n_ad / ael / 1e6
    adaptive_fps = areps * F_ad / ael

    # Alt mode: bf16 IQ ingest + single-pass bf16 matmuls (precision
    # "default") — half the HBM read traffic, ~0.5% feature error (well
    # inside any SDR ADC's noise floor).
    import dataclasses as _dc

    fn16 = make_sense_fn(_dc.replace(cfg, precision="default"))
    iq16 = (
        jnp.asarray(host_xr).astype(jnp.bfloat16),
        jnp.asarray(host_xi).astype(jnp.bfloat16),
    )
    for _ in range(8):  # warm: first dispatches pay remote-queue ramp-up
        out16 = fn16(iq16, params)
    _ = np.asarray(out16["decision"][:1])
    reps16 = max(reps // 2, 8)
    t0 = time.perf_counter()
    for _ in range(reps16):
        out16 = fn16(iq16, params)
    _ = np.asarray(out16["decision"][:1])
    msps16 = reps16 * n / (time.perf_counter() - t0) / 1e6

    # Scenario runtime: simulated seconds per wall second for the reference's
    # headline scenario (scenarios/predictive_model.cfg — random-hopping PU +
    # CE_Predictive_Node SU in a 13 MS/s medium).  >= 1.0 means the full
    # framework (traffic, frame assembly, medium, frame sync, engines)
    # sustains the reference's real-time bound.  The link PHY runs on the
    # host per ScenarioConfig.phy_placement (see runtime/controller.py).
    from pathlib import Path

    from cognitive_radio_network_tpu.runtime.config import load_scenario
    from cognitive_radio_network_tpu.runtime.controller import ScenarioRuntime

    scn = Path(__file__).parent / "scenarios" / "predictive_model.cfg"
    scfg = load_scenario(scn)
    scfg.run_time = 0.5  # warmup: compile the host-placed PHY graphs
    wrt = ScenarioRuntime(scfg)
    wrt.run()
    assert not wrt.failed_nodes, f"scenario nodes failed: {wrt.failed_nodes}"
    scfg = load_scenario(scn)
    scfg.run_time = 12.0
    srt = ScenarioRuntime(scfg)
    srt.run()
    # correctness gates: no node may have died (a dead node makes the
    # factor measure an empty scenario — exactly what happened silently in
    # rounds 1-3), and the predictive SU must have produced decisions
    assert not srt.failed_nodes, f"scenario nodes failed: {srt.failed_nodes}"
    su_decisions = getattr(srt.nodes[1].engine, "decisions", [])
    assert len(su_decisions) > 0, "predictive SU made no decisions"
    realtime_factor = srt.steady_t / max(srt.steady_wall_time_s, 1e-9)

    # Distributed (netctl) mode: the reference's ACTUAL topology — a
    # controller process + one OS process per node, lockstep medium blocks
    # over the TCP star (src/crts_cognitive_radio.cpp:818-915).  Node
    # processes run their PHY/engines on their own host backends
    # (phy_placement="host"), so they never contend for the one TPU chip.
    # Steady-state factor excludes step 0, where node processes jit-compile.
    from cognitive_radio_network_tpu.runtime.netctl import NetController

    # Warm run first: node processes fill the persistent XLA compilation
    # cache (runtime/netctl.py) so the timed run measures steady state, not
    # first-machine compiles.  Then 40 sim-seconds timed.
    wcfg_d = load_scenario(scn)
    wcfg_d.run_time = 2.0
    NetController(wcfg_d, port=47489, start_pad_s=1.0).run()
    dcfg = load_scenario(scn)
    dcfg.run_time = 40.0
    dctl = NetController(dcfg, port=47490, start_pad_s=1.0)
    dctl.run()
    dist_realtime_factor = dctl.steady_t / max(dctl.steady_wall_time_s, 1e-9)

    # 8-node distributed mode: the reference-scale process topology — 3 FDD
    # pairs + 2 interferers as 8 OS processes through the TCP star
    # (scenarios/eight_node.cfg; include/crts.hpp:189 allows 48).  Two
    # numbers: the AGGREGATE realtime factor on this host (all 8 node
    # processes share this machine's cores — on the 2-core bench box the
    # aggregate is CPU-bound), and the PER-NODE margin max(node CPU
    # seconds)/sim seconds, which is the real-time criterion under the
    # reference's actual deployment model of one host per node process
    # (src/crts_controller.cpp:404-421 ssh-launches each node on its own
    # server_ip): margin < 1.0 means every node individually sustains
    # real time on a single core.
    scn8 = Path(__file__).parent / "scenarios" / "eight_node.cfg"
    wcfg8 = load_scenario(scn8)
    wcfg8.run_time = 2.0
    NetController(wcfg8, port=47493, start_pad_s=1.0).run()
    dcfg8 = load_scenario(scn8)
    dcfg8.run_time = 16.0
    dctl8 = NetController(dcfg8, port=47494, start_pad_s=1.0)
    dctl8.run()
    dist8_factor = dctl8.steady_t / max(dctl8.steady_wall_time_s, 1e-9)
    node_cpu = [
        s.get("cpu_time_s", 0.0) for s in dctl8.summaries.values()
    ]
    sim_s = max(
        (s.get("sim_time_s", 0.0) for s in dctl8.summaries.values()),
        default=dcfg8.run_time,
    )
    node_margin8 = max(node_cpu) / max(sim_s, 1e-9) if node_cpu else float("nan")

    print(
        json.dumps(
            {
                "metric": "sense_classify_throughput_per_chip",
                "value": round(msps, 2),
                "unit": "MSamples/s",
                "vs_baseline": round(msps / TARGET_MSPS, 3),
                "extra": {
                    "pipelined_latency_ms_per_cycle": round(amortized_block_ms, 6),
                    "p50_block_latency_ms": round(p50_block_ms, 3),
                    "p99_block_latency_ms": round(p99_block_ms, 3),
                    "latency_method": "scan-slope per-block device time",
                    "latency_block_cycles": lat_cycles,
                    "cycles_per_dispatch": cycles,
                    "device": str(jax.devices()[0]),
                    "reps": reps,
                    "bf16_ingest_msps": round(msps16, 2),
                    "wideband_64ch_msps": round(wideband_msps, 2),
                    "ofdm_link_msps": round(ofdm_msps, 2),
                    "ofdm_link_frames_per_s": round(ofdm_fps, 1),
                    "adaptive_link_msps": round(adaptive_msps, 2),
                    "adaptive_link_frames_per_s": round(adaptive_fps, 1),
                    "scenario_realtime_factor": round(realtime_factor, 3),
                    "distributed_realtime_factor": round(
                        dist_realtime_factor, 3
                    ),
                    "distributed_realtime_factor_8node": round(
                        dist8_factor, 3
                    ),
                    "distributed_8node_max_node_cpu_per_sim_s": round(
                        node_margin8, 3
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
