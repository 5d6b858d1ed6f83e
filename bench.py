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

Measurement discipline (round-5): every chip-timed section runs >= 3
trials and reports the MEDIAN, with the min/max spread in ``extra`` —
round 4's number of record was one timed pass on a contended tunneled
backend and under-reported the reproducible figure by >2x.  The bench
also measures the fetch round-trip constant up front and flags a
degraded tunnel (extra.environment) instead of silently shipping a
contended sample.  Floors (tests/tpu_gates.py::PERF_FLOORS, shared with
`pytest -m tpu`) guard against real regressions hiding inside the noise.
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
TRIALS = 3


# the on-TPU correctness gates live in tests/tpu_gates.py — shared with
# `CRN_TPU_TESTS=1 pytest -m tpu`, so hardware correctness is a first-class
# test target and the bench aborts (instead of shipping numbers) on a
# lowering bug


def _median_trials(run_once, trials: int = TRIALS):
    """Median-of-trials wrapper for chip-timed sections: one contended
    pass on the tunneled backend must not become the number of record.

    ``run_once`` returns either a value or (value, side_dict); returns
    (median, min, max, side-of-the-MEDIAN-trial) so side-channel figures
    (reps, frames/s, per-cycle latency) stay consistent with the headline
    value instead of leaking from whichever trial ran last."""
    results = [run_once() for _ in range(trials)]
    vals = [r[0] if isinstance(r, tuple) else r for r in results]
    mid = sorted(range(trials), key=lambda i: vals[i])[trials // 2]
    side = results[mid][1] if isinstance(results[mid], tuple) else None
    return float(vals[mid]), float(min(vals)), float(max(vals)), side


def _fetch_rtt_ms(samples: int = 5) -> float:
    """The device->host round-trip constant (min over a few probes): the
    per-fetch cost every timed section amortizes.  Nominal ~25-36 ms on
    the tunneled backend; 2x that means host/tunnel contention and the
    run is flagged as degraded."""
    x = jnp.zeros(64, jnp.int32)
    _ = np.asarray(x[:1])
    best = float("inf")
    for _ in range(samples):
        t0 = time.perf_counter()
        _ = np.asarray(x[:1])
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def _fetch_bw_mbps(samples: int = 3) -> float:
    """Sustained device->host bandwidth (best of a few 4 MB fetches).
    Nominal ~60 MB/s on the tunneled backend; it drifts by 2x over
    minutes, and the adaptive-link figure (which must deliver every
    payload byte to the host) tracks it — record it so a low adaptive
    number can be read against the link state, not guessed at."""
    base = jnp.arange(1 << 20, dtype=jnp.int32)
    _ = np.asarray(base[:1])
    best = float("inf")
    for i in range(samples):
        y = base + i  # FRESH buffer: jax caches an array's host copy, so
        _ = np.asarray(y[:1])  # re-fetching one array measures nothing
        t0 = time.perf_counter()
        _ = np.asarray(y)
        best = min(best, time.perf_counter() - t0)
    return (1 << 22) / best / 1e6


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

    # environment sanity: measure the fetch round-trip constant before
    # timing anything; a degraded tunnel is flagged, not silently shipped
    rtt_ms = _fetch_rtt_ms()
    if rtt_ms > 80.0:
        time.sleep(5.0)  # transient contention: give it one more chance
        rtt_ms = min(rtt_ms, _fetch_rtt_ms())
    bw_mbps = _fetch_bw_mbps()
    # calibration: at 24 MB/s every median was still healthy (adaptive
    # 193 MS/s); the genuinely harmful regime measured ~12 MB/s (adaptive
    # 86-100, single sense trials down 3x) — flag below 15
    environment = (
        "nominal"
        if rtt_ms <= 80.0 and bw_mbps >= 15.0
        else "degraded-tunnel"
    )

    cfg = SenseConfig()
    # Large enough batch to saturate the chip, small enough to iterate fast:
    # cycles * 5120 samples. 8192 cycles ~ 42 MSamples ~ 336 MB complex64.
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n = cycles * cfg.samples_per_cycle

    fn = make_sense_fn(cfg)
    params = reference_weights()

    rng = np.random.default_rng(0)
    # Planar float32 I/Q (xr, xi) — the framework's preferred zero-relayout
    # device layout (see signal/iq.py); buffers-flat 2D (C*A, N)
    host_xr = rng.standard_normal(
        (cycles * cfg.averaging, cfg.fft_length), dtype=np.float32
    )
    host_xi = rng.standard_normal(
        (cycles * cfg.averaging, cfg.fft_length), dtype=np.float32
    )

    # Warmup/compile + end-to-end sanity: decisions come back to the host.
    iq = (jnp.asarray(host_xr), jnp.asarray(host_xi))
    first = fn(iq, params)
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
    _ = np.asarray(fn(iq, params)["decision"][:1])  # drain once more

    def sense_trial():
        reps = 8
        while True:
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(iq, params)
            _ = np.asarray(out["decision"][:1])
            elapsed = time.perf_counter() - t0
            if elapsed > 1.5 or reps >= 512:
                break
            reps *= 2
        return reps * n / elapsed / 1e6, {
            "reps": reps,
            "block_ms": elapsed / (reps * cycles) * 1e3,
        }

    msps, msps_lo, msps_hi, sside = _median_trials(sense_trial)
    reps = sside["reps"]
    amortized_block_ms = float(sside["block_ms"])

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
    # samples per dispatch so dispatch overhead is amortized, as a
    # streaming monitor double-buffering real blocks would.
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
    # cross-shard initial_history path
    tpu_gates.gate_fused_wideband(rng)
    tpu_gates.gate_sharded_wideband_history(rng)

    for _ in range(4):
        wout = wfn(wxr, wxi)
    _ = np.asarray(wout[:1, :1])

    def wideband_trial():
        wreps = 32
        t0 = time.perf_counter()
        for _ in range(wreps):
            wout = wfn(wxr, wxi)
        _ = np.asarray(wout[:1, :1])
        return wreps * t_chan * wcfg.num_channels / (
            time.perf_counter() - t0
        ) / 1e6

    wideband_msps, wideband_lo, wideband_hi, _ = _median_trials(
        wideband_trial
    )

    # OFDM link: full-rate receive on the fused fixed-config path — top-K
    # Schmidl&Cox detect + gather + demod + FEC + CRC in ONE dispatch per
    # block (phy/framesync.py::_receive_block_graph).  The reference's
    # implied bound is sustaining 13 MS/s *including* frame sync on a CPU
    # (BASELINE.md; scenarios/predictive_model.cfg:76).
    orr_d, ori_d, nvalid_d, rxfn, F, n_link = tpu_gates.gate_ofdm_decode(rng)

    def ofdm_trial():
        oreps = 16
        while True:
            t0 = time.perf_counter()
            for _ in range(oreps):
                _b, _p, _c, oo, ok = rxfn(orr_d, ori_d, nvalid_d)
            _ = np.asarray(ok[:1])
            oel = time.perf_counter() - t0
            if oel > 1.0 or oreps >= 256:
                break
            oreps *= 2
        return oreps * n_link / oel / 1e6, {"fps": oreps * F / oel}

    ofdm_msps, ofdm_lo, ofdm_hi, oside = _median_trials(ofdm_trial)
    ofdm_fps = oside["fps"]

    # Adaptive link: the liquid-equivalent STREAMING receiver — the path
    # that replaces ofdmflexframesync_execute per SURVEY §2.1
    # (src/extensible_cognitive_radio.cpp:1299-1366).  A mixed-config burst
    # (alternating qam4/h128 and qam16/none payload configs) streams
    # through the fused one-dispatch-per-block step
    # (phy/framesync.py::_stream_step_graph) via the pipelined
    # feed_device/flush API: per-frame configs ride the coded PHY header,
    # candidate resolution runs in-graph, stream state chains on device,
    # and packed results prefetch in groups — so dispatches pipeline and
    # the figure includes everything: scan, resolve, decode, residual
    # carry, AND delivery of every payload byte to the host.
    import dataclasses as _dcc

    from cognitive_radio_network_tpu.phy import OFDMFrameConfig, OFDMFrameGen
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
    # block/pipeline geometry chosen by on-chip sweep: 4 blocks of ~1.5M
    # samples with fetch groups of 8 beat 8x762k / 16x381k by ~2x (fewer,
    # larger fetches over the ~60 MB/s link; see CLAUDE.md)
    a_blocks_n = 4
    a_blk = n_ad // a_blocks_n
    a_lag, a_grp = 18, 8
    srx = StreamReceiver(acfg_a, max_frames_per_block=F_ad // a_blocks_n + 8)
    srx.fetch_group = a_grp
    a_blocks = [
        (
            jnp.asarray(arr[i * a_blk : (i + 1) * a_blk]),
            jnp.asarray(ari[i * a_blk : (i + 1) * a_blk]),
        )
        for i in range(a_blocks_n)
    ]

    def adaptive_pass(passes: int):
        frames = []
        for _p in range(passes):
            for br, bi in a_blocks:
                frames += srx.feed_device(br, bi, threshold=0.2, max_lag=a_lag)
        frames += srx.flush()
        return frames

    # correctness gate: every frame of both configs decodes with its
    # payload intact before anything is timed (warm passes also compile
    # the fused step + fetch-group stack shapes)
    for _ in range(3):
        frames0 = adaptive_pass(1)
        assert len(frames0) == F_ad, (len(frames0), F_ad)
    got_pay = np.stack([f["payload"] for f in frames0])
    assert np.array_equal(got_pay, ap), "adaptive decode mismatch"
    assert all(f["stats"].payload_valid for f in frames0)
    mods = [f["stats"].mod_scheme for f in frames0]
    assert mods[0::2] == ["qam4"] * (F_ad // 2)
    assert mods[1::2] == ["qam16"] * (F_ad // 2)

    def adaptive_trial():
        passes = 6
        t0 = time.perf_counter()
        af = adaptive_pass(passes)
        ael = time.perf_counter() - t0
        assert len(af) == passes * F_ad
        gp = np.stack([f["payload"] for f in af[:F_ad]])
        assert np.array_equal(gp, ap)
        return passes * n_ad / ael / 1e6, {"fps": passes * F_ad / ael}

    adaptive_msps, adaptive_lo, adaptive_hi, aside = _median_trials(
        adaptive_trial
    )
    adaptive_fps = aside["fps"]

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

    def bf16_trial():
        reps16 = max(reps // 2, 8)
        t0 = time.perf_counter()
        for _ in range(reps16):
            out16 = fn16(iq16, params)
        _ = np.asarray(out16["decision"][:1])
        return reps16 * n / (time.perf_counter() - t0) / 1e6

    msps16, msps16_lo, msps16_hi, _ = _median_trials(bf16_trial)

    # Perf floors (tests/tpu_gates.py::PERF_FLOORS, shared with the -m tpu
    # suite): generous bounds far below normal variance but far above any
    # real regression — a silent 2x collapse must fail loudly, not ship.
    # Asserted on the BEST trial (collapse semantics: if any trial reaches
    # the floor the kernel is healthy; the median is the reported figure).
    floors = tpu_gates.PERF_FLOORS
    assert msps_hi >= floors["sense_msps"], (msps_hi, floors)
    assert wideband_hi >= floors["wideband_msps"], (wideband_hi, floors)
    assert ofdm_hi >= floors["ofdm_link_msps"], (ofdm_hi, floors)
    assert adaptive_hi >= floors["adaptive_link_msps"], (
        adaptive_hi,
        floors,
    )

    # Scenario runtime: simulated seconds per wall second for the reference's
    # headline scenario (scenarios/predictive_model.cfg — random-hopping PU +
    # CE_Predictive_Node SU in a 13 MS/s medium).  >= 1.0 means the full
    # framework (traffic, frame assembly, medium, frame sync, engines)
    # sustains the reference's real-time bound.  The link PHY runs on the
    # host per ScenarioConfig.phy_placement (see runtime/controller.py).
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
    # Steady-state factor excludes the first quarter, where node processes
    # jit-compile.
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
    def _node_margin(ctl, default_sim):
        node_cpu = [s.get("cpu_time_s", 0.0) for s in ctl.summaries.values()]
        sim_s = max(
            (s.get("sim_time_s", 0.0) for s in ctl.summaries.values()),
            default=default_sim,
        )
        return (
            max(node_cpu) / max(sim_s, 1e-9) if node_cpu else float("nan")
        )

    scn8 = Path(__file__).parent / "scenarios" / "eight_node.cfg"
    wcfg8 = load_scenario(scn8)
    wcfg8.run_time = 2.0
    NetController(wcfg8, port=47493, start_pad_s=1.0).run()
    dcfg8 = load_scenario(scn8)
    dcfg8.run_time = 16.0
    dctl8 = NetController(dcfg8, port=47494, start_pad_s=1.0)
    dctl8.run()
    dist8_factor = dctl8.steady_t / max(dctl8.steady_wall_time_s, 1e-9)
    node_margin8 = _node_margin(dctl8, dcfg8.run_time)

    # 48-process mode (the reference's cap, include/crts.hpp:189): one full
    # sim-second of sustained operation with 48 OS node processes through
    # the TCP star — beyond round-4's launch/connect smoke.  On this
    # 2-vCPU host the AGGREGATE factor is necessarily << 1 (48 processes
    # share 2 cores); the per-node CPU margin is the host-count-independent
    # real-time criterion (one host per node in the reference's deployment).
    from cognitive_radio_network_tpu.runtime.config import (
        build_forty_eight_node_scenario,
    )

    cfg48, gains48 = build_forty_eight_node_scenario(run_time=1.0)
    cfg48.max_wall_time_s = 520.0
    ctl48 = NetController(cfg48, port=47497, start_pad_s=2.0)
    ctl48.medium.gains = gains48
    ctl48.run()
    # sim_time_s in node summaries is the STEADY WINDOW (last 3/4 of the
    # run); completion of the full 1.0 sim-s is the separate flag
    sim48 = max(
        (s.get("sim_time_s", 0.0) for s in ctl48.summaries.values()),
        default=0.0,
    )
    completed48 = (not ctl48.terminated) and len(ctl48.summaries) == 48
    dist48_factor = ctl48.steady_t / max(ctl48.steady_wall_time_s, 1e-9)
    node_margin48 = _node_margin(ctl48, cfg48.run_time)

    print(
        json.dumps(
            {
                "metric": "sense_classify_throughput_per_chip",
                "value": round(msps, 2),
                "unit": "MSamples/s",
                "vs_baseline": round(msps / TARGET_MSPS, 3),
                "extra": {
                    "trials": TRIALS,
                    "environment": environment,
                    "fetch_rtt_ms": round(rtt_ms, 1),
                    "fetch_bw_mbps": round(bw_mbps, 1),
                    "sense_msps_spread": [round(msps_lo, 2), round(msps_hi, 2)],
                    "pipelined_latency_ms_per_cycle": round(amortized_block_ms, 6),
                    "p50_block_latency_ms": round(p50_block_ms, 3),
                    "p99_block_latency_ms": round(p99_block_ms, 3),
                    "latency_method": "scan-slope per-block device time",
                    "latency_block_cycles": lat_cycles,
                    "cycles_per_dispatch": cycles,
                    "device": str(jax.devices()[0]),
                    "reps": reps,
                    "bf16_ingest_msps": round(msps16, 2),
                    "bf16_ingest_spread": [
                        round(msps16_lo, 2),
                        round(msps16_hi, 2),
                    ],
                    "wideband_64ch_msps": round(wideband_msps, 2),
                    "wideband_spread": [
                        round(wideband_lo, 2),
                        round(wideband_hi, 2),
                    ],
                    "ofdm_link_msps": round(ofdm_msps, 2),
                    "ofdm_link_spread": [round(ofdm_lo, 2), round(ofdm_hi, 2)],
                    "ofdm_link_frames_per_s": round(ofdm_fps, 1),
                    "adaptive_link_msps": round(adaptive_msps, 2),
                    "adaptive_link_spread": [
                        round(adaptive_lo, 2),
                        round(adaptive_hi, 2),
                    ],
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
                    "distributed_realtime_factor_48node": round(
                        dist48_factor, 3
                    ),
                    "distributed_48node_max_node_cpu_per_sim_s": round(
                        node_margin48, 3
                    ),
                    "distributed_48node_completed_sim_s": (
                        round(cfg48.run_time, 3) if completed48 else 0.0
                    ),
                    "distributed_48node_steady_sim_s": round(sim48, 3),
                },
            }
        )
    )


if __name__ == "__main__":
    # the tunneled backend throws occasional one-off UNIMPLEMENTED errors
    # (CLAUDE.md); one such flake must not cost the whole capture.  The
    # retry re-EXECS a fresh interpreter: the error can poison subsequent
    # transfers in the same process (verify skill notes), so an in-process
    # second run could fail on the first fetch.  CRN_BENCH_RETRIED guards
    # against a retry loop; exception chains are walked because the
    # UNIMPLEMENTED status often rides __cause__/__context__ of a wrapper.
    try:
        main()
    except Exception as e:  # noqa: BLE001 - single retry for backend flakes
        import os as _os
        import sys as _sys
        import time as _time

        chain, seen = [], set()
        err = e
        while err is not None and id(err) not in seen:
            seen.add(id(err))
            chain.append(str(err))
            err = err.__cause__ or err.__context__
        if (
            not any("UNIMPLEMENTED" in c for c in chain)
            or _os.environ.get("CRN_BENCH_RETRIED")
        ):
            raise
        print(f"re-execing once after backend flake: {e}", file=_sys.stderr)
        _sys.stderr.flush()
        _os.environ["CRN_BENCH_RETRIED"] = "1"
        _time.sleep(10.0)
        _os.execv(_sys.executable, [_sys.executable] + _sys.argv)
