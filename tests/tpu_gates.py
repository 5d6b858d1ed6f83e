"""On-hardware correctness gates, shared by bench.py and `pytest -m tpu`.

Each gate runs a hot kernel ON THE AMBIENT BACKEND (the real TPU when run
un-pinned) and asserts its output against an independent numpy oracle.
Interpreter-mode unit tests cannot catch a Mosaic/XLA lowering bug on real
hardware; these gates make hardware correctness a first-class check — the
bench imports the same helpers so a lowering bug aborts the benchmark
instead of shipping a throughput number.

Run standalone:  CRN_TPU_TESTS=1 timeout 550 python -m pytest -m tpu -q
"""

from __future__ import annotations

import numpy as np


def wideband_energy_numpy(xr, xi, taps, cfg):
    """Independent numpy transliteration of the wideband energy math
    (polyphase depthwise FIR -> M-point DFT -> per-cycle mean power), the
    on-TPU oracle for the fused Pallas kernel (ops/fused_wideband.py)."""
    m = cfg.num_channels
    t = xr.size // m
    vr_in, vi_in = xr.reshape(t, m), xi.reshape(t, m)
    hf = taps[::-1].astype(np.float64)  # (P, M), flipped like _fir_rows
    p = hf.shape[0]
    ext_r = np.concatenate([np.zeros((p - 1, m)), vr_in], axis=0)
    ext_i = np.concatenate([np.zeros((p - 1, m)), vi_in], axis=0)
    vr = np.zeros((t, m))
    vi = np.zeros((t, m))
    for s in range(p):
        vr += hf[s] * ext_r[s : s + t]
        vi += hf[s] * ext_i[s : s + t]
    ang = -2.0 * np.pi * np.outer(np.arange(m), np.arange(m)) / m
    wre, wim = np.cos(ang), np.sin(ang)
    yr = vr @ wre - vi @ wim
    yi = vr @ wim + vi @ wre
    power = yr**2 + yi**2
    return power.reshape(t // cfg.block_len, cfg.block_len, m).mean(axis=1)


def gate_fused_sense(rng=None) -> None:
    """Fused sense->classify chain (ops/fused_sense_ct.py Pallas FFT +
    band energies + MLP) vs the golden scalar transliteration
    (tests/golden_reference.py) on a synthesized PU scene: features to
    5e-3, MLP outputs to 2e-3, decisions bit-equal."""
    import jax
    import jax.numpy as jnp

    import golden_reference as gold
    from cognitive_radio_network_tpu.env import scene as scene_mod
    from cognitive_radio_network_tpu.models import SenseConfig, make_sense_fn
    from cognitive_radio_network_tpu.signal.mlp import reference_weights

    rng = rng or np.random.default_rng(0)
    cfg = SenseConfig()
    fn = make_sense_fn(cfg)
    params = reference_weights()
    gc = 16
    gtrace = jnp.asarray(rng.integers(0, 3, size=gc), jnp.int32)
    gpow = scene_mod.occupancy_to_powers(gtrace, 3, power=0.05)
    g_planes = jax.jit(
        scene_mod.synthesize_scene,
        static_argnums=(2,),
        static_argnames=("as_planes",),
    )(jax.random.key(7), gpow, cfg.samples_per_cycle, as_planes=True)
    g_np = np.asarray(g_planes).reshape(gc, cfg.averaging, cfg.fft_length, 2)
    g_out = fn(
        (
            jnp.asarray(g_np[..., 0].reshape(-1, cfg.fft_length)),
            jnp.asarray(g_np[..., 1].reshape(-1, cfg.fft_length)),
        ),
        params,
    )
    g_out = {k: np.asarray(v) for k, v in g_out.items()}
    feats_ref, outs_ref, decs_ref = gold.sense_classify_reference(
        g_np[..., 0] + 1j * g_np[..., 1]
    )
    np.testing.assert_allclose(g_out["features"], feats_ref, rtol=5e-3)
    np.testing.assert_allclose(g_out["outputs"], outs_ref, atol=2e-3)
    assert np.array_equal(g_out["decision"], decs_ref), (
        "on-TPU sense decisions diverge from the golden reference"
    )


def gate_fused_wideband(rng=None) -> None:
    """Fused wideband Pallas kernel vs :func:`wideband_energy_numpy` on a
    one-tile slice (bf16_3x precision -> rtol 2e-3)."""
    import jax
    import jax.numpy as jnp

    from cognitive_radio_network_tpu.ops.fused_wideband import (
        wideband_energy_fused,
    )
    from cognitive_radio_network_tpu.parallel.wideband import WidebandConfig
    from cognitive_radio_network_tpu.signal.channelizer import polyphase_taps

    rng = rng or np.random.default_rng(0)
    wcfg = WidebandConfig()
    wtaps = jnp.asarray(polyphase_taps(wcfg.num_channels, wcfg.taps_per_channel))
    wfn = jax.jit(
        lambda a, b: wideband_energy_fused(a, b, wtaps, wcfg, precision="high")
    )
    gt = 4096  # one (2M x tile_q) kernel tile
    gwr = np.asarray(rng.standard_normal(gt * wcfg.num_channels), np.float32)
    gwi = np.asarray(rng.standard_normal(gt * wcfg.num_channels), np.float32)
    g_got = np.asarray(wfn(jnp.asarray(gwr), jnp.asarray(gwi)))
    np.testing.assert_allclose(
        g_got,
        wideband_energy_numpy(gwr, gwi, np.asarray(wtaps), wcfg),
        rtol=2e-3,
        atol=1e-5,
        err_msg="on-TPU fused wideband energies diverge from the numpy oracle",
    )


def gate_ofdm_decode(rng=None):
    """One-dispatch fixed-config OFDM block receive decodes every frame of
    a synthetic burst with payloads intact.  Returns the device-resident
    block (rr, ri, n_valid, rx_fn, F, n_link) so the bench can reuse it."""
    import jax.numpy as jnp

    from cognitive_radio_network_tpu.phy import (
        OFDMFrameConfig,
        OFDMFrameGen,
        OFDMFrameSync,
    )

    rng = rng or np.random.default_rng(0)
    ocfg = OFDMFrameConfig()  # ECR defaults: 32sc/cp16/qam4/crc32/h128
    opay = 256  # reference packet size (include/crts.hpp:192-194)
    ogen = OFDMFrameGen(ocfg, opay)
    osync = OFDMFrameSync(ocfg, opay)
    F = 256
    gap = 80
    ohdr = rng.integers(0, 256, (F, 8)).astype(np.uint8)
    opays = rng.integers(0, 256, (F, opay)).astype(np.uint8)
    fr = np.asarray(ogen.assemble(ohdr, opays, as_planes=True))  # (F, L, 2)
    flen = fr.shape[1]
    n_link = F * (flen + gap)
    orr = np.zeros(n_link, np.float32)
    ori = np.zeros(n_link, np.float32)
    for i in range(F):
        s = i * (flen + gap)
        orr[s : s + flen] = fr[i, :, 0]
        ori[s : s + flen] = fr[i, :, 1]
    orr_d, ori_d = jnp.asarray(orr), jnp.asarray(ori)
    nvalid_d = jnp.int32(n_link)
    rxfn = osync.rx_block_fn(k=F)
    bests, peaks, cfos, oout, ok = rxfn(orr_d, ori_d, nvalid_d)
    okh = np.asarray(ok)
    order = np.argsort(np.asarray(bests), kind="stable")
    got = np.asarray(oout["payloads"])[order][okh[order]]
    assert okh.sum() == F and np.array_equal(got, opays), (
        "ofdm link decode failed"
    )
    return orr_d, ori_d, nvalid_d, rxfn, F, n_link


def wideband_energy_numpy_with_history(xr, xi, hist_r, hist_i, taps, cfg):
    """History-seeded transliteration: the FIR's first P-1 delay rows come
    from the preceding stream (the 4 pair rows = 8 phase rows the sharded
    pipeline ppermutes between neighbors) instead of rest-from-zero."""
    m = cfg.num_channels
    pre_r = hist_r.reshape(8, m).astype(np.float64)  # pair rows -> phase rows
    pre_i = hist_i.reshape(8, m).astype(np.float64)
    t = xr.size // m
    vr_in, vi_in = xr.reshape(t, m), xi.reshape(t, m)
    hf = taps[::-1].astype(np.float64)
    p = hf.shape[0]
    ext_r = np.concatenate([pre_r[-(p - 1) :], vr_in], axis=0)
    ext_i = np.concatenate([pre_i[-(p - 1) :], vi_in], axis=0)
    vr = np.zeros((t, m))
    vi = np.zeros((t, m))
    for s_ in range(p):
        vr += hf[s_] * ext_r[s_ : s_ + t]
        vi += hf[s_] * ext_i[s_ : s_ + t]
    ang = -2.0 * np.pi * np.outer(np.arange(m), np.arange(m)) / m
    wre, wim = np.cos(ang), np.sin(ang)
    yr = vr @ wre - vi @ wim
    yi = vr @ wim + vi @ wre
    power = yr**2 + yi**2
    return power.reshape(t // cfg.block_len, cfg.block_len, m).mean(axis=1)


def gate_sharded_wideband_history(rng=None) -> None:
    """The fused wideband kernel's ``initial_history`` path ON HARDWARE:
    a nonzero 4-pair-row FIR seed (the cross-shard ppermute state of
    parallel/wideband.py::sharded_wideband_energy_fused) must match the
    history-seeded numpy transliteration — round-3 review noted this path
    had only ever executed in interpret mode on CPU."""
    import jax
    import jax.numpy as jnp

    from cognitive_radio_network_tpu.ops.fused_wideband import (
        wideband_energy_fused,
    )
    from cognitive_radio_network_tpu.parallel.wideband import WidebandConfig
    from cognitive_radio_network_tpu.signal.channelizer import polyphase_taps

    rng = rng or np.random.default_rng(1)
    wcfg = WidebandConfig()
    m = wcfg.num_channels
    taps = np.asarray(polyphase_taps(m, wcfg.taps_per_channel), np.float32)
    t_chan = 4096  # one kernel tile
    body_r = np.asarray(rng.standard_normal(t_chan * m), np.float32)
    body_i = np.asarray(rng.standard_normal(t_chan * m), np.float32)
    # the history exactly as the sharded pipeline builds it: the previous
    # shard's last 4 PAIR rows of its (q, 2M) pair layout
    hist_r = np.asarray(rng.standard_normal((4, 2 * m)), np.float32)
    hist_i = np.asarray(rng.standard_normal((4, 2 * m)), np.float32)
    fn = jax.jit(
        lambda a, b, hr, hi: wideband_energy_fused(
            a, b, taps, wcfg, precision="high", initial_history=(hr, hi)
        )
    )
    got = np.asarray(
        fn(
            jnp.asarray(body_r),
            jnp.asarray(body_i),
            jnp.asarray(hist_r),
            jnp.asarray(hist_i),
        )
    )
    ref = wideband_energy_numpy_with_history(
        body_r, body_i, hist_r, hist_i, taps, wcfg
    )
    np.testing.assert_allclose(
        got,
        ref,
        rtol=2e-3,
        atol=1e-5,
        err_msg="history-seeded fused wideband diverges on hardware",
    )


# ----------------------------------------------------------------------
# perf floors (round-5): generous bounds far below normal variance but
# far above any real regression — shared by bench.py (asserted on the
# median-of-trials figures) and the -m tpu smoke below, so a silent 2x
# collapse of a chip number fails loudly instead of shipping.
# Context (BENCH_r01-r04 medians): sense ~34000, wideband ~19000,
# fixed-rx ~1000, adaptive (round-5 fused path) ~150-215.
# ----------------------------------------------------------------------

PERF_FLOORS = {
    "sense_msps": 15000.0,
    "wideband_msps": 8000.0,
    "ofdm_link_msps": 400.0,
    # the adaptive figure is fetch-BANDWIDTH-bound and the tunnel swings
    # 10-60 MB/s over minutes (~50 MS/s at the 10 MB/s floor), so its
    # collapse bound sits below the worst healthy-link reading, not below
    # normal variance like the scalar-fetch figures above
    "adaptive_link_msps": 40.0,
}


def gate_perf_floors(rng=None) -> None:
    """On-chip perf smoke (~30 s): the sense, wideband, and fixed-rx
    paths against PERF_FLOORS (the adaptive floor is asserted by
    bench.py, whose fixture stream is too heavy for a smoke).  Each
    figure is the BEST of 3 trials: a floor detects a kernel COLLAPSE
    (wrong lowering, lost fusion), not environment noise — on the
    tunneled backend a single trial can under-read 2-4x under host or
    tunnel contention (the round-4 driver capture did), and if any trial
    reaches the floor the kernel is healthy.  Dispatch sizes match
    bench.py: smaller batches measure the ~0.5-0.7 ms dispatch overhead,
    not the kernel."""
    import time

    import jax
    import jax.numpy as jnp

    from cognitive_radio_network_tpu.models import SenseConfig, make_sense_fn
    from cognitive_radio_network_tpu.ops.fused_wideband import (
        wideband_energy_fused,
    )
    from cognitive_radio_network_tpu.parallel.wideband import WidebandConfig
    from cognitive_radio_network_tpu.signal.channelizer import polyphase_taps
    from cognitive_radio_network_tpu.signal.mlp import reference_weights

    rng = rng or np.random.default_rng(0)

    def best_of(measure, trials=3):
        return max(measure() for _ in range(trials))

    cfg = SenseConfig()
    fn = make_sense_fn(cfg)
    params = reference_weights()
    cycles = 4096  # bench dispatch size
    n = cycles * cfg.samples_per_cycle
    iq = (
        jnp.asarray(
            rng.standard_normal(
                (cycles * cfg.averaging, cfg.fft_length), dtype=np.float32
            )
        ),
        jnp.asarray(
            rng.standard_normal(
                (cycles * cfg.averaging, cfg.fft_length), dtype=np.float32
            )
        ),
    )
    for _ in range(3):
        out = fn(iq, params)
    _ = np.asarray(out["decision"][:1])

    def sense_once():
        reps = 32
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(iq, params)
        _ = np.asarray(out["decision"][:1])
        return reps * n / (time.perf_counter() - t0) / 1e6

    sense = best_of(sense_once)
    assert sense >= PERF_FLOORS["sense_msps"], (
        f"sense collapsed: {sense:.0f} < {PERF_FLOORS['sense_msps']} MS/s"
    )

    wcfg = WidebandConfig()
    wtaps = jnp.asarray(
        polyphase_taps(wcfg.num_channels, wcfg.taps_per_channel)
    )
    wfn = jax.jit(
        lambda a, b: wideband_energy_fused(a, b, wtaps, wcfg, precision="high")
    )
    t_chan = 524288  # bench streaming block size
    wn = t_chan * wcfg.num_channels
    wxr = jnp.asarray(rng.standard_normal(wn, dtype=np.float32))
    wxi = jnp.asarray(rng.standard_normal(wn, dtype=np.float32))
    for _ in range(3):
        wout = wfn(wxr, wxi)
    _ = np.asarray(wout[:1, :1])

    def wideband_once():
        wreps = 12
        t0 = time.perf_counter()
        for _ in range(wreps):
            wout = wfn(wxr, wxi)
        _ = np.asarray(wout[:1, :1])
        return wreps * wn / (time.perf_counter() - t0) / 1e6

    wideband = best_of(wideband_once)
    assert wideband >= PERF_FLOORS["wideband_msps"], (
        f"wideband collapsed: {wideband:.0f} < "
        f"{PERF_FLOORS['wideband_msps']} MS/s"
    )

    orr_d, ori_d, nvalid_d, rxfn, F, n_link = gate_ofdm_decode(rng)

    def fixed_once():
        oreps = 32
        t0 = time.perf_counter()
        for _ in range(oreps):
            _b, _p, _c, _o, ok = rxfn(orr_d, ori_d, nvalid_d)
        _ = np.asarray(ok[:1])
        return oreps * n_link / (time.perf_counter() - t0) / 1e6

    fixed_rx = best_of(fixed_once)
    assert fixed_rx >= PERF_FLOORS["ofdm_link_msps"], (
        f"fixed-rx collapsed: {fixed_rx:.0f} < "
        f"{PERF_FLOORS['ofdm_link_msps']} MS/s"
    )


def gate_adaptive_stream(rng=None) -> None:
    """The fused adaptive stream step ON HARDWARE (phy/framesync.py::
    _stream_step_graph): a mixed-config burst with a block-straddling
    frame through process_device — in-graph candidate resolution,
    speculative dual-spec decode, device-resident residual carry, and the
    packed single-array fetch must all survive real-TPU lowering with
    payloads intact (the CPU suite runs this path in XLA:CPU only)."""
    import dataclasses as dc

    import jax.numpy as jnp

    from cognitive_radio_network_tpu.phy import OFDMFrameConfig, OFDMFrameGen
    from cognitive_radio_network_tpu.phy.framesync import StreamReceiver

    rng = rng or np.random.default_rng(5)
    cfg_a = OFDMFrameConfig()
    cfg_b = dc.replace(cfg_a, mod_scheme="qam16", fec0="none")
    gen_a = OFDMFrameGen(cfg_a, 64)
    gen_b = OFDMFrameGen(cfg_b, 48)
    f = 3
    ha = rng.integers(0, 256, (f, 8)).astype(np.uint8)
    pa = rng.integers(0, 256, (f, 64)).astype(np.uint8)
    hb = rng.integers(0, 256, (f, 8)).astype(np.uint8)
    pb = rng.integers(0, 256, (f, 48)).astype(np.uint8)
    # planes, not complex: complex64 cannot cross the device->host
    # boundary on this backend (signal/iq.py)
    pl_a = np.asarray(gen_a.assemble(ha, pa, as_planes=True))
    pl_b = np.asarray(gen_b.assemble(hb, pb, as_planes=True))
    ia = (pl_a[..., 0] + 1j * pl_a[..., 1]).astype(np.complex64)
    ib = (pl_b[..., 0] + 1j * pl_b[..., 1]).astype(np.complex64)
    n = 16000
    stream = 0.003 * (
        rng.standard_normal(n) + 1j * rng.standard_normal(n)
    ).astype(np.complex64)
    pos, placed = 60, []
    for k in range(2 * f):
        frame = ia[k // 2] if k % 2 == 0 else ib[k // 2]
        if pos + len(frame) + 50 >= n:
            break
        stream[pos : pos + len(frame)] += frame
        placed.append((pos, frame))
        pos += len(frame) + 911  # blocks of 2048 -> straddlers
    rx = StreamReceiver(cfg_a, max_frames_per_block=8)
    frames = []
    blk = 2048
    for s in range(0, n, blk):
        seg = stream[s : s + blk]
        frames += rx.process_device(
            jnp.asarray(seg.real.copy()), jnp.asarray(seg.imag.copy())
        )
    assert len(frames) == len(placed), (len(frames), len(placed))
    pays = {64: list(pa), 48: list(pb)}
    for fr, (off, _f) in zip(frames, placed):
        assert abs(fr["offset"] - off) <= 2, (fr["offset"], off)
        assert fr["stats"].payload_valid
        want = pays[len(fr["payload"])].pop(0)
        np.testing.assert_array_equal(fr["payload"], want)
