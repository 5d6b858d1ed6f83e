"""OFDM link loopback tests: framegen -> channel -> framesync."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cognitive_radio_network_tpu.phy import OFDMFrameConfig, OFDMFrameGen, OFDMFrameSync
from cognitive_radio_network_tpu.signal.msequence import msequence_bytes


def _frames(gen, rng, b=4):
    headers = rng.integers(0, 256, (b, 8)).astype(np.uint8)
    payloads = rng.integers(0, 256, (b, gen.payload_len)).astype(np.uint8)
    return headers, payloads


class TestLoopbackClean:
    @pytest.mark.parametrize(
        "mod,fec0,fec1",
        [("qam4", "h128", "none"), ("qam16", "v27", "none"), ("bpsk", "none", "none")],
    )
    def test_roundtrip(self, rng, mod, fec0, fec1):
        cfg = OFDMFrameConfig(mod_scheme=mod, fec0=fec0, fec1=fec1)
        gen = OFDMFrameGen(cfg, payload_len=64)
        sync = OFDMFrameSync(cfg, payload_len=64)
        headers, payloads = _frames(gen, rng)
        iq = gen.assemble(headers, payloads)
        stats, hdr, pay = sync.demod_aligned(iq)
        assert all(s.header_valid and s.payload_valid for s in stats)
        np.testing.assert_array_equal(hdr, headers)
        np.testing.assert_array_equal(pay, payloads)
        assert all(s.evm < -20 for s in stats)  # clean channel: tiny EVM

    def test_planes_input(self, rng):
        cfg = OFDMFrameConfig()
        gen = OFDMFrameGen(cfg, payload_len=32)
        sync = OFDMFrameSync(cfg, payload_len=32)
        headers, payloads = _frames(gen, rng, b=2)
        planes = gen.assemble(headers, payloads, as_planes=True)
        assert planes.shape[-1] == 2 and planes.dtype == jnp.float32
        stats, hdr, pay = sync.demod_aligned(planes)
        np.testing.assert_array_equal(pay, payloads)

    def test_ecr_default_config_dimensions(self):
        """ECR defaults: 32 subcarriers, cp 16, taper 4, qam4, crc32, h128
        (src/extensible_cognitive_radio.cpp:52-56, :100-104)."""
        cfg = OFDMFrameConfig()
        assert (cfg.num_subcarriers, cfg.cp_len, cfg.taper_len) == (32, 16, 4)
        assert (cfg.mod_scheme, cfg.crc_scheme, cfg.fec0) == ("qam4", "crc32", "h128")
        gen = OFDMFrameGen(cfg, payload_len=64)
        assert gen.frame_len == 2 * 32 + 48 + gen.num_symbols * 48


class TestLoopbackImpaired:
    def test_awgn(self, rng):
        cfg = OFDMFrameConfig(mod_scheme="qam4", fec0="h128")
        gen = OFDMFrameGen(cfg, payload_len=64)
        sync = OFDMFrameSync(cfg, payload_len=64)
        headers, payloads = _frames(gen, rng)
        iq = np.asarray(gen.assemble(headers, payloads))
        snr_db = 20.0
        p = np.mean(np.abs(iq) ** 2)
        sigma = np.sqrt(p / 10 ** (snr_db / 10) / 2)
        noisy = iq + sigma * (
            rng.standard_normal(iq.shape) + 1j * rng.standard_normal(iq.shape)
        ).astype(np.complex64)
        stats, hdr, pay = sync.demod_aligned(jnp.asarray(noisy))
        assert all(s.payload_valid for s in stats)
        np.testing.assert_array_equal(pay, payloads)
        assert all(-30 < s.evm < -5 for s in stats)

    def test_cfo_and_detection(self, rng):
        cfg = OFDMFrameConfig()
        gen = OFDMFrameGen(cfg, payload_len=48)
        sync = OFDMFrameSync(cfg, payload_len=48)
        headers, payloads = _frames(gen, rng, b=1)
        iq = np.asarray(gen.assemble(headers, payloads))[0]
        # place the frame at an offset inside a noisy block, apply CFO
        offset = 333
        cfo = 0.002  # rad/sample
        n_total = offset + len(iq) + 500
        block = 0.01 * (
            rng.standard_normal(n_total) + 1j * rng.standard_normal(n_total)
        ).astype(np.complex64)
        n = np.arange(len(iq))
        block[offset : offset + len(iq)] += iq * np.exp(1j * cfo * n)
        got_off, stats, hdr, pay = sync.receive(jnp.asarray(block))
        assert got_off is not None
        assert abs(got_off - offset) <= 2
        assert abs(stats.cfo - cfo) < 5e-4
        assert stats.payload_valid
        np.testing.assert_array_equal(pay, payloads[0])

    def test_flat_channel_gain_phase(self, rng):
        """S1 channel estimation must absorb a flat complex channel."""
        cfg = OFDMFrameConfig(mod_scheme="qam16", fec0="h128")
        gen = OFDMFrameGen(cfg, payload_len=40)
        sync = OFDMFrameSync(cfg, payload_len=40)
        headers, payloads = _frames(gen, rng, b=2)
        iq = np.asarray(gen.assemble(headers, payloads))
        h = 0.35 * np.exp(1j * 1.1)
        stats, hdr, pay = sync.demod_aligned(jnp.asarray(iq * h))
        assert all(s.payload_valid for s in stats)
        np.testing.assert_array_equal(pay, payloads)


def _stream_with_frames(rng, gen, headers, payloads, gaps=(50, 400)):
    """Noise-padded stream with B frames at random gaps; returns (iq, offsets)."""
    iq = np.asarray(gen.assemble(headers, payloads))
    parts, offs, pos = [], [], 0
    for i in range(iq.shape[0]):
        g = int(rng.integers(*gaps))
        parts.append(
            0.01
            * (rng.standard_normal(g) + 1j * rng.standard_normal(g)).astype(
                np.complex64
            )
        )
        pos += g
        offs.append(pos)
        parts.append(iq[i])
        pos += iq.shape[1]
    parts.append(np.zeros(600, np.complex64))
    return np.concatenate(parts), offs


class TestBatchedReceive:
    """The O(1)-dispatch rx paths: fused fixed-config block receive and the
    adaptive StreamReceiver (both decode FEC+CRC in-graph)."""

    def test_receive_block_multi_frame(self, rng):
        cfg = OFDMFrameConfig()
        gen = OFDMFrameGen(cfg, payload_len=64)
        sync = OFDMFrameSync(cfg, payload_len=64)
        b = 6
        headers = rng.integers(0, 256, (b, 8)).astype(np.uint8)
        payloads = rng.integers(0, 256, (b, 64)).astype(np.uint8)
        stream, offs = _stream_with_frames(rng, gen, headers, payloads)
        frames = sync.receive_block(stream, k=16)
        assert len(frames) == b
        for f, o, h, p in zip(frames, offs, headers, payloads):
            assert abs(f["offset"] - o) <= 2
            np.testing.assert_array_equal(f["header"], h)
            np.testing.assert_array_equal(f["payload"], p)
            assert f["stats"].payload_valid

    def test_stream_receiver_straddling_blocks(self, rng):
        from cognitive_radio_network_tpu.phy.framesync import StreamReceiver

        cfg = OFDMFrameConfig()
        gen = OFDMFrameGen(cfg, payload_len=64)
        b = 6
        headers = rng.integers(0, 256, (b, 8)).astype(np.uint8)
        payloads = rng.integers(0, 256, (b, 64)).astype(np.uint8)
        stream, offs = _stream_with_frames(rng, gen, headers, payloads)
        rx = StreamReceiver(cfg)
        got = []
        blk = 777  # deliberately much smaller than frame_len
        for s in range(0, len(stream), blk):
            got += rx.process(stream[s : s + blk])
        assert len(got) == b
        for f, o, p in zip(got, offs, payloads):
            assert abs(f["offset"] - o) <= 2
            np.testing.assert_array_equal(f["payload"], p)

    def test_stream_receiver_mixed_configs(self, rng):
        """Adaptive receive: per-frame (len, mod, fec) from the PHY header —
        two different payload configs interleaved in one stream."""
        from cognitive_radio_network_tpu.phy.framesync import StreamReceiver

        cfg_a = OFDMFrameConfig()  # qam4 / h128
        cfg_b = OFDMFrameConfig(mod_scheme="qam16", fec0="v27", fec1="none")
        gen_a = OFDMFrameGen(cfg_a, payload_len=40)
        gen_b = OFDMFrameGen(cfg_b, payload_len=96)
        pay_a = rng.integers(0, 256, (2, 40)).astype(np.uint8)
        pay_b = rng.integers(0, 256, (2, 96)).astype(np.uint8)
        hdr = rng.integers(0, 256, (4, 8)).astype(np.uint8)
        iq_a = np.asarray(gen_a.assemble(hdr[:2], pay_a))
        iq_b = np.asarray(gen_b.assemble(hdr[2:], pay_b))
        gap = np.zeros(300, np.complex64)
        stream = np.concatenate(
            [gap, iq_a[0], gap, iq_b[0], gap, iq_a[1], gap, iq_b[1], gap]
        )
        rx = StreamReceiver(cfg_a)
        got = []
        for s in range(0, len(stream), 1500):
            got += rx.process(stream[s : s + 1500])
        assert len(got) == 4
        pays = {len(f["payload"]) for f in got}
        assert pays == {40, 96}
        for f in got:
            assert f["stats"].payload_valid
        np.testing.assert_array_equal(
            [f["payload"] for f in got if len(f["payload"]) == 40], pay_a
        )
        np.testing.assert_array_equal(
            [f["payload"] for f in got if len(f["payload"]) == 96], pay_b
        )

    def test_v27_v27_link(self, rng):
        """The predictive scenario's SU link coding: conv K=7 r=1/2 inner AND
        outer (scenarios/predictive_model.cfg:81-82), Viterbi decoded
        in-graph twice."""
        cfg = OFDMFrameConfig(mod_scheme="qam16", fec0="v27", fec1="v27")
        gen = OFDMFrameGen(cfg, payload_len=64)
        sync = OFDMFrameSync(cfg, payload_len=64)
        headers, payloads = _frames(gen, rng, b=3)
        iq = gen.assemble(headers, payloads)
        stats, hdr, pay = sync.demod_aligned(iq)
        assert all(s.payload_valid for s in stats)
        np.testing.assert_array_equal(pay, payloads)


class TestBEROracle:
    def test_msequence_payload_ber(self, rng):
        """The reference's known-payload BER oracle: payload is the degree-12
        m-sequence (src/extensible_cognitive_radio.cpp:88-94); rx computes BER
        vs the regenerated sequence."""
        cfg = OFDMFrameConfig(mod_scheme="qam4", fec0="none")
        payload = msequence_bytes(256)
        gen = OFDMFrameGen(cfg, payload_len=256)
        sync = OFDMFrameSync(cfg, payload_len=256)
        header = np.zeros(8, np.uint8)
        iq = gen.assemble(header[None], payload[None])
        _, _, pay = sync.demod_aligned(iq)
        known = msequence_bytes(256)
        ber = np.unpackbits(pay[0] ^ known).mean()
        assert ber == 0.0


class TestDeviceResidentStreaming:
    """process_device must bit-match process on the same stream, including
    frames straddling block boundaries and mixed per-frame configs, while
    keeping the residual carry on device."""

    def test_matches_host_process_across_blocks(self, rng):
        import dataclasses as dc

        import jax.numpy as jnp

        from cognitive_radio_network_tpu.phy.framegen import (
            OFDMFrameConfig,
            OFDMFrameGen,
        )
        from cognitive_radio_network_tpu.phy.framesync import StreamReceiver

        cfg_a = OFDMFrameConfig()
        cfg_b = dc.replace(cfg_a, mod_scheme="qam16", fec0="none")
        gen_a = OFDMFrameGen(cfg_a, 48)
        gen_b = OFDMFrameGen(cfg_b, 40)
        f = 6
        ha = rng.integers(0, 256, (f, 8)).astype(np.uint8)
        pa = rng.integers(0, 256, (f, 48)).astype(np.uint8)
        hb = rng.integers(0, 256, (f, 8)).astype(np.uint8)
        pb = rng.integers(0, 256, (f, 40)).astype(np.uint8)
        ia = np.asarray(gen_a.assemble(ha, pa))
        ib = np.asarray(gen_b.assemble(hb, pb))
        n = 14000
        stream = 0.003 * (
            rng.standard_normal(n) + 1j * rng.standard_normal(n)
        ).astype(np.complex64)
        pos, k = 50, 0
        placed = 0
        while k < f and pos + max(ia.shape[1], ib.shape[1]) < n:
            frame = ia[k] if k % 2 == 0 else ib[k]
            stream[pos : pos + len(frame)] += frame
            pos += len(frame) + 997  # blocks of 1536 -> straddlers galore
            placed += 1
            k += 1
        host_rx = StreamReceiver(cfg_a, max_frames_per_block=8)
        dev_rx = StreamReceiver(cfg_a, max_frames_per_block=8)
        blk = 1536
        host_frames, dev_frames = [], []
        for s in range(0, n, blk):
            seg = stream[s : s + blk]
            host_frames += host_rx.process(seg)
            dev_frames += dev_rx.process_device(
                jnp.asarray(seg.real), jnp.asarray(seg.imag)
            )
        assert len(host_frames) == placed
        assert len(dev_frames) == len(host_frames)
        for hf, df in zip(host_frames, dev_frames):
            assert hf["offset"] == df["offset"]
            np.testing.assert_array_equal(hf["payload"], df["payload"])
            np.testing.assert_array_equal(hf["header"], df["header"])
            assert hf["stats"].mod_scheme == df["stats"].mod_scheme

    def test_pipelined_feed_matches_sync(self, rng):
        """feed_device with a lag (steps stay in flight, state chained on
        device) must produce the same frame sequence as the synchronous
        process_device path."""
        import jax.numpy as jnp

        from cognitive_radio_network_tpu.phy.framegen import (
            OFDMFrameConfig,
            OFDMFrameGen,
        )
        from cognitive_radio_network_tpu.phy.framesync import StreamReceiver

        cfg = OFDMFrameConfig()
        gen = OFDMFrameGen(cfg, 48)
        f = 5
        h = rng.integers(0, 256, (f, 8)).astype(np.uint8)
        p = rng.integers(0, 256, (f, 48)).astype(np.uint8)
        iq = np.asarray(gen.assemble(h, p))
        n = 12000
        stream = 0.003 * (
            rng.standard_normal(n) + 1j * rng.standard_normal(n)
        ).astype(np.complex64)
        pos = 60
        placed = 0
        for k in range(f):
            if pos + iq.shape[1] >= n:
                break
            stream[pos : pos + iq.shape[1]] += iq[k]
            pos += iq.shape[1] + 613
            placed += 1
        sync_rx = StreamReceiver(cfg, max_frames_per_block=8)
        pipe_rx = StreamReceiver(cfg, max_frames_per_block=8)
        blk = 1536
        sync_frames, pipe_frames = [], []
        for s in range(0, n, blk):
            seg = stream[s : s + blk]
            br, bi = jnp.asarray(seg.real), jnp.asarray(seg.imag)
            sync_frames += sync_rx.process_device(br, bi)
            pipe_frames += pipe_rx.feed_device(br, bi, max_lag=3)
        pipe_frames += pipe_rx.flush()
        assert len(sync_frames) == placed
        assert len(pipe_frames) == len(sync_frames)
        for sf, pf in zip(sync_frames, pipe_frames):
            assert sf["offset"] == pf["offset"]
            np.testing.assert_array_equal(sf["payload"], pf["payload"])
            np.testing.assert_array_equal(sf["header"], pf["header"])


class TestPhyGeometry:
    def test_matches_generator_sizing(self):
        """_phy_geometry's in-graph frame lengths must equal OFDMFrameGen's
        sizing for every (mod, fec0, fec1, crc, payload_len) combination —
        the in-graph candidate resolution depends on exact lengths."""
        import itertools

        from cognitive_radio_network_tpu.phy import crc as crc_mod
        from cognitive_radio_network_tpu.phy import fec as fec_mod
        from cognitive_radio_network_tpu.phy import modem
        from cognitive_radio_network_tpu.phy.framegen import (
            gen_for,
            pack_phy_header,
        )
        from cognitive_radio_network_tpu.phy.framesync import _phy_geometry

        layout = gen_for(OFDMFrameConfig(), 1)
        combos = list(
            itertools.product(
                modem.SCHEMES,
                fec_mod.SCHEMES,
                ("none", "v27"),
                crc_mod.SCHEMES,
                (1, 40, 256, 1000),
            )
        )
        phys, want = [], []
        import dataclasses as dc

        for mod, f0, f1, crc, plen in combos:
            cfg = OFDMFrameConfig(
                mod_scheme=mod, fec0=f0, fec1=f1, crc_scheme=crc
            )
            phys.append(pack_phy_header(cfg, plen))
            want.append(gen_for(cfg, plen).frame_len)
        flen, valid = _phy_geometry(layout, jnp.asarray(np.stack(phys)))
        np.testing.assert_array_equal(np.asarray(flen), want)
        assert bool(np.asarray(valid).all())
        # out-of-range scheme ids must be flagged invalid
        bad = np.array([[4, 0, 99, 0, 0, 0], [4, 0, 0, 9, 9, 9]], np.uint8)
        _, v = _phy_geometry(layout, jnp.asarray(bad))
        assert not np.asarray(v).any()


class TestStreamingApiEquivalence:
    """Randomized equivalence of the three streaming APIs: host process(),
    synchronous process_device(), and pipelined feed_device()/flush() must
    produce identical frame sequences over random mixed-config streams
    with random block sizes and pipeline lags."""

    @pytest.mark.parametrize("seed", [0, 3, 5])
    def test_random_streams_bitmatch(self, seed):
        import dataclasses as dc

        from cognitive_radio_network_tpu.phy.framesync import StreamReceiver

        rng = np.random.default_rng(seed)
        base = OFDMFrameConfig()
        mods = ["qam4", "qam16", "bpsk"]
        fecs = ["h128", "none", "rep3"]
        n = int(rng.integers(8000, 20000))
        stream = 0.004 * (
            rng.standard_normal(n) + 1j * rng.standard_normal(n)
        ).astype(np.complex64)
        placed = []
        pos = int(rng.integers(0, 400))
        while True:
            cfg = dc.replace(
                base,
                mod_scheme=mods[rng.integers(0, len(mods))],
                fec0=fecs[rng.integers(0, len(fecs))],
            )
            gen = OFDMFrameGen(cfg, int(rng.integers(8, 120)))
            if pos + gen.frame_len + 50 >= n:
                break
            h = rng.integers(0, 256, (1, 8)).astype(np.uint8)
            p = rng.integers(0, 256, (1, gen.payload_len)).astype(np.uint8)
            iq = np.asarray(gen.assemble(h, p))[0]
            stream[pos : pos + len(iq)] += iq
            placed.append((pos, p[0]))
            pos += len(iq) + int(rng.integers(300, 1200))
        blk = int(rng.integers(900, 4000))
        rx_h = StreamReceiver(base, max_frames_per_block=16)
        rx_d = StreamReceiver(base, max_frames_per_block=16)
        rx_p = StreamReceiver(base, max_frames_per_block=16)
        fh, fd, fp = [], [], []
        for s in range(0, n, blk):
            seg = stream[s : s + blk]
            fh += rx_h.process(seg)
            br = jnp.asarray(seg.real.copy())
            bi = jnp.asarray(seg.imag.copy())
            fd += rx_d.process_device(br, bi)
            fp += rx_p.feed_device(br, bi, max_lag=int(rng.integers(0, 5)))
        fp += rx_p.flush()
        assert len(fh) == len(placed)
        assert len(fd) == len(fh) and len(fp) == len(fh)
        for a, b, c in zip(fh, fd, fp):
            assert a["offset"] == b["offset"] == c["offset"]
            np.testing.assert_array_equal(a["payload"], b["payload"])
            np.testing.assert_array_equal(a["payload"], c["payload"])
            np.testing.assert_array_equal(a["header"], b["header"])
        for (off, pay), f in zip(placed, fh):
            assert abs(f["offset"] - off) <= 2
            np.testing.assert_array_equal(f["payload"], pay)

    def test_variable_block_sizes_pipeline(self):
        """feed_device with a DIFFERENT block size every call: each size
        compiles its own step shape and closes the open fetch group, and
        the device-chained residual must still carry exactly (bit-match
        vs the host path)."""
        import dataclasses as dc

        from cognitive_radio_network_tpu.phy.framesync import StreamReceiver

        rng = np.random.default_rng(103)
        base = OFDMFrameConfig()
        n = 16000
        stream = 0.004 * (
            rng.standard_normal(n) + 1j * rng.standard_normal(n)
        ).astype(np.complex64)
        placed, pos = [], 200
        while True:
            cfg = dc.replace(
                base, mod_scheme=["qam4", "qam16"][rng.integers(0, 2)]
            )
            gen = OFDMFrameGen(cfg, int(rng.integers(16, 100)))
            if pos + gen.frame_len + 50 >= n:
                break
            h = rng.integers(0, 256, (1, 8)).astype(np.uint8)
            p = rng.integers(0, 256, (1, gen.payload_len)).astype(np.uint8)
            iq = np.asarray(gen.assemble(h, p))[0]
            stream[pos : pos + len(iq)] += iq
            placed.append((pos, p[0]))
            pos += len(iq) + int(rng.integers(400, 900))
        rx_h = StreamReceiver(base, max_frames_per_block=16)
        rx_p = StreamReceiver(base, max_frames_per_block=16)
        fh, fp, s = [], [], 0
        while s < n:
            blk = int(rng.integers(700, 3500))
            seg = stream[s : s + blk]
            s += blk
            fh += rx_h.process(seg)
            fp += rx_p.feed_device(
                jnp.asarray(seg.real.copy()),
                jnp.asarray(seg.imag.copy()),
                max_lag=int(rng.integers(0, 4)),
            )
        fp += rx_p.flush()
        assert len(fh) == len(placed) and len(fp) == len(fh)
        for a, c in zip(fh, fp):
            assert a["offset"] == c["offset"]
            np.testing.assert_array_equal(a["payload"], c["payload"])
            np.testing.assert_array_equal(a["header"], c["header"])
        for (off, pay), f in zip(placed, fh):  # ground truth, not just parity
            assert abs(f["offset"] - off) <= 2
            np.testing.assert_array_equal(f["payload"], pay)
