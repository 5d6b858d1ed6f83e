"""Direct unit tests for the medium fast paths and the decode-referenced
in-band squelch (round-4 review: these were only covered incidentally by
scenario integration tests)."""

import numpy as np
import pytest

from cognitive_radio_network_tpu.runtime.medium import Medium, MediumConfig
from cognitive_radio_network_tpu.runtime.radio import Radio


def _blocks(rng, n_nodes, block, silent=()):
    out = []
    for j in range(n_nodes):
        if j in silent:
            out.append(None)
        else:
            out.append(
                (rng.standard_normal(block) + 1j * rng.standard_normal(block))
                .astype(np.complex64)
            )
    return out


def _gemm_reference(gains, contributions):
    """Direct per-receiver O(N^2) mix in float64 (the oracle)."""
    n = len(contributions)
    out = []
    for i in range(n):
        acc = None
        for j, c in enumerate(contributions):
            if c is None or gains[j, i] == 0.0:
                continue
            term = gains[j, i] * c.astype(np.complex128)
            acc = term if acc is None else acc + term
        out.append(None if acc is None else acc)
    return out


class TestMediumFastPaths:
    @pytest.mark.parametrize("g", [1.0, 0.5])
    def test_uniform_matches_gemm(self, rng, g):
        n, block = 5, 256
        gains = np.full((n, n), g, np.float32)
        np.fill_diagonal(gains, 0.0)
        med = Medium(MediumConfig(block_len=block), n, gains)
        assert med._gain_cells() is not None
        contr = _blocks(rng, n, block, silent=(2,))
        got = med.propagate(contr)
        ref = _gemm_reference(gains, contr)
        for a, b in zip(got, ref):
            if b is None:
                assert a is None
            else:
                np.testing.assert_allclose(a, b.astype(np.complex64), rtol=1e-4, atol=1e-4)

    def test_celled_matches_gemm(self, rng):
        """Block-diagonal frequency-reuse matrix (the 48-node deployment
        shape) rides the per-cell total-minus-own path."""
        n, block = 9, 128
        gains = np.zeros((n, n), np.float32)
        for s, g in ((0, 1.0), (3, 0.25), (6, 2.0)):
            gains[s : s + 3, s : s + 3] = g
        np.fill_diagonal(gains, 0.0)
        med = Medium(MediumConfig(block_len=block), n, gains)
        cells = med._gain_cells()
        assert cells is not None and len(cells) == 3
        contr = _blocks(rng, n, block, silent=(1, 6, 7, 8))
        got = med.propagate(contr)
        ref = _gemm_reference(gains, contr)
        for i, (a, b) in enumerate(zip(got, ref)):
            if b is None:
                assert a is None, i
            else:
                np.testing.assert_allclose(
                    a, b.astype(np.complex64), rtol=1e-4, atol=1e-4
                )

    def test_nonuniform_falls_back_and_matches(self, rng):
        n, block = 4, 128
        gains = np.array(
            [
                [0, 1, 0.5, 0],
                [1, 0, 0.2, 0],
                [0.5, 0.2, 0, 0],
                [0, 0, 0, 0],
            ],
            np.float32,
        )
        med = Medium(MediumConfig(block_len=block), n, gains)
        assert med._gain_cells() is None  # mixed in-cell values
        contr = _blocks(rng, n, block)
        got = med.propagate(contr)
        ref = _gemm_reference(gains, contr)
        for a, b in zip(got, ref):
            if b is None:
                assert a is None
            else:
                np.testing.assert_allclose(a, b.astype(np.complex64), rtol=1e-4, atol=1e-4)

    def test_inplace_gain_mutation_invalidates_cache(self, rng):
        """Round-4 review: the structure cache must key on CONTENT —
        in-place edits of medium.gains (the established style: tests
        assign rt.medium.gains and Medium itself fill_diagonals the
        caller's array) must not reuse a stale analysis."""
        n, block = 3, 64
        med = Medium(MediumConfig(block_len=block), n)
        contr = _blocks(rng, n, block)
        _ = med.propagate(contr)  # populates the cache (uniform all-ones)
        med.gains[0, 1] = 0.0  # in-place: node 0 no longer heard by node 1
        med.gains[1, 0] = 0.0
        got = med.propagate(contr)
        ref = _gemm_reference(med.gains, contr)
        for a, b in zip(got, ref):
            np.testing.assert_allclose(a, b.astype(np.complex64), rtol=1e-4, atol=1e-4)


class TestInBandSquelch:
    """The decode-referenced in-band gate (runtime/radio.py).  Setup: a
    4 MHz medium carrying a constant OUT-OF-BAND tone (keeps the raw-floor
    gate hot, as neighboring transmitters do) and a 1 MHz rx band where
    partner frames come and go — the situation only the in-band gate can
    economize."""

    BLOCK = 16384  # medium-rate samples (-> 4096 rx samples at 4:1)

    def _radio(self):
        r = Radio(4e6, 465e6)
        r.params.rx_freq = 465e6
        r.params.rx_rate = 1e6
        r.rx_noise_power = 1e-9
        r.start_rx()
        return r

    def _oob_tone(self):
        # +1.6 MHz: inside the medium, far outside the 1 MHz rx band
        t = np.arange(self.BLOCK)
        return (0.4 * np.exp(2j * np.pi * (1.6e6 / 4e6) * t)).astype(np.complex64)

    def _frame_at_medium(self, rng, gen, offset=0):
        from cognitive_radio_network_tpu.signal.resample import resample_poly

        hdr = rng.integers(0, 256, (1, 8)).astype(np.uint8)
        pay = rng.integers(0, 256, (1, gen.payload_len)).astype(np.uint8)
        iq = resample_poly(np.asarray(gen.assemble(hdr, pay))[0], 4, 1)
        blk = np.zeros(self.BLOCK, np.complex64)
        end = min(offset + len(iq), self.BLOCK)
        blk[offset:end] = iq[: end - offset]
        return blk, pay[0]

    def test_cold_blocks_squelched_after_reference_learned(self, rng):
        from cognitive_radio_network_tpu.phy.framegen import (
            OFDMFrameConfig,
            OFDMFrameGen,
        )

        gen = OFDMFrameGen(OFDMFrameConfig(), 64)
        r = self._radio()
        tone = self._oob_tone()
        fblk, _ = self._frame_at_medium(rng, gen)
        for i in range(5):
            r.push_rx_block(fblk + tone, i * 0.01)
        assert r._ib_signal_ref is not None
        assert len(r.stats.records) >= 4
        import cognitive_radio_network_tpu.phy.framesync as fs

        calls = {"process": 0, "carry": 0}
        p0, c0 = fs.StreamReceiver.process, fs.StreamReceiver.carry
        fs.StreamReceiver.process = (
            lambda self, iq, threshold=0.2: calls.__setitem__(
                "process", calls["process"] + 1
            )
            or p0(self, iq, threshold)
        )
        fs.StreamReceiver.carry = lambda self, iq: calls.__setitem__(
            "carry", calls["carry"] + 1
        ) or c0(self, iq)
        try:
            for i in range(10):  # tone only: rx band is idle
                r.push_rx_block(tone.copy(), 0.1 + i * 0.01)
        finally:
            fs.StreamReceiver.process, fs.StreamReceiver.carry = p0, c0
        assert calls["carry"] >= 7, calls

    def test_frame_in_cold_block_tail_still_decodes(self, rng):
        """A frame whose head starts in the final samples of a cold block
        must survive the squelch via the carry tail."""
        from cognitive_radio_network_tpu.phy.framegen import (
            OFDMFrameConfig,
            OFDMFrameGen,
        )
        from cognitive_radio_network_tpu.signal.resample import resample_poly

        gen = OFDMFrameGen(OFDMFrameConfig(), 64)
        r = self._radio()
        tone = self._oob_tone()
        fblk, _ = self._frame_at_medium(rng, gen)
        for i in range(5):
            r.push_rx_block(fblk + tone, i * 0.01)
        n0 = len(r.stats.records)
        hdr = rng.integers(0, 256, (1, 8)).astype(np.uint8)
        pay = rng.integers(0, 256, (1, gen.payload_len)).astype(np.uint8)
        iq = resample_poly(np.asarray(gen.assemble(hdr, pay))[0], 4, 1)
        head = 900  # medium samples of frame head in the cold block
        tail_blk = np.zeros(self.BLOCK, np.complex64)
        tail_blk[self.BLOCK - head :] = iq[:head]
        next_blk = np.zeros(self.BLOCK, np.complex64)
        next_blk[: len(iq) - head] = iq[head:]
        r.push_rx_block(tone.copy(), 0.1)  # cold
        r.push_rx_block(tail_blk + tone, 0.11)  # cold by power, head carried
        r.push_rx_block(next_blk + tone, 0.12)  # hot: frame body
        r.push_rx_block(tone.copy(), 0.13)  # flush
        assert len(r.stats.records) >= n0 + 1, "frame lost across squelch"

    def test_reference_reacquires_after_power_drop(self, rng):
        """A legitimate >10 dB partner power drop must re-open the gate
        after at most ~one probing interval (the min(ref, 4*ibp) cap)."""
        from cognitive_radio_network_tpu.phy.framegen import (
            OFDMFrameConfig,
            OFDMFrameGen,
        )

        gen = OFDMFrameGen(OFDMFrameConfig(), 64)
        r = self._radio()
        tone = self._oob_tone()
        fblk, _ = self._frame_at_medium(rng, gen)
        for i in range(5):
            r.push_rx_block(fblk + tone, i * 0.01)
        ref_before = r._ib_signal_ref
        assert ref_before is not None
        decoded_before = len(r.stats.records)
        quiet = (fblk * 0.05).astype(np.complex64)  # -26 dB
        n_blocks = 2 * r.rx_squelch_ib_probe + 4
        for i in range(n_blocks):
            r.push_rx_block(quiet + tone, 0.1 + i * 0.01)
        decoded_quiet = len(r.stats.records) - decoded_before
        # at most one probe interval may be lost; after it the gate is open
        assert decoded_quiet >= n_blocks - r.rx_squelch_ib_probe - 2, (
            decoded_quiet,
            ref_before,
            r._ib_signal_ref,
        )
        assert r._ib_signal_ref < ref_before / 2


class TestRxScanBatching:
    """rx_scan_blocks > 1 (runtime/config.py): hot blocks accumulate and
    scan in one pass — every frame still decodes, payload-identical to the
    per-block receiver, at most one block later; cold blocks flush."""

    def test_batched_scan_decodes_all_frames(self, rng):
        from cognitive_radio_network_tpu.phy.framegen import (
            OFDMFrameConfig,
            OFDMFrameGen,
        )
        from cognitive_radio_network_tpu.signal.resample import resample_poly

        gen = OFDMFrameGen(OFDMFrameConfig(), 64)

        def radio(acc):
            r = Radio(4e6, 465e6)
            r.params.rx_freq = 465e6
            r.params.rx_rate = 1e6
            r.rx_noise_power = 1e-9
            r.rx_scan_accumulate = acc
            r.start_rx()
            return r

        f = 10
        hdr = rng.integers(0, 256, (f, 8)).astype(np.uint8)
        pay = rng.integers(0, 256, (f, 64)).astype(np.uint8)
        iq = resample_poly(np.asarray(gen.assemble(hdr, pay)), 4, 1)
        block = 16384
        blocks = []
        for k in range(f):  # one frame per hot block + straddler into next
            b = np.zeros(block, np.complex64)
            off = 1000 + (k % 3) * 2000
            end = min(off + iq.shape[1], block)
            b[off:end] = iq[k, : end - off]
            blocks.append(b)
            if end - off < iq.shape[1]:  # tail spills into a second block
                b2 = np.zeros(block, np.complex64)
                b2[: iq.shape[1] - (end - off)] = iq[k, end - off :]
                blocks.append(b2)
        blocks.append(np.zeros(block, np.complex64))  # cold: flush
        blocks.append(np.zeros(block, np.complex64))
        r1, r2 = radio(1), radio(2)
        for i, b in enumerate(blocks):
            r1.push_rx_block(b.copy(), i * 0.01)
            r2.push_rx_block(b.copy(), i * 0.01)
        n1 = len(r1.stats.records)
        n2 = len(r2.stats.records)
        assert n1 == f, n1
        assert n2 == f, n2
        e1 = [m for m in r1.drain_events()]
        e2 = [m for m in r2.drain_events()]
        pay1 = [bytes(m.payload) for m in e1 if m.payload is not None]
        pay2 = [bytes(m.payload) for m in e2 if m.payload is not None]
        assert pay1 == pay2 == [bytes(p) for p in pay]

    def test_tail_frames_flush_at_finalize(self, rng):
        """Code-review r5 regression: with rx_scan_blocks > 1 a run ending
        mid-accumulation must not lose the held frames — flush_rx_scan
        (called by the runtimes' finalize path) recovers them."""
        from cognitive_radio_network_tpu.phy.framegen import (
            OFDMFrameConfig,
            OFDMFrameGen,
        )
        from cognitive_radio_network_tpu.signal.resample import resample_poly

        gen = OFDMFrameGen(OFDMFrameConfig(), 64)
        r = Radio(4e6, 465e6)
        r.params.rx_freq = 465e6
        r.params.rx_rate = 1e6
        r.rx_noise_power = 1e-9
        r.rx_scan_accumulate = 4
        r.start_rx()
        hdr = rng.integers(0, 256, (1, 8)).astype(np.uint8)
        pay = rng.integers(0, 256, (1, 64)).astype(np.uint8)
        iq = resample_poly(np.asarray(gen.assemble(hdr, pay)), 4, 1)
        blk = np.zeros(16384, np.complex64)
        blk[1000 : 1000 + iq.shape[1]] = iq[0]
        r.push_rx_block(blk, 0.0)  # one hot block: held by the batcher
        assert len(r.stats.records) == 0  # not scanned yet
        r.flush_rx_scan(0.004)
        assert len(r.stats.records) == 1  # the tail frame is recovered
        np.testing.assert_array_equal(
            r.rx_packet_sink[0][1] if r.rx_packet_sink else
            next(m.payload for m in r._events if m.payload is not None),
            pay[0],
        )
