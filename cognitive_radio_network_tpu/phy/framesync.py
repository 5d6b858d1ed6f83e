"""OFDM frame synchronizer — the ``ofdmflexframesync`` capability, batched.

liquid's synchronizer is a per-sample adaptive state machine (AGC, squelch,
timing PLL) driven inside ``ECR_rx_worker``'s hot loop
(src/extensible_cognitive_radio.cpp:1299-1366).  The TPU-native design is
block-oriented and batched instead:

* **detect**: Schmidl&Cox autocorrelation metric over a whole IQ block at
  once (vectorized correlation, one fused graph) finds S0 preambles and gives
  coarse CFO from the autocorrelation phase;
* **demod**: given frame-aligned IQ, the entire frame demodulates as one
  batched graph — CP strip, FFT across all symbols at once, one-shot channel
  estimate from S1, per-symbol pilot common-phase tracking, equalize,
  min-distance demod;
* **decode** (host): FEC + CRC bit-plumbing, emitting a
  :class:`FrameSyncStats` record per frame with the same fields as the
  vendored framesyncstats contract (framesyncstats.c:39-55: evm, rssi, cfo,
  framesyms count, mod scheme/bps, check, fec0, fec1).

Streaming state across block boundaries (a frame straddling two blocks) is
carried by overlapping consecutive blocks by ``frame_len`` samples — the
overlap-save pattern; see parallel/halo.py for the sharded version.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cognitive_radio_network_tpu.phy import crc as crc_mod
from cognitive_radio_network_tpu.phy import fec as fec_mod
from cognitive_radio_network_tpu.phy import modem
from cognitive_radio_network_tpu.phy.bits import pack_bits
from cognitive_radio_network_tpu.phy.framegen import (
    HEADER_BYTES,
    _HEADER_CRC,
    _HEADER_FEC,
    _HEADER_MOD,
    OFDMFrameConfig,
    OFDMFrameGen,
)
from cognitive_radio_network_tpu.signal.iq import split_iq

__all__ = ["FrameSyncStats", "OFDMFrameSync"]


@dataclasses.dataclass
class FrameSyncStats:
    """Per-frame receive statistics (framesyncstats.c:39-55 contract)."""

    evm: float  # error vector magnitude [dB]
    rssi: float  # received signal strength [dB]
    cfo: float  # carrier frequency offset [rad/sample]
    num_framesyms: int
    mod_scheme: str
    mod_bps: int
    check: str
    fec0: str
    fec1: str
    header_valid: bool
    payload_valid: bool


class OFDMFrameSync:
    def __init__(self, cfg: OFDMFrameConfig, payload_len: int):
        self.cfg = cfg
        self.payload_len = payload_len
        self.gen = OFDMFrameGen(cfg, payload_len)  # shares sizing/preambles
        self._demod = jax.jit(self._demod_graph)

    # ------------------------------------------------------------------
    # detection
    # ------------------------------------------------------------------

    def detect(self, iq, threshold: float = 0.5):
        """Schmidl&Cox over a block: returns (metric (n,), best_offset, cfo).

        The S0 symbol occupies every 2nd active bin, so its time domain
        repeats with period L = M/2. P(d) = sum_{k<L} r*[d+k] r[d+k+L];
        M(d) = |P|^2 / R^2. CFO = angle(P(d*)) / L.
        """
        re, im = split_iq(iq)
        r = re + 1j * im
        m = self.cfg.num_subcarriers
        half = m // 2
        lag = r[half:] * jnp.conj(r[:-half])
        # windowed sums over win samples (both S0 symbols span 2m)
        win = 2 * m - half
        c = jnp.cumsum(jnp.concatenate([jnp.zeros(1, lag.dtype), lag]))
        p = c[win:] - c[:-win]
        # normalize by the energy of BOTH halves of the correlation window —
        # one-sided normalization explodes when the early half is pure noise
        pw = jnp.abs(r) ** 2
        cw = jnp.cumsum(jnp.concatenate([jnp.zeros(1), pw]))
        e1 = cw[win:-half] - cw[: -(win + half)]  # energy of r[d : d+win]
        e2 = cw[win + half :] - cw[half:-win]  # energy of r[d+half : d+half+win]
        metric = jnp.abs(p) ** 2 / jnp.maximum(e1 * e2, 1e-20)
        coarse = jnp.argmax(metric)
        cfo = jnp.angle(p[coarse]) / half

        # The S&C metric plateaus (|P| and R shrink together during partial
        # overlap), so refine with a CFO-corrected matched filter against the
        # known 2x-S0 template in a +-2m window around the coarse peak.
        tmpl = jnp.asarray(
            np.concatenate([self.gen.S0_time, self.gen.S0_time]).astype(np.complex64)
        )
        tlen = tmpl.shape[0]
        span = 2 * m
        k = jnp.arange(tlen)
        rot = jnp.exp(-1j * cfo * k.astype(jnp.float32))
        starts = jnp.clip(
            coarse - span + jnp.arange(2 * span + 1), 0, r.shape[0] - tlen
        )
        wins = r[starts[:, None] + k[None, :]]  # (2*span+1, tlen)
        xc = jnp.abs(jnp.sum(wins * rot[None] * jnp.conj(tmpl)[None], axis=-1)) ** 2
        we = jnp.sum(jnp.abs(wins) ** 2, axis=-1)
        fine = jnp.argmax(xc / jnp.maximum(we, 1e-12))
        best = starts[fine]
        # final CFO from the autocorrelation at the refined offset
        cfo = jnp.angle(p[jnp.clip(best, 0, p.shape[0] - 1)]) / half
        return metric, best, cfo

    # ------------------------------------------------------------------
    # aligned demodulation (device graph)
    # ------------------------------------------------------------------

    def _demod_graph(self, re, im, cfo):
        """re/im: (B, frame_len). Returns dict of per-frame arrays."""
        cfg = self.cfg
        g = self.gen
        m, cp = cfg.num_subcarriers, cfg.cp_len
        r = (re + 1j * im).astype(jnp.complex64)
        b = r.shape[0]

        # CFO correction
        n = jnp.arange(r.shape[1], dtype=jnp.float32)
        r = r * jnp.exp(-1j * cfo[:, None] * n)

        rssi = 10.0 * jnp.log10(jnp.mean(jnp.abs(r) ** 2, axis=-1) + 1e-20)

        # slice S1 (skip its CP) and the body symbols
        s1_start = 2 * m + cp
        s1_t = r[:, s1_start : s1_start + m]
        body = r[:, s1_start + m :]
        sym = body.reshape(b, g.num_symbols, m + cp)[:, :, cp:]

        y1 = jnp.fft.fft(s1_t, axis=-1) / np.sqrt(m)
        x1 = jnp.asarray(g.S1_freq)
        act = jnp.asarray(g.active_idx)
        h = jnp.ones((b, m), jnp.complex64)
        h = h.at[:, act].set(y1[:, act] * jnp.conj(x1[act]) / (jnp.abs(x1[act]) ** 2))

        y = jnp.fft.fft(sym, axis=-1) / np.sqrt(m)
        yeq = y / jnp.maximum(jnp.abs(h[:, None, :]), 1e-9) / jnp.exp(
            1j * jnp.angle(h[:, None, :])
        )

        # pilot common-phase per symbol
        if len(g.pilot_idx):
            pidx = jnp.asarray(g.pilot_idx)
            pilots = jnp.asarray(g.pilots)  # (num_symbols, n_pilots)
            dot = jnp.sum(yeq[:, :, pidx] * jnp.conj(pilots[None]), axis=-1)
            phase = jnp.angle(dot)
            yeq = yeq * jnp.exp(-1j * phase)[:, :, None]

        didx = jnp.asarray(g.data_idx)
        data = yeq[:, :, didx]  # (B, num_symbols, nd)
        hdr_pts = data[:, : g.n_header_syms].reshape(b, -1)
        pay_pts = data[:, g.n_header_syms :].reshape(b, -1)

        hdr_syms, hdr_evm = modem.demodulate(_HEADER_MOD, hdr_pts)
        pay_syms, pay_evm = modem.demodulate(cfg.mod_scheme, pay_pts)

        # symbols -> bits
        hdr_bits = hdr_syms[:, : g.n_header_bits].astype(jnp.uint8)
        shifts = jnp.arange(g.bps - 1, -1, -1, dtype=jnp.int32)
        pay_bits = ((pay_syms[:, :, None] >> shifts) & 1).reshape(b, -1).astype(
            jnp.uint8
        )[:, : g.payload_enc_bytes * 8]

        n_used = g.n_header_bits // 1 + g.payload_enc_bytes * 8 // g.bps
        evm_lin = (
            jnp.sum(hdr_evm[:, : g.n_header_bits], axis=-1)
            + jnp.sum(pay_evm[:, : g.payload_enc_bytes * 8 // g.bps], axis=-1)
        ) / n_used
        evm_db = 10.0 * jnp.log10(evm_lin + 1e-20)

        return {
            "header_bits": hdr_bits,
            "payload_bits": pay_bits,
            "evm_db": evm_db,
            "rssi_db": rssi,
        }

    # ------------------------------------------------------------------
    # public receive paths
    # ------------------------------------------------------------------

    def demod_aligned(self, iq, cfo=None):
        """Frame-aligned IQ (B, frame_len) [complex or planes] -> decoded frames.

        Returns (stats list[FrameSyncStats], headers (B,8) uint8,
        payloads (B,P) uint8).
        """
        re, im = split_iq(iq)
        if re.ndim == 1:
            re, im = re[None], im[None]
        b = re.shape[0]
        cfo_arr = jnp.zeros((b,), jnp.float32) if cfo is None else jnp.asarray(
            cfo, jnp.float32
        ).reshape(b)
        out = self._demod(re, im, cfo_arr)
        hdr_bits = np.asarray(out["header_bits"])
        pay_bits = np.asarray(out["payload_bits"])
        evm = np.asarray(out["evm_db"])
        rssi = np.asarray(out["rssi_db"])
        cfo_np = np.asarray(cfo_arr)

        g = self.gen
        stats, headers, payloads = [], [], []
        for i in range(b):
            hdr_enc = pack_bits(hdr_bits[i])
            hdr_dec = fec_mod.decode(
                _HEADER_FEC, hdr_enc, HEADER_BYTES + crc_mod.crc_sizes(_HEADER_CRC)
            )
            hdr_ok = crc_mod.crc_validate(_HEADER_CRC, hdr_dec)
            header = hdr_dec[:HEADER_BYTES]

            pay_enc = pack_bits(pay_bits[i])
            n0 = fec_mod.encoded_length(
                self.cfg.fec0,
                self.payload_len + crc_mod.crc_sizes(self.cfg.crc_scheme),
            )
            inner = fec_mod.decode(self.cfg.fec1, pay_enc, n0)
            pay_dec = fec_mod.decode(
                self.cfg.fec0,
                inner,
                self.payload_len + crc_mod.crc_sizes(self.cfg.crc_scheme),
            )
            pay_ok = crc_mod.crc_validate(self.cfg.crc_scheme, pay_dec)
            payload = pay_dec[: self.payload_len]

            stats.append(
                FrameSyncStats(
                    evm=float(evm[i]),
                    rssi=float(rssi[i]),
                    cfo=float(cfo_np[i]),
                    num_framesyms=g.num_symbols,
                    mod_scheme=self.cfg.mod_scheme,
                    mod_bps=g.bps,
                    check=self.cfg.crc_scheme,
                    fec0=self.cfg.fec0,
                    fec1=self.cfg.fec1,
                    header_valid=bool(hdr_ok),
                    payload_valid=bool(pay_ok),
                )
            )
            headers.append(header)
            payloads.append(payload)
        return stats, np.stack(headers), np.stack(payloads)

    def receive(self, iq, threshold: float = 0.2):
        """Detect + demod the first frame in a block. Returns
        (offset, stats, header, payload) or (None, None, None, None)."""
        re, im = split_iq(iq)
        r = re + 1j * im
        metric, best, cfo = self.detect(r, threshold)
        best = int(best)
        if float(metric[best]) < threshold:
            return None, None, None, None
        frame = r[best : best + self.gen.frame_len]
        if frame.shape[0] < self.gen.frame_len:
            return None, None, None, None
        stats, hdr, pay = self.demod_aligned(frame[None], cfo=jnp.asarray([cfo]))
        return best, stats[0], hdr[0], pay[0]
