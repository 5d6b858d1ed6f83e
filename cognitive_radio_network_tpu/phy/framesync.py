"""OFDM frame synchronizer — the ``ofdmflexframesync`` capability, batched.

liquid's synchronizer is a per-sample adaptive state machine (AGC, squelch,
timing PLL) driven inside ``ECR_rx_worker``'s hot loop
(src/extensible_cognitive_radio.cpp:1299-1366).  The TPU-native design is
block-oriented and batched instead:

* **detect**: Schmidl&Cox autocorrelation metric over a whole IQ block at
  once (vectorized correlation) finds S0 preambles, refines timing with a
  CFO-corrected matched filter, and estimates CFO from the autocorrelation
  phase;
* **demod**: CP strip, FFT across all symbols at once, one-shot channel
  estimate from S1, per-symbol pilot common-phase tracking, equalize,
  min-distance demod — one fused graph per (config, num_symbols);
* **adaptive receive**: like liquid, the payload's (length, mod, fec, crc)
  ride in the coded PHY header, so :class:`StreamReceiver` first demods the
  fixed-size header region, then dispatches to a cached demod graph for that
  payload configuration;
* **decode** (host): FEC + CRC bit-plumbing, emitting a
  :class:`FrameSyncStats` record with the fields of the vendored
  framesyncstats contract (framesyncstats.c:39-55).

Streaming state across block boundaries (a frame straddling two blocks) is
carried by the receiver's residual buffer — overlap-save at the frame scale.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from cognitive_radio_network_tpu.phy import crc as crc_mod
from cognitive_radio_network_tpu.phy import fec as fec_mod
from cognitive_radio_network_tpu.phy import modem
from cognitive_radio_network_tpu.phy.bits import pack_bits
from cognitive_radio_network_tpu.phy.framegen import (
    HEADER_BYTES,
    TOTAL_HEADER_BYTES,
    _HEADER_CRC,
    _HEADER_FEC,
    _HEADER_MOD,
    OFDMFrameConfig,
    OFDMFrameGen,
    unpack_phy_header,
)
from cognitive_radio_network_tpu.signal.iq import split_iq

__all__ = ["FrameSyncStats", "OFDMFrameSync", "StreamReceiver"]


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


def _decode_header_bits(hdr_bits: np.ndarray):
    """coded header bits -> (user_header(8), phy_header(6), crc_ok)."""
    enc = pack_bits(hdr_bits)
    dec = fec_mod.decode(
        _HEADER_FEC, enc, TOTAL_HEADER_BYTES + crc_mod.crc_sizes(_HEADER_CRC)
    )
    ok = crc_mod.crc_validate(_HEADER_CRC, dec)
    return dec[:HEADER_BYTES], dec[HEADER_BYTES:TOTAL_HEADER_BYTES], bool(ok)


class OFDMFrameSync:
    """Fixed-configuration synchronizer (both sides share the frame config)."""

    def __init__(self, cfg: OFDMFrameConfig, payload_len: int):
        self.cfg = cfg
        self.payload_len = payload_len
        self.gen = OFDMFrameGen(cfg, payload_len)  # shares sizing/preambles
        self._demod = jax.jit(functools.partial(_demod_graph, self.gen))

    # -- detection ------------------------------------------------------

    def detect(self, iq, threshold: float = 0.5):
        """Returns (peak_metric, best_offset, cfo)."""
        return _detect(self.gen, iq)

    # -- aligned demodulation ------------------------------------------

    def demod_aligned(self, iq, cfo=None):
        """Frame-aligned IQ (B, frame_len) [complex or planes] -> decoded.

        Returns (stats list[FrameSyncStats], headers (B,8), payloads (B,P)).
        """
        re, im = split_iq(iq)
        if re.ndim == 1:
            re, im = re[None], im[None]
        b = re.shape[0]
        cfo_arr = (
            jnp.zeros((b,), jnp.float32)
            if cfo is None
            else jnp.asarray(cfo, jnp.float32).reshape(b)
        )
        out = self._demod(re, im, cfo_arr)
        hdr_bits = np.asarray(out["header_bits"])
        pay_bits = np.asarray(out["payload_bits"])
        evm = np.asarray(out["evm_db"])
        rssi = np.asarray(out["rssi_db"])
        cfo_np = np.asarray(cfo_arr)

        g = self.gen
        stats, headers, payloads = [], [], []
        for i in range(b):
            header, _phy, hdr_ok = _decode_header_bits(hdr_bits[i])
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
                    header_valid=hdr_ok,
                    payload_valid=bool(pay_ok),
                )
            )
            headers.append(header)
            payloads.append(pay_dec[: self.payload_len])
        return stats, np.stack(headers), np.stack(payloads)

    def receive(self, iq, threshold: float = 0.2):
        """Detect + demod the first frame in a block (fixed config).

        Planes/planar in, planes through: no complex64 ever crosses a jit
        or transfer boundary (portability, see signal/iq.py)."""
        re_np, im_np = _to_np_planes(iq)
        peak, best, cfo = _detect(self.gen, (re_np, im_np))
        best = int(best)
        if float(peak) < threshold:
            return None, None, None, None
        fl = self.gen.frame_len
        if best + fl > re_np.shape[0]:
            return None, None, None, None
        frame = (re_np[None, best : best + fl], im_np[None, best : best + fl])
        stats, hdr, pay = self.demod_aligned(frame, cfo=jnp.asarray([cfo]))
        return best, stats[0], hdr[0], pay[0]


# ----------------------------------------------------------------------
# shared device graphs
# ----------------------------------------------------------------------


def _detect_core(rr: jax.Array, ri: jax.Array, n_valid: jax.Array,
                 tmpl_r: np.ndarray, tmpl_i: np.ndarray, m: int):
    """S&C coarse detect + matched-filter fine timing (jittable core).

    rr/ri: float32 planes (N,) zero-padded; n_valid: true length (dynamic
    scalar, so one compilation serves every block of the same padded bucket
    size).  Complex is formed INSIDE the graph; the template arrives as two
    numpy real constants (complex device constants cannot be embedded on
    backends that cannot transfer complex buffers)."""
    r = rr + 1j * ri
    tmpl = jnp.asarray(tmpl_r) + 1j * jnp.asarray(tmpl_i)
    half = m // 2
    lag = r[half:] * jnp.conj(r[:-half])
    win = 2 * m - half
    c = jnp.cumsum(jnp.concatenate([jnp.zeros(1, lag.dtype), lag]))
    p = c[win:] - c[:-win]
    # normalize by the energy of BOTH halves of the correlation window —
    # one-sided normalization explodes when the early half is pure noise
    pw = jnp.abs(r) ** 2
    cw = jnp.cumsum(jnp.concatenate([jnp.zeros(1), pw]))
    e1 = cw[win:-half] - cw[: -(win + half)]
    e2 = cw[win + half :] - cw[half:-win]
    # floor the energies at a fraction of the block's average window energy:
    # without it the ratio spikes at silence->signal boundaries (0/0)
    floor = 0.05 * win * jnp.sum(pw) / jnp.maximum(n_valid, 1) + 1e-20
    metric = jnp.abs(p) ** 2 / (jnp.maximum(e1, floor) * jnp.maximum(e2, floor))
    # mask positions whose correlation window reaches past the valid samples
    idx = jnp.arange(metric.shape[0])
    metric = jnp.where(idx <= n_valid - (win + half), metric, -1.0)
    coarse = jnp.argmax(metric)
    cfo = jnp.angle(p[coarse]) / half

    # The S&C metric plateaus (|P| and R shrink together during partial
    # overlap), so refine with a CFO-corrected matched filter against the
    # known 2x-S0 template around the coarse peak.
    tlen = tmpl.shape[0]
    span = 2 * m
    k = jnp.arange(tlen)
    rot = jnp.exp(-1j * cfo * k.astype(jnp.float32))
    starts = jnp.clip(
        coarse - span + jnp.arange(2 * span + 1), 0, jnp.maximum(n_valid - tlen, 0)
    )
    wins = r[starts[:, None] + k[None, :]]
    xc = jnp.abs(jnp.sum(wins * rot[None] * jnp.conj(tmpl)[None], axis=-1)) ** 2
    we = jnp.sum(jnp.abs(wins) ** 2, axis=-1)
    fine = jnp.argmax(xc / jnp.maximum(we, 1e-12))
    best = starts[fine]
    cfo = jnp.angle(p[jnp.clip(best, 0, p.shape[0] - 1)]) / half
    peak = metric[jnp.clip(best, 0, metric.shape[0] - 1)]
    return peak, best, cfo


@functools.lru_cache(maxsize=64)
def _detector_for(m: int, tmpl_key: bytes):
    tmpl = np.frombuffer(tmpl_key, np.complex64)
    return jax.jit(
        functools.partial(
            _detect_core,
            tmpl_r=tmpl.real.copy(),
            tmpl_i=tmpl.imag.copy(),
            m=m,
        )
    )


def _to_np_planes(iq) -> tuple[np.ndarray, np.ndarray]:
    """Any IQ form -> host numpy (re, im) float32, fetching only real
    buffers (complex device->host transfers are a portability hazard)."""
    if isinstance(iq, (tuple, list)):
        re, im = iq
        return (
            np.asarray(re, np.float32),
            np.asarray(im, np.float32),
        )
    if isinstance(iq, np.ndarray) and np.iscomplexobj(iq):
        return iq.real.astype(np.float32), iq.imag.astype(np.float32)
    re, im = split_iq(iq)
    return np.asarray(re, np.float32), np.asarray(im, np.float32)


def _detect(gen: OFDMFrameGen, iq):
    """Shape-bucketed detection wrapper: pads to the next power of two so the
    jitted core compiles once per bucket, not once per block length.
    Returns (metric_peak_at_best, best, cfo)."""
    m = gen.cfg.num_subcarriers
    tmpl_np = np.concatenate([gen.S0_time, gen.S0_time]).astype(np.complex64)
    det = _detector_for(m, tmpl_np.tobytes())
    re_np, im_np = _to_np_planes(iq)
    n = re_np.shape[0]
    bucket = 1 << max(int(np.ceil(np.log2(max(n, 4 * m)))), 0)
    rr = np.zeros(bucket, np.float32)
    ri = np.zeros(bucket, np.float32)
    rr[:n] = re_np
    ri[:n] = im_np
    return det(jnp.asarray(rr), jnp.asarray(ri), jnp.int32(n))


def _equalized_data_points(gen: OFDMFrameGen, r: jax.Array, cfo: jax.Array,
                           num_symbols: int):
    """r: (B, 2m + m+cp + num_symbols*(m+cp)) aligned at S0. Returns
    equalized data-subcarrier points (B, num_symbols, nd) and rssi (B,)."""
    from cognitive_radio_network_tpu.phy.framegen import pilot_sequence

    cfg = gen.cfg
    m, cp = cfg.num_subcarriers, cfg.cp_len
    b = r.shape[0]
    n = jnp.arange(r.shape[1], dtype=jnp.float32)
    r = r * jnp.exp(-1j * cfo[:, None] * n)
    rssi = 10.0 * jnp.log10(jnp.mean(jnp.abs(r) ** 2, axis=-1) + 1e-20)

    s1_start = 2 * m + cp
    s1_t = r[:, s1_start : s1_start + m]
    body = r[:, s1_start + m :]
    sym = body.reshape(b, num_symbols, m + cp)[:, :, cp:]

    y1 = jnp.fft.fft(s1_t, axis=-1) / np.sqrt(m)
    x1 = jnp.asarray(gen.S1_freq)
    act = jnp.asarray(gen.active_idx)
    h = jnp.ones((b, m), jnp.complex64)
    h = h.at[:, act].set(y1[:, act] * jnp.conj(x1[act]) / (jnp.abs(x1[act]) ** 2))

    y = jnp.fft.fft(sym, axis=-1) / np.sqrt(m)
    yeq = y / (h[:, None, :] + 1e-12)

    if len(gen.pilot_idx):
        pidx = jnp.asarray(gen.pilot_idx)
        pilots = jnp.asarray(pilot_sequence(num_symbols, len(gen.pilot_idx)))
        dot = jnp.sum(yeq[:, :, pidx] * jnp.conj(pilots[None]), axis=-1)
        yeq = yeq * jnp.exp(-1j * jnp.angle(dot))[:, :, None]

    didx = jnp.asarray(gen.data_idx)
    return yeq[:, :, didx], rssi


def _demod_graph(gen: OFDMFrameGen, re, im, cfo):
    """Full fixed-config frame demod. re/im: (B, frame_len)."""
    cfg = gen.cfg
    r = (re + 1j * im).astype(jnp.complex64)
    b = r.shape[0]
    data, rssi = _equalized_data_points(gen, r, cfo, gen.num_symbols)
    nd = len(gen.data_idx)
    hdr_pts = data[:, : gen.n_header_syms].reshape(b, -1)
    pay_pts = data[:, gen.n_header_syms :].reshape(b, -1)

    hdr_syms, hdr_evm = modem.demodulate(_HEADER_MOD, hdr_pts)
    pay_syms, pay_evm = modem.demodulate(cfg.mod_scheme, pay_pts)

    hdr_bits = hdr_syms[:, : gen.n_header_bits].astype(jnp.uint8)
    shifts = jnp.arange(gen.bps - 1, -1, -1, dtype=jnp.int32)
    pay_bits = ((pay_syms[:, :, None] >> shifts) & 1).reshape(b, -1).astype(jnp.uint8)[
        :, : gen.payload_enc_bytes * 8
    ]

    n_pay_syms_used = gen.payload_enc_bytes * 8 // gen.bps
    n_used = gen.n_header_bits + n_pay_syms_used
    evm_lin = (
        jnp.sum(hdr_evm[:, : gen.n_header_bits], axis=-1)
        + jnp.sum(pay_evm[:, :n_pay_syms_used], axis=-1)
    ) / n_used
    evm_db = 10.0 * jnp.log10(evm_lin + 1e-20)
    return {
        "header_bits": hdr_bits,
        "payload_bits": pay_bits,
        "evm_db": evm_db,
        "rssi_db": rssi,
    }


def _header_demod_graph(gen: OFDMFrameGen, re, im, cfo):
    """Header-only demod over the fixed-size frame prefix."""
    r = (re + 1j * im).astype(jnp.complex64)
    b = r.shape[0]
    data, rssi = _equalized_data_points(gen, r, cfo, gen.n_header_syms)
    hdr_pts = data.reshape(b, -1)
    hdr_syms, _ = modem.demodulate(_HEADER_MOD, hdr_pts)
    return hdr_syms[:, : gen.n_header_bits].astype(jnp.uint8), rssi


# ----------------------------------------------------------------------
# adaptive streaming receiver
# ----------------------------------------------------------------------


class StreamReceiver:
    """liquid-style adaptive receiver: only the OFDM geometry (subcarriers,
    CP, taper, allocation) is fixed; payload length/mod/FEC/CRC come from
    each frame's PHY header.  Feed arbitrary IQ blocks; frames straddling
    block boundaries are handled by a residual buffer."""

    def __init__(self, cfg: OFDMFrameConfig, max_frames_per_block: int = 16):
        self.cfg = cfg
        self.layout = OFDMFrameGen(cfg, payload_len=1)
        m, cp = cfg.num_subcarriers, cfg.cp_len
        self.prefix_len = 2 * m + (m + cp) + self.layout.n_header_syms * (m + cp)
        self._hdr_demod = jax.jit(functools.partial(_header_demod_graph, self.layout))
        self._syncs: dict[tuple, OFDMFrameSync] = {}
        self.max_frames_per_block = max_frames_per_block
        self._residual = np.zeros(0, np.complex64)
        self._residual_offset = 0  # absolute sample index of residual[0]

    def _sync_for(self, payload_len, mod, f0, f1, check) -> OFDMFrameSync:
        key = (payload_len, mod, f0, f1, check)
        if key not in self._syncs:
            cfg = dataclasses.replace(
                self.cfg, mod_scheme=mod, fec0=f0, fec1=f1, crc_scheme=check
            )
            self._syncs[key] = OFDMFrameSync(cfg, payload_len)
        return self._syncs[key]

    def process(self, iq, threshold: float = 0.2):
        """Append a block and extract every decodable frame.

        Returns a list of dicts: {offset, stats, header, payload} with
        ``offset`` the absolute sample index of the frame start.
        """
        re_np, im_np = _to_np_planes(iq)
        block = re_np + 1j * im_np
        buf = np.concatenate([self._residual, block.astype(np.complex64)])
        base = self._residual_offset
        frames = []
        cursor = 0
        # position to keep from for the next block: by default just a
        # preamble-sized tail; an incomplete frame pulls it back to its start
        keep_from = max(len(buf) - self.prefix_len, 0)
        for _ in range(self.max_frames_per_block):
            segment = buf[cursor:]
            if len(segment) < self.prefix_len + 4 * self.cfg.num_subcarriers:
                break
            peak, best, cfo = _detect(self.layout, segment)
            best = int(best)
            if float(peak) < threshold:
                break
            if best + self.prefix_len > len(segment):
                keep_from = min(keep_from, cursor + best)
                break  # header region incomplete; wait for more samples
            prefix = segment[best : best + self.prefix_len]
            hdr_bits, _ = self._hdr_demod(
                jnp.asarray(np.real(prefix))[None],
                jnp.asarray(np.imag(prefix))[None],
                jnp.asarray([cfo], jnp.float32),
            )
            user, phy, ok = _decode_header_bits(np.asarray(hdr_bits)[0])
            if not ok:
                cursor += best + self.cfg.num_subcarriers  # skip past false peak
                continue
            parsed = unpack_phy_header(phy)
            if parsed is None:
                cursor += best + self.cfg.num_subcarriers
                continue
            payload_len, mod, f0, f1, check = parsed
            sync = self._sync_for(payload_len, mod, f0, f1, check)
            flen = sync.gen.frame_len
            if best + flen > len(segment):
                keep_from = min(keep_from, cursor + best)
                break  # frame incomplete; resume next block
            frame_np = segment[best : best + flen]
            stats, hdrs, pays = sync.demod_aligned(
                (
                    frame_np.real.astype(np.float32)[None],
                    frame_np.imag.astype(np.float32)[None],
                ),
                cfo=jnp.asarray([float(cfo)]),
            )
            frames.append(
                {
                    "offset": base + cursor + best,
                    "stats": stats[0],
                    "header": hdrs[0],
                    "payload": pays[0],
                }
            )
            cursor += best + flen
        keep_from = max(keep_from, cursor)
        # never let the residual grow beyond a bound (malformed stream guard)
        max_residual = 4 * (self.prefix_len + 64 * self.cfg.symbol_len)
        keep_from = max(keep_from, len(buf) - max_residual)
        self._residual = buf[keep_from:]
        self._residual_offset = base + keep_from
        return frames
