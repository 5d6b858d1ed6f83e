"""Scalar numpy transliteration of the reference sensing math — the oracle.

This module deliberately mirrors the *loops* of CE_Predictive_Node.cpp
(fft -> |.|/averaging accumulation -> band amplitude sums -> squared powers ->
1-indexed double-precision MLP -> threshold chain) so the JAX implementation
can be golden-tested against an independent restatement of the contract.
"""

import numpy as np

# Reference weight tables in their original [row][col] layout with row/col 0
# as bias (CE_Predictive_Node.cpp:78-120).
WEIGHT_IH = np.zeros((5, 6))
WEIGHT_HO = np.zeros((6, 4))
_wih = {
    (0, 1): -0.188208, (1, 1): -0.106634, (2, 1): 0.005650, (3, 1): -0.057578,
    (4, 1): 0.092680,
    (0, 2): -0.170684, (1, 2): -0.415470, (2, 2): 0.741944, (3, 2): 0.621154,
    (4, 2): 0.809336,
    (0, 3): -0.024726, (1, 3): 0.309261, (2, 3): 0.006133, (3, 3): -0.048268,
    (4, 3): -0.010821,
    (0, 4): 0.001448, (1, 4): 0.159974, (2, 4): -0.620100, (3, 4): -0.249186,
    (4, 4): -0.546496,
    (0, 5): 0.015983, (1, 5): 0.212781, (2, 5): 0.669892, (3, 5): 0.734475,
    (4, 5): 0.609384,
}
_who = {
    (0, 1): -7.033320, (1, 1): 10.857465, (2, 1): -6.848443, (3, 1): 17.053079,
    (4, 1): 0.087664, (5, 1): -6.552455,
    (0, 2): 2.726400, (1, 2): -18.452471, (2, 2): 2.053071, (3, 2): -13.375309,
    (4, 2): -0.269499, (5, 2): 2.655529,
    (0, 3): -2.590206, (1, 3): 15.609466, (2, 3): -2.929559, (3, 3): -15.703407,
    (4, 3): 0.407028, (5, 3): -2.552555,
}
for (i, j), v in _wih.items():
    WEIGHT_IH[i][j] = v
for (j, k), v in _who.items():
    WEIGHT_HO[j][k] = v


def fft_avg_reference(buffers: np.ndarray, averaging: int = 10) -> np.ndarray:
    """buffers: (averaging, N) complex. fft_avg[i] += |X[i]| / averaging."""
    n = buffers.shape[-1]
    fft_avg = np.zeros(n, dtype=np.float32)
    for a in range(averaging):
        xf = np.fft.fft(buffers[a].astype(np.complex64))
        fft_avg += (np.abs(xf) / float(averaging)).astype(np.float32)
    return fft_avg


def band_features_reference(fft_avg: np.ndarray) -> np.ndarray:
    """[NF, CH1, CH2, CH3] = squared band amplitude sums, exact bin loops."""
    m1 = m2 = m3 = nf = np.float32(0.0)
    for i in range(0, 16):
        m1 += abs(fft_avg[i])
    for i in range(496, 511):  # quirk: bin 511 excluded
        m1 += abs(fft_avg[i])
    for i in range(55, 85):
        m2 += abs(fft_avg[i])
    for i in range(189, 222):
        m3 += abs(fft_avg[i])
    for i in range(300, 310):
        nf += abs(fft_avg[i])
    return np.array([nf * nf, m1 * m1, m2 * m2, m3 * m3], dtype=np.float64)


def mlp_reference(features: np.ndarray) -> np.ndarray:
    """1-indexed double-precision forward pass. features = [NF, CH1, CH2, CH3]."""
    fb = np.concatenate([[0.0], features])  # Features_Buffer[0] unused
    sigmoid_ha = np.zeros(6)
    # exp(-s) may overflow to inf for strongly negative activations; the
    # C++ reference's expf does the same and 1/(1+inf) == 0 is the right
    # saturated sigmoid either way — silence the benign warning.
    with np.errstate(over="ignore"):
        for j in range(1, 6):
            s = WEIGHT_IH[0][j]
            for i in range(1, 5):
                s += fb[i] * WEIGHT_IH[i][j]
            sigmoid_ha[j] = 1.0 / (1.0 + np.exp(-s))
        out = np.zeros(4)
        for k in range(1, 4):
            s = WEIGHT_HO[0][k]
            for j in range(1, 6):
                s += sigmoid_ha[j] * WEIGHT_HO[j][k]
            out[k] = 1.0 / (1.0 + np.exp(-s))
    return out[1:]


def decision_reference(outputs: np.ndarray, threshold: float = 0.8) -> int:
    if outputs[0] >= threshold:
        return 1
    if outputs[1] >= threshold:
        return 2
    if outputs[2] >= threshold:
        return 3
    return 0


def next_freq_reference(decision: int, current: float) -> float:
    ch1, ch2 = 833e6, 835e6
    return {0: current, 1: ch2, 2: ch1, 3: ch2}[decision]


def sense_classify_reference(iq_cycles: np.ndarray, threshold: float = 0.8):
    """iq_cycles: (C, A, N) complex. Returns per-cycle features/outputs/decisions."""
    feats, outs, decs = [], [], []
    for c in range(iq_cycles.shape[0]):
        fa = fft_avg_reference(iq_cycles[c], iq_cycles.shape[1])
        f = band_features_reference(fa)
        o = mlp_reference(f)
        feats.append(f)
        outs.append(o)
        decs.append(decision_reference(o, threshold))
    return np.array(feats), np.array(outs), np.array(decs)
