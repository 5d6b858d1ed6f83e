"""Synthetic RF environment — replaces the reference's USRP hardware boundary.

The reference needs real radios and hosts to exist (SURVEY §4: "no mock
backends"); this package is the framework's fixture generator and simulation
backend: primary-user hopping processes, interferer waveforms, channel
impairments, and full-scene IQ composition at the sensing front-end.
"""

from cognitive_radio_network_tpu.env.pu import (
    MARKOV_MATRIX_DOCUMENTED,
    MARKOV_MATRIX_AS_IMPLEMENTED,
    PU_CHANNELS_HZ,
    markov_pu_trace,
    random_pu_trace,
)
from cognitive_radio_network_tpu.env.interference import (
    InterfererConfig,
    synthesize_interference,
)
from cognitive_radio_network_tpu.env.channel import awgn, mix_to_offset
from cognitive_radio_network_tpu.env.scene import SceneConfig, synthesize_scene

__all__ = [
    "MARKOV_MATRIX_DOCUMENTED",
    "MARKOV_MATRIX_AS_IMPLEMENTED",
    "PU_CHANNELS_HZ",
    "markov_pu_trace",
    "random_pu_trace",
    "InterfererConfig",
    "synthesize_interference",
    "awgn",
    "mix_to_offset",
    "SceneConfig",
    "synthesize_scene",
]
