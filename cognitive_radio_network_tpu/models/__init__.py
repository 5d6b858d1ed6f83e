"""Flagship models: the fused sense->classify pipeline and classifier training."""

from cognitive_radio_network_tpu.models.sense import (
    SenseConfig,
    sense_classify,
    sense_classify_trace,
    make_sense_fn,
)

__all__ = ["SenseConfig", "sense_classify", "sense_classify_trace", "make_sense_fn"]
