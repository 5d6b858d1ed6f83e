"""Mesh construction helpers."""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["MeshSpec", "make_mesh"]


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Named mesh axes for the framework's parallelism styles.

    time     time-block data parallelism over the IQ stream (overlap-save
             halo between neighbors — the sequence/context-parallel analog)
    channel  channel parallelism across polyphase channels (the TP analog)
    data     batch parallelism for classifier training
    """

    time: int = 1
    channel: int = 1
    data: int = 1

    @property
    def total(self) -> int:
        return self.time * self.channel * self.data


def make_mesh(spec: MeshSpec, devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    if spec.total > len(devices):
        raise ValueError(f"mesh {spec} needs {spec.total} devices, have {len(devices)}")
    axes, sizes = [], []
    for name in ("time", "channel", "data"):
        n = getattr(spec, name)
        if n > 1:
            axes.append(name)
            sizes.append(n)
    if not axes:
        axes, sizes = ["time"], [1]
    dev = np.asarray(devices[: int(np.prod(sizes))]).reshape(sizes)
    return Mesh(dev, tuple(axes))
