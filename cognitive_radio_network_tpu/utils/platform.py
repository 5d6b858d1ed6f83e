"""Effective-compute-platform detection.

`jax.default_backend()` reports the process's highest-priority backend even
inside a `jax.default_device(...)` context — so code selecting a Pallas
kernel vs an XLA fallback by backend alone picks the TPU kernel while the
computation actually runs on a CPU device (the scenario runtime's
phy_placement="host" context), and the kernel launch fails with "Only
interpret mode is supported on CPU backend" (round-4 finding: this silently
killed every in-process scenario node under the ambient TPU env since
round 1; the failure-isolation policy then timed an empty scenario).
"""

from __future__ import annotations

import jax

__all__ = ["effective_platform"]


def effective_platform() -> str:
    """Platform of the device computations will actually land on: the
    `jax.default_device` override if one is active, else the default
    backend."""
    dd = jax.config.jax_default_device
    if dd is not None:
        try:
            return dd.platform
        except AttributeError:
            pass
    return jax.default_backend()
