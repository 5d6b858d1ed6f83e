"""Built-in scenario controllers (ports of the reference's SC_* plug-ins)."""

from cognitive_radio_network_tpu.controllers import template  # noqa: F401
