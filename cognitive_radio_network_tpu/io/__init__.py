"""IQ recording I/O and checkpoint/resume.

The reference has neither (USRPs are live-only; "checkpointing is literally
pasting weights into source", SURVEY.md §5).  This package supplies both:
recorded-IQ files as the replacement for the USRP hardware boundary, with
resumable stream cursors for long captures, and parameter/state snapshots
for the classifier (orbax when available, npz otherwise).
"""

from cognitive_radio_network_tpu.io.iq import IQReader, IQWriter, StreamCursor
from cognitive_radio_network_tpu.io.checkpoint import (
    save_mlp,
    load_mlp,
    save_state,
    load_state,
)

__all__ = [
    "IQReader",
    "IQWriter",
    "StreamCursor",
    "save_mlp",
    "load_mlp",
    "save_state",
    "load_state",
]
