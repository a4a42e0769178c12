"""Error taxonomy for tombo_tpu.

Mirrors the reference's per-read fault isolation design
(reference: tombo/tombo_helper.py:67 ``TomboError``): every recoverable
per-read failure raises :class:`TomboTpuError` with a short, stable message
that doubles as the failure-mode key in progress reporting, so a whole batch
never dies because one read is malformed.
"""


class TomboTpuError(Exception):
    """Recoverable, per-read error (read is skipped and reported)."""


class TomboTpuConfigError(Exception):
    """Invalid user configuration (fatal)."""
