"""Output handlers: console/file/multi/storage fanout.

Output trait mirror of /root/reference/src/output/mod.rs:22-37 — ``key``,
``hit``, ``flush`` — plus a ``key_fast`` fast path that formats the compact
line straight from device results without re-deriving on host.
"""

from .console import ConsoleOutput  # noqa: F401
from .multi import MultiOutput  # noqa: F401
