"""Native (C++) host-side components: glibc-rand codec + CPU oracle ops.

See csgn_host.cpp for scope; Python surface in `binding`.
"""

from csgn_tpu.native import binding

__all__ = ["binding"]
