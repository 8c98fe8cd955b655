"""stderr logging in the reference's uniform convention:
[M::func] info, [W::func] warning, [V::func] verbose
(e.g. /root/reference/yak-count.c:427, vaf-counter.c:621-660)."""

from __future__ import annotations

import sys


def minfo(func: str, msg: str) -> None:
    sys.stderr.write(f"[M::{func}] {msg}\n")


def warn(func: str, msg: str) -> None:
    sys.stderr.write(f"[W::{func}] {msg}\n")


def verbose(func: str, msg: str) -> None:
    sys.stderr.write(f"[V::{func}] {msg}\n")


def is_primary() -> bool:
    """True on the output-emitting process (process 0 of a multi-host
    run; always in single-process runs).  Tools gate stdout and result
    files on this so an SPMD pod launch prints once."""
    try:
        import jax

        return jax.process_index() == 0
    except Exception:  # jax not initialized in host-only tools
        return True
