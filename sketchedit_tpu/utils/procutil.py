"""Child-process hygiene for harnesses that spawn TPU-holding servers.

A test fixture or benchmark script that is SIGKILLed (shell timeout, OOM
killer, a dropped session) never runs its cleanup, and its child
serve_api/train process lingers holding the device — an orphaned idle
server skews every later benchmark and can block ports. Pass
``preexec_fn=die_with_parent`` to ``subprocess.Popen`` so the kernel
SIGTERMs the child the moment its parent dies (Linux PR_SET_PDEATHSIG).
"""

from __future__ import annotations

import signal


def die_with_parent():
    """Popen preexec_fn: deliver SIGTERM to this child when the parent
    exits for any reason (including SIGKILL of the parent)."""
    try:
        import ctypes
        ctypes.CDLL("libc.so.6").prctl(1, signal.SIGTERM)  # PR_SET_PDEATHSIG
    except Exception:       # non-Linux / no libc: best-effort only
        pass
