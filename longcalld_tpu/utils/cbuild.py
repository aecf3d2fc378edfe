"""On-demand C builds for the native fast paths.

Compiles into a per-thread temp file and os.replace's it into place:
concurrent loader threads (the stage-0 window pool warms several native
paths at once on a fresh checkout) must never ctypes.CDLL a partially
written library.
"""

from __future__ import annotations

import os
import subprocess
import threading


def build_so(src: str, so: str, flags=("-O3",)) -> bool:
    """Ensure ``so`` is up to date with ``src``.  Returns False when no
    usable library could be produced (callers fall back to Python)."""
    try:
        if (os.path.exists(so)
                and os.path.getmtime(so) >= os.path.getmtime(src)):
            return True
    except OSError:
        return False
    tmp = f"{so}.tmp{os.getpid()}.{threading.get_ident()}"
    try:
        subprocess.run(["gcc", *flags, "-fPIC", "-shared", "-o", tmp, src],
                       check=True, capture_output=True)
        os.replace(tmp, so)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return os.path.exists(so)
