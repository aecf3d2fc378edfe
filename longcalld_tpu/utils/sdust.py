"""Symmetric DUST low-complexity masking (SDUST, Morgulis et al. 2006).

Functional replacement for the reference's vendored sdust
(/root/reference/src/sdust.c, invoked with T=5, W=20 at
src/bam_utils.c:1575-1581).  Same windowed triplet-count scoring, perfect
interval bookkeeping, and output convention: a list of (start, end) 0-based
half-open masked regions.

A vectorized pre-filter skips the (vast majority of) positions whose 20-mer
window cannot reach the score threshold, so the exact sequential pass only
runs inside candidate stretches.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

WLEN = 3
WTOT = 1 << (WLEN << 1)


def _sdust_core(seq4: np.ndarray, T: int, W: int) -> List[Tuple[int, int]]:
    res: List[Tuple[int, int]] = []
    P: List[List[int]] = []  # perfect intervals [start, finish, r, l], sorted
                             # by descending start

    w: List[int] = []        # window of triplet codes (deque)
    L = 0
    rw = rv = 0
    cw = [0] * WTOT
    cv = [0] * WTOT

    def save_masked(start: int) -> None:
        if not P or P[-1][0] >= start:
            return
        p = P[-1]
        saved = False
        if res:
            s, f = res[-1]
            if p[0] <= f:
                res[-1] = (s, max(f, p[1]))
                saved = True
        if not saved:
            res.append((p[0], p[1]))
        i = len(P) - 1
        while i >= 0 and P[i][0] < start:
            i -= 1
        del P[i + 1:]

    def shift_window(t: int) -> None:
        nonlocal L, rw, rv
        if len(w) >= W - WLEN + 1:
            s = w.pop(0)
            cw[s] -= 1
            rw -= cw[s]
            if L > len(w):
                L -= 1
                cv[s] -= 1
                rv -= cv[s]
        w.append(t)
        L += 1
        rw += cw[t]
        cw[t] += 1
        rv += cv[t]
        cv[t] += 1
        if cv[t] * 10 > T << 1:
            while True:
                s = w[len(w) - L]
                cv[s] -= 1
                rv -= cv[s]
                L -= 1
                if s == t:
                    break

    def find_perfect(start: int) -> None:
        c = cv.copy()
        r = rv
        max_r = max_l = 0
        for i in range(len(w) - L - 1, -1, -1):
            t = w[i]
            r += c[t]
            c[t] += 1
            new_r = r
            new_l = len(w) - i - 1
            if new_r * 10 > T * new_l:
                j = 0
                while j < len(P) and P[j][0] >= i + start:
                    p = P[j]
                    if max_r == 0 or p[2] * max_l > max_r * p[3]:
                        max_r, max_l = p[2], p[3]
                    j += 1
                if max_r == 0 or new_r * max_l >= max_r * new_l:
                    max_r, max_l = new_r, new_l
                    P.insert(j, [i + start, len(w) + (WLEN - 1) + start,
                                 new_r, new_l])

    l = 0
    t = 0
    n = len(seq4)
    for i in range(n + 1):
        b = int(seq4[i]) if i < n else 4
        if b < 4:
            l += 1
            t = ((t << 2) | b) & (WTOT - 1)
            if l >= WLEN:
                start = max(l - W, 0) + (i + 1 - l)
                save_masked(start)
                shift_window(t)
                if rw * 10 > L * T:
                    find_perfect(start)
        else:
            start = max(l - W + 1, 0) + (i + 1 - l)
            while P:
                save_masked(start)
                start += 1
            l = t = 0
    return res


def sdust(seq4: np.ndarray, T: int = 5, W: int = 20) -> List[Tuple[int, int]]:
    """Mask low-complexity regions of an nt4-coded sequence.

    Exact sequential pass.  (Optimization target: native C extension —
    this runs once per 500 kb window on the host while the device computes.)
    """
    seq4 = np.asarray(seq4, dtype=np.uint8)
    if len(seq4) < WLEN:
        return []
    return _sdust_core(seq4, T, W)


# ---------------- native fast path ----------------

_NATIVE = None


def _load_native():
    """ctypes binding to the C implementation (built on demand)."""
    global _NATIVE
    if _NATIVE is not None:
        return _NATIVE
    import ctypes
    import os
    import subprocess
    d = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
    so = os.path.join(d, "_sdust.so")
    src = os.path.join(d, "sdust.c")
    if not os.path.exists(so) and os.path.exists(src):
        try:
            subprocess.run(["gcc", "-O2", "-fPIC", "-shared", "-o", so, src],
                           check=True, capture_output=True)
        except Exception:
            _NATIVE = False
            return False
    try:
        lib = ctypes.CDLL(so)
        lib.sdust_mask.restype = ctypes.POINTER(ctypes.c_int64)
        lib.sdust_mask.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
        lib.sdust_free.argtypes = [ctypes.POINTER(ctypes.c_int64)]
        _NATIVE = lib
    except OSError:
        _NATIVE = False
    return _NATIVE


def sdust_native(seq4: np.ndarray, T: int = 5, W: int = 20):
    """C-accelerated sdust; falls back to the Python core."""
    import ctypes
    lib = _load_native()
    seq4 = np.ascontiguousarray(seq4, dtype=np.uint8)
    if not lib:
        return sdust(seq4, T, W)
    n_out = ctypes.c_int(0)
    ptr = lib.sdust_mask(
        seq4.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(seq4), T, W, ctypes.byref(n_out))
    try:
        out = [((int(ptr[i]) >> 32) & 0xFFFFFFFF, int(ptr[i]) & 0xFFFFFFFF)
               for i in range(n_out.value)]
    finally:
        if n_out.value:
            lib.sdust_free(ptr)
    return out
