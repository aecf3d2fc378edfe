"""Persistent subprocess worker pool for window-range parallelism.

The kt_for analog that actually scales the interpreted host stages: CPython's
GIL serializes them across threads, so run_call hands many-window streams to
worker PROCESSES (core/procworker.py).  Purpose-built instead of
multiprocessing because (a) fork from a process holding a live TPU client is
unsafe, and (b) spawn/forkserver re-import ``__main__`` in the worker, which
breaks under embedded/REPL parents.  Workers here are plain ``python -m``
subprocesses talking pickles over pipes — no fork, no __main__ re-execution,
and JAX_PLATFORMS=cpu in the worker env as a hard device-isolation guarantee.

Workers persist across runs (module-level pool), so repeated run_call
invocations in one process pay the worker-import cost once.
"""

from __future__ import annotations

import atexit
import itertools
import os
import pickle
import queue
import subprocess
import sys
import threading
from typing import Iterator, List, Sequence, Tuple

_CTX_IDS = itertools.count(1)


class _Worker:
    def __init__(self) -> None:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"   # workers are host-only by contract
        self.proc = subprocess.Popen(
            [sys.executable, "-m", "longcalld_tpu.core.procworker"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE, env=env)
        self.ctx_id = -1
        self._send(("warm",))          # import the package in parallel

    def _send(self, msg) -> None:
        pickle.dump(msg, self.proc.stdin, protocol=pickle.HIGHEST_PROTOCOL)
        self.proc.stdin.flush()

    def run(self, ctx_id: int, ctx_msg, first_k: int, count: int):
        if self.ctx_id != ctx_id:
            self._send(ctx_msg)
            self.ctx_id = ctx_id
        self._send(("run", ctx_id, first_k, count))
        res = pickle.load(self.proc.stdout)
        if res[0] == "err":
            raise RuntimeError(f"range worker failed:\n{res[1]}")
        return res[1]

    def alive(self) -> bool:
        return self.proc.poll() is None

    def stop(self) -> None:
        try:
            if self.alive():
                self._send(("exit",))
                self.proc.wait(timeout=5)
        except Exception:
            self.proc.kill()
        for f in (self.proc.stdin, self.proc.stdout):
            try:
                f.close()
            except Exception:
                pass


_WORKERS: List[_Worker] = []
_LOCK = threading.Lock()


def _get_workers(n: int) -> List[_Worker]:
    with _LOCK:
        _WORKERS[:] = [w for w in _WORKERS if w.alive()]
        while len(_WORKERS) < n:
            _WORKERS.append(_Worker())
        return _WORKERS[:n]


def shutdown() -> None:
    with _LOCK:
        for w in _WORKERS:
            w.stop()
        _WORKERS.clear()


atexit.register(shutdown)


def imap_ranges(opt, wins, ranges: Sequence[Tuple[int, int]],
                n_workers: int) -> Iterator[list]:
    """Run each (first_k, count) window range on a pool worker; yield the
    per-range result lists strictly in submission order while later ranges
    keep executing (the ordered hand-off of kt_pipeline,
    /root/reference/src/kthread.c:195-226)."""
    workers = _get_workers(n_workers)
    ctx_id = next(_CTX_IDS)
    ctx_msg = ("ctx", ctx_id, opt, wins)
    tasks: "queue.Queue" = queue.Queue()
    for item in enumerate(ranges):
        tasks.put(item)
    results: dict = {}
    cond = threading.Condition()

    def drive(w: _Worker) -> None:
        while True:
            try:
                idx, (first_k, count) = tasks.get_nowait()
            except queue.Empty:
                return
            try:
                out = ("ok", w.run(ctx_id, ctx_msg, first_k, count))
            except BaseException as e:     # noqa: BLE001 — relayed to consumer
                out = ("raise", e)
            with cond:
                results[idx] = out
                cond.notify_all()
            if out[0] == "raise":
                return

    threads = [threading.Thread(target=drive, args=(w,), daemon=True)
               for w in workers]
    for t in threads:
        t.start()
    try:
        for i in range(len(ranges)):
            with cond:
                while i not in results:
                    if not any(t.is_alive() for t in threads):
                        raise RuntimeError(
                            f"all range workers exited before producing "
                            f"range {i}/{len(ranges)}")
                    cond.wait(timeout=0.5)
                status, payload = results.pop(i)
            if status == "raise":
                raise payload
            yield payload
    finally:
        # on early exit, stop handing out new tasks; in-flight ranges finish
        # on their worker and the pool stays reusable
        while True:
            try:
                tasks.get_nowait()
            except queue.Empty:
                break
