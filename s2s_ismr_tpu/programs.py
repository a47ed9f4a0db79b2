"""Process-level compiled-program machinery shared across subsystems.

The axon remote-compile TPU backend pays 20-500 s per XLA compile and
cannot use the persistent compilation cache (deserialization aborts —
compile_cache.py), so this process keeps its own memo of LIVE compiled
executables, keyed on everything that determines the program: statics,
input avals, and mesh topology. The tuning sweep (train/sweep.py) was the
first client; the ELR branch's fit/score programs (ops/elr.py,
pipelines/tune.py) route through the same memo so a `run suite` session
can compile them ahead in a background thread exactly like the NN bucket
programs (VERDICT r4 #2: the ELR stage was the suite's critical-path
floor — 2,612 s of the round-4 weeks session — because only U-Net buckets
were covered by the compile-ahead machinery).

Also here: the foreground-compile priority gate (the remote compile
server serializes requests, so background prefetches must yield to
critical-path compiles) and the transient-failure compile retry.
"""

from __future__ import annotations

import threading
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


class _ProgramMemo:
    """Process-level memo of compiled executables.

    Keys capture everything that determines the compiled program: bucket
    statics, train settings, input avals, and mesh topology — the data
    arrays (x / labels / masks / lrs / PRNG keys) are program INPUTS, so
    any same-shape computation reuses the executable. This is what makes
    MME configs cheap (one sweep per model over identical shapes,
    training.py:322-350 — only the first pays the 20-500 s remote
    compile) and amortizes multi-config sessions. Unlike the persistent
    XLA compilation cache (which the axon remote-compile backend cannot
    deserialize, see compile_cache.py), this holds live executables and
    works on every backend. Bounded FIFO; GIL-thread-safe."""

    def __init__(self, max_entries: int = 512):
        # sized for the default 8-config suite: each _BLOCKS_GRID sweep
        # inserts ~36 entries (18 train + 18 pred); 64 would evict the
        # shared com-cluster programs before MME/2MME reuse them
        self._d: Dict[tuple, Any] = {}
        self._inflight: Dict[tuple, Any] = {}   # key -> Future
        self._lock = threading.Lock()
        self.max_entries = max_entries

    def get(self, key):
        if key is None:
            return None
        with self._lock:
            return self._d.get(key)

    def put(self, key, value):
        if key is None:
            return
        with self._lock:
            if key not in self._d and len(self._d) >= self.max_entries:
                self._d.pop(next(iter(self._d)))
            self._d[key] = value

    def begin(self, key):
        """Claim `key` for compilation, deduplicating concurrent compiles
        (the suite's background prefetch can race the foreground sweep on
        shared program shapes — each 20-500 s remote compile must happen
        once). Returns (exe, None) on a memo hit, (None, future) if
        another thread is compiling it (wait on the future), or
        (None, None) when this caller owns the compile and must call
        finish(key, ...)."""
        if key is None:
            return None, None
        from concurrent.futures import Future
        with self._lock:
            v = self._d.get(key)
            if v is not None:
                return v, None
            f = self._inflight.get(key)
            if f is not None:
                return None, f
            self._inflight[key] = Future()
            return None, None

    def finish(self, key, value=None, error=None):
        """Resolve a begin() claim: publish the executable (or propagate
        the compile error to any waiters) and release the in-flight slot."""
        if key is None:
            return
        if error is None:
            self.put(key, value)
        with self._lock:
            f = self._inflight.pop(key, None)
        if f is not None:
            if error is None:
                f.set_result(value)
            else:
                f.set_exception(error)

    def clear(self):
        with self._lock:
            self._d.clear()
            self._inflight.clear()


_program_memo = _ProgramMemo()

# Foreground-compile gate: the remote compile server serializes requests,
# so a background prefetch (run_unet_sweep(compile_only=True) or the ELR
# program prefetch from the suite runner's thread) must yield to critical-
# path compiles — both a real sweep's compile phase AND the pipeline's
# ELR-branch jits (config 0's ELR stage measured 374 s vs ~40 s when its
# own prefetch crowded the compile server). Set = no foreground compile in
# flight. Depth-counted so nested holders (pipeline stage + sweep phase)
# compose. Best-effort (a race only costs one interleaved compile).
_fg_compile_idle = threading.Event()
_fg_compile_idle.set()
_fg_depth = 0
_fg_depth_lock = threading.Lock()


def _fg_enter():
    global _fg_depth
    with _fg_depth_lock:
        _fg_depth += 1
        _fg_compile_idle.clear()


def _fg_exit():
    global _fg_depth
    with _fg_depth_lock:
        _fg_depth = max(0, _fg_depth - 1)
        if _fg_depth == 0:
            _fg_compile_idle.set()


class foreground_compile_priority:
    """Context manager: background prefetch compiles defer while held
    (the pipeline wraps its ELR stage in this; run_unet_sweep holds it
    through its own foreground compile phase)."""

    def __enter__(self):
        _fg_enter()
        return self

    def __exit__(self, *exc):
        _fg_exit()
        return False


def _avals_key(tree) -> tuple:
    return tuple((tuple(np.shape(l)), str(getattr(l, "dtype", type(l))))
                 for l in jax.tree_util.tree_leaves(tree))


def _topology_key(mesh):
    if mesh is None:
        return None
    return (tuple(mesh.axis_names), tuple(mesh.devices.shape),
            tuple(d.id for d in mesh.devices.flat))


def _compile_with_retry(lowered, attempts: int = 3):
    """Compile with backoff on transient backend failures. The tunneled
    remote-compile service occasionally drops a response mid-read
    ('response body closed before all bytes were read'); that killed a
    1-hour suite run once. Non-transient errors re-raise immediately."""
    import time as _t
    for a in range(attempts):
        try:
            return lowered.compile()
        except Exception as e:          # jax.errors.JaxRuntimeError et al.
            transient = any(s in str(e) for s in
                            ("remote_compile", "INTERNAL", "UNAVAILABLE",
                             "DEADLINE_EXCEEDED"))
            if not transient or a == attempts - 1:
                raise
            _t.sleep(2.0 * (a + 1))
    raise AssertionError("unreachable")


def _canon(a):
    """Canonicalize one argument for aval keying: ShapeDtypeStructs pass
    through (compile-only callers), everything else becomes the jnp array
    the executable will actually see (np.float64 -> f32 under the default
    x64-off config, python scalars -> weak-typed arrays, ...)."""
    if isinstance(a, jax.ShapeDtypeStruct):
        return a
    return jnp.asarray(a)


def memoized_call(tag, jitted, args, statics=None, mesh=None,
                  compile_only=False, background=False):
    """Execute `jitted(*args)` through a memoized AOT executable.

    Why not just let @jax.jit cache? jit's executable cache is NOT
    populated by `.lower().compile()`, so a background prefetch could
    never warm it; routing the foreground call through this memo is what
    lets the suite compile a config's ELR/labeling/RPSS programs ahead
    (from ShapeDtypeStruct avals) while the previous config trains.

    tag/statics/mesh topology + the canonicalized input avals form the
    key. compile_only=True compiles into the memo and returns None
    (args may then be ShapeDtypeStructs); background=True makes the
    compile yield to any foreground-priority holder first."""
    args = tuple(_canon(a) for a in args)
    key = (tag, statics, _topology_key(mesh), _avals_key(args))
    if background and _program_memo.get(key) is None:
        # yield to foreground-priority compiles BEFORE claiming the key:
        # waiting after begin() could deadlock against a foreground caller
        # that holds the priority gate while blocking on our future
        _fg_compile_idle.wait()
    exe, fut = _program_memo.begin(key)
    if exe is None and fut is not None:
        exe = fut.result()
    if exe is None:
        try:
            exe = _compile_with_retry(jitted.lower(*args))
        except BaseException as e:
            _program_memo.finish(key, error=e)
            raise
        _program_memo.finish(key, exe)
    if compile_only:
        return None
    return exe(*args)
