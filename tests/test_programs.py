"""Unit tests for the shared program memo (s2s_ismr_tpu/programs.py).

The memo is the machinery behind the suite's compile-ahead: background
threads lower+compile programs from avals while the foreground pipeline
runs, and foreground calls route through the same memo so they reuse (or
join in-flight) those compiles. These tests pin its contracts directly;
the integration behavior is covered in test_run_cli.py
(test_suite_compile_ahead_scheduling) and the sweep tests.
"""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2s_ismr_tpu import programs


@pytest.fixture(autouse=True)
def _fresh_memo():
    programs._program_memo.clear()
    yield
    programs._program_memo.clear()


def _counting_jit():
    """A jitted fn whose trace count observes compile sharing."""
    traces = []

    @jax.jit
    def f(a):
        traces.append(1)
        return a * 2.0 + 1.0

    return f, traces


def test_memo_hit_after_compile_only_from_avals():
    """compile_only with ShapeDtypeStructs warms the memo; the later real
    call executes the SAME executable without re-tracing (the property
    jit's own cache lacks: .lower().compile() does not populate it)."""
    f, traces = _counting_jit()
    aval = jax.ShapeDtypeStruct((4,), jnp.float32)
    assert programs.memoized_call("t", f, (aval,), compile_only=True) is None
    n_after_prefetch = len(traces)
    out = programs.memoized_call("t", f, (jnp.arange(4, dtype=jnp.float32),))
    np.testing.assert_allclose(np.asarray(out),
                               np.arange(4) * 2.0 + 1.0)
    assert len(traces) == n_after_prefetch    # no second trace


def test_memo_keys_split_on_tag_statics_and_avals():
    """tag, statics, and input avals each contribute to the memo key
    (trace counts can't observe this — jit reuses its trace across tags —
    so assert on the memo's entry count directly)."""
    f, traces = _counting_jit()
    x4 = jnp.zeros((4,), jnp.float32)
    x8 = jnp.zeros((8,), jnp.float32)

    def n_entries():
        return len(programs._program_memo._d)

    programs.memoized_call("a", f, (x4,))
    assert n_entries() == 1
    programs.memoized_call("a", f, (x8,))        # new aval -> new entry
    assert n_entries() == 2
    assert len(traces) == 2                      # and a real re-trace
    programs.memoized_call("b", f, (x4,))        # new tag -> new entry
    assert n_entries() == 3
    programs.memoized_call("a", f, (x4,), statics=("s",))  # new statics
    assert n_entries() == 4
    # all four keys now warm: repeats add nothing
    programs.memoized_call("a", f, (x4,))
    programs.memoized_call("a", f, (x8,))
    programs.memoized_call("b", f, (x4,))
    programs.memoized_call("a", f, (x4,), statics=("s",))
    assert n_entries() == 4 and len(traces) == 2


def test_inflight_compile_is_shared_not_duplicated():
    """Two threads racing the same key produce ONE compile; the loser
    blocks on the winner's future (the suite's prefetch-vs-foreground
    dedup)."""
    traces = []
    release = threading.Event()

    @jax.jit
    def slow(a):
        traces.append(1)
        release.wait(10.0)       # hold the first trace open
        return a + 1.0

    x = jnp.zeros((2,), jnp.float32)
    outs = []

    def call():
        outs.append(programs.memoized_call("slow", slow, (x,)))

    t1 = threading.Thread(target=call)
    t2 = threading.Thread(target=call)
    t1.start()
    # let t1 claim the key and enter the slow trace
    for _ in range(200):
        if traces:
            break
        time.sleep(0.01)
    t2.start()
    time.sleep(0.2)              # t2 must be waiting, not tracing
    release.set()
    t1.join(30.0)
    t2.join(30.0)
    assert not (t1.is_alive() or t2.is_alive())
    assert len(traces) == 1      # one compile, shared
    assert len(outs) == 2


def test_background_compile_defers_to_foreground_priority():
    """background=True waits for the foreground gate to clear BEFORE
    claiming the key; a foreground (background=False) call proceeds even
    while the gate is held — the holder's own compiles must not deadlock
    against the gate they hold (round-5 ELR parallel-compile fix)."""
    f, traces = _counting_jit()
    x = jnp.zeros((3,), jnp.float32)
    done = threading.Event()

    with programs.foreground_compile_priority():
        # the gate holder's own foreground call runs through
        programs.memoized_call("fg", f, (x,))
        assert traces

        g, g_traces = _counting_jit()
        t = threading.Thread(
            target=lambda: (programs.memoized_call(
                "bg", g, (x,), compile_only=True, background=True),
                done.set()))
        t.start()
        time.sleep(0.3)
        assert not done.is_set()         # background defers while held
        assert not g_traces
    # gate released -> background proceeds
    assert done.wait(30.0)
    t.join(30.0)
    assert g_traces


def test_background_memo_hit_skips_the_gate_wait():
    """A background call whose program is already memoized returns
    immediately even while the gate is held (no pointless deferral)."""
    f, _ = _counting_jit()
    x = jnp.zeros((3,), jnp.float32)
    programs.memoized_call("warm", f, (x,), compile_only=True)
    done = threading.Event()
    with programs.foreground_compile_priority():
        t = threading.Thread(
            target=lambda: (programs.memoized_call("warm", f, (x,)),
                            done.set()))
        t.start()
        assert done.wait(10.0)           # served from the memo, no wait
        t.join(10.0)


def test_failed_compile_propagates_and_key_is_retryable():
    """A compile error reaches every waiter, and the key is released so a
    later (fixed) call can retry rather than being wedged forever."""
    calls = []

    @jax.jit
    def bad(a):
        calls.append(1)
        raise ValueError("trace-time failure")

    x = jnp.zeros((2,), jnp.float32)
    with pytest.raises(ValueError):
        programs.memoized_call("bad", bad, (x,))
    # the key must not be poisoned: a retry attempts a fresh compile
    with pytest.raises(ValueError):
        programs.memoized_call("bad", bad, (x,))
    assert len(calls) == 2


def test_foreground_priority_gate_is_depth_counted():
    assert programs._fg_compile_idle.is_set()
    with programs.foreground_compile_priority():
        with programs.foreground_compile_priority():
            assert not programs._fg_compile_idle.is_set()
        assert not programs._fg_compile_idle.is_set()   # still held
    assert programs._fg_compile_idle.is_set()
