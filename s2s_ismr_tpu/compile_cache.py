"""Persistent XLA compilation cache setup.

The tuning sweep is one large jitted program (vmap over lanes of a
scan-of-scans train step); on TPU its XLA compile costs minutes while the
run itself costs seconds — the reference never hits this because Keras
re-traces eagerly per fit (and pays for it in throughput instead). A
persistent on-disk cache makes every re-run (same config/shape) skip
compilation entirely, which is what gets the full multi-config sweep
under the BASELINE.md wall-clock target on a single chip.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser(
    os.environ.get("S2S_ISMR_COMPILE_CACHE", "~/.cache/s2s_ismr_tpu/xla"))

_enabled_dir: str | None = None


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently enable JAX's persistent compilation cache.

    Returns the cache dir actually in effect, or None when disabled —
    via S2S_ISMR_COMPILE_CACHE=0, or automatically under the axon
    remote-compile TPU plugin, whose runtime ABORTS when executing a
    deserialized cached executable (measured: cache *hit* -> "TPU
    backend error (Aborted)"). An explicit `cache_dir` argument or a
    directory in S2S_ISMR_COMPILE_CACHE force-enables regardless.
    """
    global _enabled_dir
    if _enabled_dir is not None:
        return _enabled_dir          # already applied; report what's live
    if cache_dir is None:
        d = _DEFAULT_DIR
        if d in ("0", "off", "none"):
            return None
        if (os.environ.get("PALLAS_AXON_REMOTE_COMPILE")
                and not os.environ.get("S2S_ISMR_COMPILE_CACHE")):
            return None
    else:
        d = cache_dir                # explicit caller intent wins
    import jax
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    # cache everything that took meaningful time; tiny programs recompile fast
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled_dir = d
    return d
