"""Persistent XLA compilation cache for the CLIs.

The GPTQ-PB solver compiles once per distinct (oc, ic) weight shape —
minutes per shape on a real TPU toolchain (BASELINE.md) — and a llama-7b
PTQ run touches 3-4 shapes.  JAX's persistent compilation cache makes every
run after the first hit disk instead of the compiler, which turns repeated
calibration / eval / serving launches (the reference's sweep workflow,
`gptq_pb/run_all.sh`) from ~30 min of compile into seconds.

Enabled by every CLI entry point. Controls:
  PB_TPU_COMPILE_CACHE=<dir>  cache directory (default ~/.cache/pb_llm_tpu/xla)
  PB_TPU_COMPILE_CACHE=0      disable
"""

from __future__ import annotations

import os


def enable_compile_cache() -> str | None:
    """Idempotently point JAX at a persistent on-disk compilation cache.

    Returns the cache dir, or None when disabled / unsupported.  Never
    raises: a missing feature or read-only filesystem degrades to normal
    in-memory compilation.
    """
    setting = os.environ.get("PB_TPU_COMPILE_CACHE", "")
    if setting == "0":
        return None
    # CPU runs: XLA:CPU AOT cache entries record compile-machine features
    # that can mismatch the loading host (warns, may SIGILL on shared/NFS
    # caches), and CPU compiles are cheap anyway — only cache for
    # accelerator backends.  An explicit PB_TPU_COMPILE_CACHE dir opts in
    # regardless.  The cheap env check short-circuits before any backend
    # initialization; otherwise ask jax for the actual default backend
    # (the CLI initializes it moments later anyway).
    if not setting:
        if (os.environ.get("JAX_PLATFORMS") or "").strip() == "cpu":
            return None
        try:
            import jax

            if jax.default_backend() == "cpu":
                return None
        except Exception:  # pragma: no cover - backend init failure
            return None
    cache_dir = setting or os.path.join(
        os.path.expanduser("~"), ".cache", "pb_llm_tpu", "xla")
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything: solver programs are large but few; engine decode
        # programs are the expensive ones to lose
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - old jax or RO filesystem
        return None
    return cache_dir
