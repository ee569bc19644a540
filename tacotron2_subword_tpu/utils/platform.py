"""Platform setup helpers shared by the CLI apps."""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Enable JAX's persistent compilation cache so repeated app runs
    (resume, sweeps, inference restarts) skip the 1-4 minute XLA compiles.
    Safe to call multiple times."""
    import jax

    # The axon remote-compile tunnel does not support executable
    # serialization: enabling the cache there makes every compile ~100x
    # slower and writes no entries (measured: 264s vs 2s for a trivial
    # jit).  Enable only on backends that compile locally.
    try:
        backend = jax.default_backend()
    except Exception:
        return
    if backend == "axon" or os.environ.get("JAX_PLATFORMS") == "axon":
        return

    path = cache_dir or os.environ.get(
        "TACOTRON2_TPU_COMPILE_CACHE",
        os.path.expanduser("~/.cache/tacotron2_subword_tpu/xla"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
