"""Platform setup helpers shared by the CLI apps."""

from __future__ import annotations

import os


class StepProfiler:
    """JAX/XLA profiler integration (replaces the reference's ad-hoc
    time.perf_counter step timing, train.py:289,343-345, with real traces).

    Captures a TensorBoard-compatible xprof trace of steps
    [start_step, start_step + num_steps) into ``logdir/plugins/profile``.
    """

    def __init__(self, logdir: str | None, start_step: int = 5,
                 num_steps: int = 3):
        self.logdir = logdir
        self.start = start_step
        self.stop = start_step + num_steps
        self._active = False

    def step(self, iteration: int) -> None:
        if not self.logdir:
            return
        import jax
        if iteration == self.start and not self._active:
            jax.profiler.start_trace(self.logdir)
            self._active = True
        elif iteration >= self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False
            print(f"profiler trace written to {self.logdir}")

    def close(self) -> None:
        if self._active:
            import jax
            jax.profiler.stop_trace()
            self._active = False


def _host_cpu_tag() -> str:
    """Short hash of this host's CPU feature flags.  XLA:CPU AOT cache
    entries hard-abort (SIGABRT, not a catchable error) when loaded on a
    machine whose features differ from the compile machine — observed
    after a VM migration: 'Target machine feature +prefer-no-gather is
    not supported on the host machine'.  Keying the cache dir by the
    feature set gives every distinct host its own cache instead."""
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(flags.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform as _pl
    return hashlib.sha1(_pl.processor().encode()).hexdigest()[:12]


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
        backend = None
    # Trust the RESOLVED backend when available: a process that switched
    # itself to CPU (jax.config.update) must get the cache even though the
    # image exports JAX_PLATFORMS=axon.  The env var is only the fallback
    # signal when no backend has initialized yet.
    if backend == "axon" or (backend is None
                             and os.environ.get("JAX_PLATFORMS") == "axon"):
        return

    path = cache_dir or os.environ.get(
        "TACOTRON2_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~/.cache/tacotron2_subword_tpu"),
                     f"xla-{_host_cpu_tag()}"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
