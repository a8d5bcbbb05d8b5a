"""Profiling hooks: jax.profiler traces viewable in Perfetto/TensorBoard.

The reference has no profiling story at all (SURVEY §5 tracing row). Here:
- training captures a bounded trace of its first steps via :class:`StepTracer`
  (``TrainConfig.profile_dir`` / ``toad_tpu.cli.train --profile``);
- featurization wraps whole runs in :func:`profile_trace`
  (``toad_tpu.cli.featurize --profile``) with :func:`annotate` scopes on the
  embed dispatch so kernels attribute to pipeline stages.
"""

from __future__ import annotations

import os
from contextlib import contextmanager


@contextmanager
def profile_trace(log_dir: str | os.PathLike | None, enabled: bool = True):
    """Capture a jax.profiler trace into ``log_dir`` for the ``with`` body.
    No-op when disabled or log_dir is None; never lets a profiler failure
    break the run."""
    if not enabled or log_dir is None:
        yield
        return
    import jax

    started = False
    try:
        jax.profiler.start_trace(str(log_dir))
        started = True
    except Exception as e:  # pragma: no cover - environment-dependent
        print(f"[profile] trace unavailable: {e}")
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                print(f"[profile] trace written to {log_dir}")
            except Exception as e:  # pragma: no cover
                print(f"[profile] stop_trace failed: {e}")


def annotate(name: str):
    """Scope annotation that shows up on the trace timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTracer:
    """Trace the first `n_steps` calls, then stop — bounded profile captures
    inside long epoch loops without restructuring them."""

    def __init__(self, log_dir: str | os.PathLike | None, n_steps: int = 10):
        self.log_dir = log_dir
        self.n_steps = n_steps
        self._count = 0
        self._active = False

    def step(self) -> None:
        if self.log_dir is None:
            return
        if self._count == 0:
            import jax

            try:
                jax.profiler.start_trace(str(self.log_dir))
                self._active = True
            except Exception as e:  # pragma: no cover
                print(f"[profile] trace unavailable: {e}")
                self.log_dir = None
                return
        self._count += 1
        if self._count >= self.n_steps:
            self.stop()

    def stop(self) -> None:
        if self._active:
            import jax

            try:
                jax.profiler.stop_trace()
                print(f"[profile] trace of {self._count} steps written to {self.log_dir}")
            except Exception as e:  # pragma: no cover
                print(f"[profile] stop_trace failed: {e}")
            self._active = False
            self.log_dir = None


def host_rss_gb() -> float:
    """This process's resident set size in GiB (Linux ``/proc/self/status``).

    Used by the trainer's leaky-runtime containment
    (``TrainConfig.rss_restart_gb``) and the server's ``--max_rss_gb``
    watchdog. Returns 0.0 where /proc is unavailable (non-Linux), which
    disables both checks gracefully."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / (1024 * 1024)
    except OSError:
        pass
    return 0.0
