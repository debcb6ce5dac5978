"""Observability: phase timers and XLA profiler capture.

The reference's entire observability surface is a list of objective values
(SURVEY.md section 5.5). This module adds what a production fit needs:
wall-clock phase timing that separates compile from execute, and one-line
access to the JAX profiler for TensorBoard-readable device traces.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field


@dataclass
class Timings:
    """Accumulated named phase durations (seconds)."""

    phases: dict[str, float] = field(default_factory=dict)
    counts: dict[str, int] = field(default_factory=dict)

    def add(self, name: str, seconds: float) -> None:
        self.phases[name] = self.phases.get(name, 0.0) + seconds
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        width = max((len(k) for k in self.phases), default=0)
        lines = [
            f"{name:<{width}}  {seconds:9.3f}s  x{self.counts[name]}"
            for name, seconds in sorted(
                self.phases.items(), key=lambda kv: -kv[1]
            )
        ]
        return "\n".join(lines)


@contextmanager
def phase(timings: Timings, name: str):
    """Time a named phase; device work is flushed before stopping the clock."""
    start = time.perf_counter()
    try:
        yield
    finally:
        _block_on_device()
        timings.add(name, time.perf_counter() - start)


def _block_on_device() -> None:
    """Drain pending device work so the clock stops at completion, not
    dispatch: synchronize every device (PJRT), falling back to the
    effects barrier where unsupported."""
    try:
        import jax

        for device in jax.devices():
            synchronize = getattr(device, "synchronize_all_activity", None)
            if synchronize is not None:
                synchronize()
        jax.effects_barrier()
    except Exception:
        pass


@contextmanager
def device_trace(log_dir: str):
    """Capture an XLA device trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_fit(model, adata, timings: Timings | None = None, **fit_kwargs):
    """model.fit with compile/execute separation: the first call of a given
    shape pays XLA compilation; a second identical-state call measures
    steady-state. Returns (model, Timings)."""
    timings = timings or Timings()
    with phase(timings, "fit(total, incl. compile)"):
        model.fit(adata, **fit_kwargs)
    return model, timings
