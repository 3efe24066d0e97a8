"""Per-stage timing + optional jax.profiler tracing.

The reference's only observability is per-section wall-clock prints
(neighborhoodwatch.py:106-182) and nvtop screenshots; here timing is a
structured subsystem and device tracing hooks into `jax.profiler`
(SURVEY.md §5 tracing plan).
"""

import contextlib
import json
import time
from dataclasses import dataclass, field


@dataclass
class StageTimer:
    """Collects named stage durations; printable and JSON-serializable."""
    stages: dict = field(default_factory=dict)
    _t0: float = field(default_factory=time.time)

    @contextlib.contextmanager
    def stage(self, name: str):
        start = time.time()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + time.time() - start

    def total(self) -> float:
        return time.time() - self._t0

    def report(self) -> str:
        lines = [f"  {name:<28s} {secs:9.2f} s" for name, secs in self.stages.items()]
        lines.append(f"  {'TOTAL':<28s} {self.total():9.2f} s")
        return "\n".join(lines)

    def to_json(self) -> str:
        return json.dumps({**self.stages, "total": self.total()})


@contextlib.contextmanager
def device_trace(trace_dir: str | None):
    """Wrap a region in a jax.profiler trace when `trace_dir` is set.

    Profiler failures must never kill a multi-hour generation run: start
    errors degrade to no tracing, stop errors are reported and swallowed."""
    if not trace_dir:
        yield
        return
    import jax
    try:
        jax.profiler.start_trace(trace_dir)
    except Exception as e:  # pragma: no cover - environment dependent
        print(f"[warn] profiler trace unavailable ({e}); continuing untraced")
        yield
        return
    try:
        yield
    finally:
        try:
            jax.profiler.stop_trace()
        except Exception as e:  # pragma: no cover
            print(f"[warn] profiler stop_trace failed: {e}")
