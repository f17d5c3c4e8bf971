"""Performance clocks and profiler scopes.

Re-design of the reference's cpu_clock infrastructure
(/root/reference/src/framework/MOM_cpu_clock.F90 over mpp_clock_*,
used as cpu_clock_begin/end pairs around every model phase): named
nestable wall-clock timers with call counts, plus optional
``jax.profiler.TraceAnnotation`` scopes so phases show up on the TPU
trace viewer.  Because jax dispatch is asynchronous, a timer that
should measure device work can pass ``sync=lambda: x`` to block on a
result; by default timers measure host-side wall time (dispatch +
python), which is what the driver-level phase budget needs.

Usage::

    CLOCKS = ClockRegistry()
    with CLOCKS("dynamics"):
        state = step(...)
    print(CLOCKS.report())
"""

from __future__ import annotations

import contextlib
import time

__all__ = ["ClockRegistry", "clock"]


class _Clock:
    __slots__ = ("name", "total", "count", "max")

    def __init__(self, name):
        self.name = name
        self.total = 0.0
        self.count = 0
        self.max = 0.0

    def add(self, dt):
        self.total += dt
        self.count += 1
        self.max = max(self.max, dt)


class ClockRegistry:
    """Named timers; nesting tracked by a stack for indented reports."""

    def __init__(self, trace: bool = True):
        self._clocks: dict[str, _Clock] = {}
        self._stack: list[str] = []
        self._depth: dict[str, int] = {}
        self._trace = trace

    @contextlib.contextmanager
    def __call__(self, name: str, sync=None):
        full = name
        self._depth.setdefault(full, len(self._stack))
        self._stack.append(full)
        ann = None
        if self._trace:
            try:
                import jax.profiler
                ann = jax.profiler.TraceAnnotation(name)
                ann.__enter__()
            except Exception:
                ann = None
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                try:
                    import jax
                    jax.block_until_ready(sync())
                except Exception:
                    pass
            dt = time.perf_counter() - t0
            if ann is not None:
                ann.__exit__(None, None, None)
            self._stack.pop()
            self._clocks.setdefault(full, _Clock(full)).add(dt)

    def report(self) -> str:
        """MOM_cpu_clock-style summary: name, calls, total, mean, max."""
        lines = ["%-32s %8s %12s %12s %12s"
                 % ("clock", "calls", "total[s]", "mean[ms]", "max[ms]")]
        for name, c in sorted(self._clocks.items(),
                              key=lambda kv: -kv[1].total):
            pad = "  " * self._depth.get(name, 0)
            mean = c.total / max(c.count, 1)
            lines.append("%-32s %8d %12.3f %12.3f %12.3f"
                         % (pad + name, c.count, c.total, 1e3 * mean,
                            1e3 * c.max))
        return "\n".join(lines) + "\n"

    def reset(self):
        self._clocks.clear()
        self._depth.clear()


# module-level default registry (the reference's global clock ids)
clock = ClockRegistry()
