"""Tracing / profiling / observability helpers (SURVEY.md §5 aux row).

Replaces the reference's ad-hoc timers (AverageTimer utils/common.py:135-174,
Timer agc.py:17-61, time_synchronized common.py:88-91) with the same stage
names, plus jax.profiler integration for real TPU traces and a device peak
memory probe (replacing torch.cuda.max_memory_allocated,
eval_matches.py:150-153).
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import OrderedDict

import jax


def time_synchronized():
    """Wall time after draining in-flight device work."""
    try:
        jax.effects_barrier()
    except Exception:  # noqa: BLE001
        pass
    return time.time()


class AverageTimer:
    """Exponentially smoothed stage timer — same surface as the reference's
    (update/print with named stages)."""

    def __init__(self, smoothing=0.3, newline=False):
        self.smoothing = smoothing
        self.newline = newline
        self.times = OrderedDict()
        self.will_print = OrderedDict()
        self.reset()

    def reset(self):
        now = time.time()
        self.start = now
        self.last_time = now
        for name in self.will_print:
            self.will_print[name] = False

    def update(self, name="default"):
        now = time.time()
        dt = now - self.last_time
        if name in self.times:
            dt = self.smoothing * dt + (1 - self.smoothing) * self.times[name]
        self.times[name] = dt
        self.will_print[name] = True
        self.last_time = now

    def print(self, text="Timer"):
        total = 0.0
        parts = [f"[{text}]"]
        for key, val in self.times.items():
            if self.will_print.get(key):
                parts.append(f"{key}={val:.3f}")
                total += val
        parts.append(f"total={total:.3f} sec {{{1.0 / max(total, 1e-9):.1f} FPS}}")
        end = "\n" if self.newline else "\r"
        print(" ".join(parts), end=end, flush=True)
        self.reset()


class Timer(contextlib.AbstractContextManager):
    """`with Timer('stage'):` context timer (reference: agc.py:17-61)."""

    def __init__(self, name="stage", sync=True, quiet=False):
        self.name = name
        self.sync = sync
        self.quiet = quiet
        self.elapsed = 0.0

    def __enter__(self):
        if self.sync:
            time_synchronized()
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync:
            time_synchronized()
        self.elapsed = time.perf_counter() - self.t0
        if not self.quiet:
            print(f">> {self.name}: {self.elapsed:.3f}s")
        return False


@contextlib.contextmanager
def tpu_trace(logdir="/tmp/gims_tpu_trace"):
    """Capture a jax.profiler trace around a region (view with xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def device_peak_memory_gb() -> float:
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0))
        return peak / (1024**3)
    except Exception:  # noqa: BLE001
        return 0.0


def device_warmup(steps: int = 5) -> None:
    """Warm the accelerator with a few matmuls before timing — the
    reference's gpu_warmup capability (utils/common.py:809-820)."""
    import jax.numpy as jnp

    x = jnp.ones((1024, 1024), jnp.float32)
    for _ in range(steps):
        x = jnp.tanh(x @ x * 1e-3)
    np_val = float(jnp.sum(x))  # force completion through a host readout
    del np_val


def send_notify(msg: str) -> None:
    """Best-effort completion notifier.

    The reference pings a personal WeChat webhook (utils/common.py:831-835);
    here the hook is env-configured and a no-op by default (zero-egress
    environments must not attempt network calls).
    """
    url = os.environ.get("GIMS_NOTIFY_URL")
    if not url:
        return
    try:
        import urllib.request

        urllib.request.urlopen(url + urllib.parse.quote(msg), timeout=2)
    except Exception:  # noqa: BLE001
        pass
