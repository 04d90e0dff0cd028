"""MetricLogger / SmoothedValue — host-side training telemetry.

Rebuild of utils/utils.py:224-283 (SmoothedValue: windowed meters) and
:313-400 (MetricLogger.log_every: iteration/data timing, ETA, device memory).
Cross-process sync uses one jax psum over a metrics vector (replacing the
reference's cuda-tensor all_reduce) when running multi-host; single-host it
is a no-op.
"""

from __future__ import annotations

import datetime
import time
from collections import defaultdict, deque
from typing import Iterable, Iterator, Optional


class SmoothedValue:
    """Windowed median/avg + global average (utils/utils.py:224-283)."""

    def __init__(self, window_size: int = 20, fmt: Optional[str] = None):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt or "{median:.6f} ({global_avg:.6f})"

    def update(self, value: float, n: int = 1) -> None:
        self.deque.append(value)
        self.count += n
        self.total += value * n

    def synchronize_between_processes(self) -> None:
        """Sum count/total across hosts (multi-process jax); windowed deque
        stays local — same caveat as the reference (:242)."""
        import jax

        if jax.process_count() == 1:
            return
        import jax.numpy as jnp
        from jax.experimental import multihost_utils

        arr = multihost_utils.process_allgather(jnp.asarray([self.count, self.total]))
        self.count = int(arr[:, 0].sum())
        self.total = float(arr[:, 1].sum())

    @property
    def median(self) -> float:
        import numpy as np

        return float(np.median(list(self.deque))) if self.deque else 0.0

    @property
    def avg(self) -> float:
        import numpy as np

        return float(np.mean(list(self.deque))) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def max(self) -> float:
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self) -> str:
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            max=self.max, value=self.value,
        )


class MetricLogger:
    def __init__(self, delimiter: str = "  "):
        self.meters = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs) -> None:
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self) -> str:
        return self.delimiter.join(f"{name}: {meter}" for name, meter in self.meters.items())

    def synchronize_between_processes(self) -> None:
        for meter in self.meters.values():
            meter.synchronize_between_processes()

    def add_meter(self, name: str, meter: SmoothedValue) -> None:
        self.meters[name] = meter

    def log_every(self, iterable: Iterable, print_freq: int, header: str = "") -> Iterator:
        """utils/utils.py:348-400: yields items, logging iter/data time + ETA
        (+ live device memory when a TPU backend exposes stats)."""
        i = 0
        start_time = time.time()
        end = time.time()
        iter_time = SmoothedValue(fmt="{avg:.6f}")
        data_time = SmoothedValue(fmt="{avg:.6f}")
        try:
            total = len(iterable)  # type: ignore[arg-type]
        except TypeError:
            total = None
        space = len(str(total)) if total else 6
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0 or (total and i == total - 1):
                eta = ""
                if total:
                    eta_seconds = iter_time.global_avg * (total - i)
                    eta = f"eta: {datetime.timedelta(seconds=int(eta_seconds))}  "
                mem = _device_memory_mb()
                mem_s = f"  mem: {mem:.0f}MB" if mem is not None else ""
                print(
                    f"{header} [{i:{space}d}/{total or '?'}]  {eta}{self}  "
                    f"time: {iter_time}  data: {data_time}{mem_s}"
                )
            i += 1
            end = time.time()
        total_time = time.time() - start_time
        print(f"{header} Total time: {datetime.timedelta(seconds=int(total_time))}")


def _device_memory_mb() -> Optional[float]:
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
        if stats and "bytes_in_use" in stats:
            return stats["bytes_in_use"] / 1e6
    except Exception:
        pass
    return None
