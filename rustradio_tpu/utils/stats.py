"""Throughput / roofline accounting.

The reference prints a per-block wall+CPU time table after every run
(src/graph.rs:175-257).  Graph.generate_stats() covers that; this module
adds rate metering for streaming feeds and a simple per-op roofline
estimate (achieved GB/s vs the chip's HBM bandwidth).
"""

from __future__ import annotations

import dataclasses
import time

#: Published HBM bandwidth per chip, GB/s (for roofline %).
HBM_GBPS = {
    "TPU v4": 1200.0,
    "TPU v5 lite": 820.0,
    "TPU v5": 2765.0,
    "TPU v6 lite": 1640.0,
    "cpu": 50.0,
}


@dataclasses.dataclass
class RateMeter:
    """Track samples/s over a streaming run."""

    samples: int = 0
    t0: float = dataclasses.field(default_factory=time.perf_counter)

    def add(self, n: int):
        self.samples += n

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self.t0

    @property
    def msps(self) -> float:
        return self.samples / max(self.elapsed, 1e-12) / 1e6

    def report(self) -> str:
        return f"{self.samples} samples in {self.elapsed:.3f}s = {self.msps:.1f} Msps"


def device_hbm_gbps(device=None) -> float:
    import jax

    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "cpu")
    for k, v in HBM_GBPS.items():
        if k.lower() in str(kind).lower():
            return v
    return HBM_GBPS.get("cpu", 50.0)


def roofline_report(bytes_moved: int, seconds: float, device=None) -> str:
    """Achieved bandwidth vs the chip's HBM roofline."""
    gbps = bytes_moved / max(seconds, 1e-12) / 1e9
    roof = device_hbm_gbps(device)
    return f"{gbps:.1f} GB/s ({100 * gbps / roof:.0f}% of ~{roof:.0f} GB/s HBM)"
