"""Per-phase device round-trip accounting.

On the remote-TPU tunnel every dispatch or device_get pays a ~67 ms round
trip while the kernels themselves take ~10 ms (BENCH_r03 mfu: <0.01% of
peak) — wall-clock is dispatch count x RTT, not FLOPs. These counters make
that structure visible in the bench artifact: each entry counts HOST-
BLOCKING round trips (async dispatches that overlap each other are counted
where the host eventually blocks).

Usage: tick("phase") at each dispatch/fetch site; bench.py resets before
the measured pass and reports the snapshot next to a measured RTT floor,
so `seconds - count * rtt` splits every stage into latency vs compute.
"""
from __future__ import annotations

from typing import Dict

COUNTS: Dict[str, int] = {}


def tick(phase: str, n: int = 1) -> None:
    COUNTS[phase] = COUNTS.get(phase, 0) + n


def reset() -> None:
    COUNTS.clear()


def snapshot() -> Dict[str, int]:
    return dict(COUNTS)
