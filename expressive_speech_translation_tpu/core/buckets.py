"""Shared static-shape bucketing (serving micro-batches + training lengths).

One implementation for the "smallest bucket ≥ n, double above the top"
policy: returning less than ``n`` ever again would reintroduce the silent
truncation/overflow class of bug (serve arrays indexed past their
allocation; training samples clipped with all-valid masks).
"""

from __future__ import annotations

from typing import Iterator, Sequence, Tuple


BATCH_BUCKETS = (1, 2, 4, 8, 16)   # serving batch-size ladder (one compiled
                                    # program per rung)


def bucket_batch(n: int, buckets: Sequence[int] = BATCH_BUCKETS) -> int:
    """Smallest batch bucket >= n (serve.batching re-exports this; the policy
    lives here so pipeline code never imports from the HTTP layer)."""
    return bucket_size(n, buckets)


def bucket_size(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket ≥ n; keeps doubling above the top bucket."""
    for b in buckets:
        if n <= b:
            return b
    b = buckets[-1]
    while b < n:
        b *= 2
    return b


def row_slices(n: int, cap: int) -> Iterator[Tuple[int, int]]:
    """(start, stop) windows of at most ``cap`` rows — callers split
    oversized bursts into multiple bounded device dispatches instead of
    allocating one arbitrarily large batch."""
    for s in range(0, n, cap):
        yield s, min(s + cap, n)
