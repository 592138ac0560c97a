"""Block <-> time resolution (S13, /root/reference/chainservice/block_dater.go).

Two implementations:

* ``blocks_table_lookup`` — the lake path: ``min(block_number) where ts >= X``
  on the landed blocks table. Strictly better than search when headers are
  landed (SURVEY §4: "Custom/unneeded").
* ``BlockDater`` — the RPC path for live use, porting the reference's
  interpolation search (block_dater.go:48-116): estimate average block time
  from (first, latest), guess, re-estimate around the guess until within
  tolerance (±180 s default, block_dater.go:46-48). Runs driver-side before
  plan build; memoizes headers like the reference's cache.
"""

from __future__ import annotations

from typing import Callable, Protocol

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_TOLERANCE_S = 180  # block_dater.go:46-48


def blocks_table_lookup(blocks: DataFrame, chain: str, timestamp: int) -> int | None:
    """First block at-or-after ``timestamp`` from the landed blocks table."""
    row = (
        blocks.filter((F.col("chain") == chain) & (F.col("timestamp") >= timestamp))
        .agg(F.min("block_number").alias("b"))
        .collect()[0]
    )
    return int(row.b) if row.b is not None else None


class HeaderClient(Protocol):
    """Minimal header access: block_number -> timestamp; None -> latest.
    Returns (block_number, timestamp)."""

    def header(self, chain: str, block: int | None) -> tuple[int, int]: ...


class BlockDater:
    """Interpolation search for block-by-timestamp (block_dater.go:48-116)."""

    def __init__(self, client: HeaderClient, chain: str, tolerance_s: int = DEFAULT_TOLERANCE_S):
        self.client = client
        self.chain = chain
        self.tolerance_s = tolerance_s
        self._cache: dict[int, int] = {}  # block -> ts (memoized, :21-36)

    def _header(self, block: int | None) -> tuple[int, int]:
        if block is not None and block in self._cache:
            return block, self._cache[block]
        num, ts = self.client.header(self.chain, block)
        self._cache[num] = ts
        return num, ts

    def block_by_timestamp(self, target_ts: int, max_steps: int = 60) -> int:
        """Estimate avg block time from the chain boundaries, then
        interpolate toward the target until within tolerance
        (block_dater.go:48-79, FindTargetBlock :99-116)."""
        first_block, first_ts = self._header(1)
        latest_block, latest_ts = self._header(None)
        if target_ts <= first_ts:
            return first_block
        if target_ts >= latest_ts:
            return latest_block
        lo, lo_ts = first_block, first_ts
        hi, hi_ts = latest_block, latest_ts
        guess = lo
        for _ in range(max_steps):
            span_blocks = hi - lo
            span_ts = hi_ts - lo_ts
            if span_blocks <= 1 or span_ts <= 0:
                return lo
            avg_block_time = span_ts / span_blocks
            guess = lo + int((target_ts - lo_ts) / avg_block_time)
            guess = max(min(guess, hi - 1), lo + 1)
            _, guess_ts = self._header(guess)
            if abs(guess_ts - target_ts) <= self.tolerance_s:
                return guess
            if guess_ts < target_ts:
                lo, lo_ts = guess, guess_ts
            else:
                hi, hi_ts = guess, guess_ts
        return guess

    def seconds_to_block_interval(self, seconds: int) -> int:
        """time_interval -> block_interval via the chain's observed average
        block time (SecondsToBlockInterval, block_dater.go:81-90)."""
        first_block, first_ts = self._header(1)
        latest_block, latest_ts = self._header(None)
        if latest_block <= first_block:
            return 1
        avg = (latest_ts - first_ts) / (latest_block - first_block)
        return max(int(seconds / avg), 1)


def resolve_query_range(
    *,
    start_time: int | None,
    end_time: int | None,
    time_interval: int | None,
    dater: BlockDater | None = None,
    blocks: DataFrame | None = None,
    chain: str | None = None,
) -> tuple[int | None, int | None, int | None]:
    """start/end/time_interval -> (start_block, end_block, block_interval),
    the pre-plan resolution step (chainservice/chainservice.go:103-125)."""
    start_block = end_block = block_interval = None
    if blocks is not None and chain is not None:
        if start_time is not None:
            start_block = blocks_table_lookup(blocks, chain, start_time)
        if end_time is not None:
            end_block = blocks_table_lookup(blocks, chain, end_time)
        if time_interval is not None:
            agg = blocks.filter(F.col("chain") == chain).agg(
                ((F.max("timestamp") - F.min("timestamp")) / (F.max("block_number") - F.min("block_number"))).alias("avg")
            ).collect()[0]
            block_interval = max(int(time_interval / float(agg.avg)), 1) if agg.avg else 1
    elif dater is not None:
        if start_time is not None:
            start_block = dater.block_by_timestamp(start_time)
        if end_time is not None:
            end_block = dater.block_by_timestamp(end_time)
        if time_interval is not None:
            block_interval = dater.seconds_to_block_interval(time_interval)
    return start_block, end_block, block_interval
