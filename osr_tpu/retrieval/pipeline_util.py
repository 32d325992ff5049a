"""Bounded dispatch/collect pipelining shared by the engines.

Every engine's ``search`` follows the same flight-control pattern: chunk
the pending queries by the largest batch bucket, dispatch each chunk's
device step asynchronously, and keep a bounded number of chunks in
flight so host work (tokenize, tail postings, embedding) overlaps
device/tunnel work without unbounded HBM queueing. The per-engine parts
— query prep, caching, result assembly — stay with the engines; only
the flight control lives here so its semantics can't drift between the
flat, sharded, and hybrid paths (r4 review finding).
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple, TypeVar

T = TypeVar("T")


def run_pipelined(
    pending: Sequence[T],
    chunk_size: int,
    dispatch: Callable[[List[T]], object],
    collect: Callable[[List[T], object], None],
    depth: int = 4,
) -> None:
    """Dispatch ``pending`` in ``chunk_size`` chunks, collecting each
    chunk once more than ``depth`` are in flight (and all of them at the
    end). ``depth`` bounds live device workspace: each in-flight entry
    holds its device result buffers until collected."""
    in_flight: List[Tuple[List[T], object]] = []
    for i in range(0, len(pending), chunk_size):
        chunk = list(pending[i : i + chunk_size])
        in_flight.append((chunk, dispatch(chunk)))
        if len(in_flight) > depth:
            collect(*in_flight.pop(0))
    while in_flight:
        collect(*in_flight.pop(0))
