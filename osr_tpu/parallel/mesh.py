"""Device-mesh helpers.

The reference is a single Python process with no distributed backend
(SURVEY.md §2.4); scaling the corpus across chips is introduced here as a
first-class layer: a 2-D mesh with axes

- ``q`` — query-batch data parallelism (pure DP; no communication except
  the final result layout), and
- ``d`` — document/index sharding (the retrieval analogue of tensor/expert
  parallelism: postings rows live on exactly one chip; per-shard top-k
  results are merged with one all-gather over ICI).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
from jax.sharding import Mesh

QUERY_AXIS = "q"
DOC_AXIS = "d"


def pick_mesh_shape(n_devices: int, query_parallel: Optional[int] = None) -> Tuple[int, int]:
    """Choose (n_q, n_d) for ``n_devices``.

    Document sharding is the capacity axis (it divides HBM footprint), so by
    default all devices go to ``d``; callers opt into query DP when query
    volume, not index size, is the bottleneck.
    """
    if query_parallel is None:
        return (1, n_devices)
    if n_devices % query_parallel:
        raise ValueError(
            f"query_parallel={query_parallel} must divide n_devices={n_devices}"
        )
    return (query_parallel, n_devices // query_parallel)


def make_mesh(
    n_devices: Optional[int] = None, query_parallel: Optional[int] = None
) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n_q, n_d = pick_mesh_shape(len(devices), query_parallel)
    import numpy as np

    return Mesh(
        np.asarray(devices).reshape(n_q, n_d), axis_names=(QUERY_AXIS, DOC_AXIS)
    )
