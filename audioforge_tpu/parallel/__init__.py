"""Multi-chip fleet parallelism: mesh construction and candidate-axis
sharding for the batched calibration workloads (SURVEY §2.9 — the TPU
equivalent of the reference's absent distributed layer is pure data
parallelism over candidates/takes, collective-free over ICI)."""

from .fleet import (  # noqa: F401
    batch_axis_of,
    fleet_mesh,
    pad_candidates,
    shard_batched_tree,
)
