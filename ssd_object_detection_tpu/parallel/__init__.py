"""Multi-chip scaling: device mesh + sharding helpers (absent in the reference —
SURVEY.md section 2's parallelism inventory; BASELINE.json config #5 requires v5e-8 DP)."""

from ssd_object_detection_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicate,
    shard_batch,
)
