from gloc3d_tpu.eval.recall import ground_truth_positives, recall_at_n  # noqa: F401
from gloc3d_tpu.eval.registration import (  # noqa: F401
    compose_6dof,
    registration_errors,
    registration_stats,
)
