"""Device compute core: batched JAX/Pallas kernels for the per-pixel stages.

Each op has a numpy oracle (`*_ref` modules) mirroring the reference C++
arithmetic exactly, used as the decision-parity baseline in tests.
"""

from .logo import (
    LogoEvalParams,
    batched_delogo,
    batched_deint_y,
    batched_evaluate_logo,
    logo_sums_update,
    logo_ab_from_sums,
)

__all__ = [
    "LogoEvalParams",
    "batched_delogo",
    "batched_deint_y",
    "batched_evaluate_logo",
    "logo_sums_update",
    "logo_ab_from_sums",
]
