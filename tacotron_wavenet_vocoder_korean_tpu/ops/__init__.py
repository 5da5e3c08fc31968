"""Low-level TPU ops: Pallas kernels."""
from .wavenet_pallas import (
    pack_params, precompute_lc_proj, pallas_generate,
    pallas_incremental_generate,
)

__all__ = ["pack_params", "precompute_lc_proj", "pallas_generate",
           "pallas_incremental_generate"]
