from mod_extraction_tpu.utils.interp import (
    linear_interpolate_last_dim,
    linear_resample,
)
from mod_extraction_tpu.utils.prng import (
    sample_uniform,
    sample_log_uniform,
    sample_randint,
    sample_choice,
)

__all__ = [
    "linear_interpolate_last_dim",
    "linear_resample",
    "sample_uniform",
    "sample_log_uniform",
    "sample_randint",
    "sample_choice",
]
