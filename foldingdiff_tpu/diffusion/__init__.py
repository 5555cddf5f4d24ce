from foldingdiff_tpu.diffusion.schedules import (  # noqa: F401
    DiffusionSchedule,
    cosine_beta_schedule,
    linear_beta_schedule,
    quadratic_beta_schedule,
    get_variance_schedule,
    compute_alphas,
)
from foldingdiff_tpu.diffusion.noise import q_sample, sample_wrapped_noise  # noqa: F401
