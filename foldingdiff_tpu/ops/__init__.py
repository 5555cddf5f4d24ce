from foldingdiff_tpu.ops.angles import wrap_angles, wrapped_mean_jnp  # noqa: F401
