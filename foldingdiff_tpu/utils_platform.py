"""
Platform selection shared by the CLIs.

The deployment environment may preset a remote-TPU platform AND re-assert it
from sitecustomize at interpreter start, so exporting JAX_PLATFORMS=cpu alone
is NOT sufficient to force CPU -- jax.config must be updated after import
too. Every jax-running CLI funnels through maybe_force_cpu() so a --cpu flag
or a JAX_PLATFORMS=cpu environment both actually take effect; without this,
a subprocess launched with JAX_PLATFORMS=cpu can silently initialize the
remote backend (and hang if its tunnel is down).
"""
import os


def maybe_force_cpu(cpu_flag: bool = False) -> bool:
    """Force the CPU jax platform when requested via a --cpu flag or an
    inherited JAX_PLATFORMS=cpu environment. Returns True when forced.
    Must run before any jax backend is touched."""
    env = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if not (cpu_flag or env == "cpu"):
        return False
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    return True
