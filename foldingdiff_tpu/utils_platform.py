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
import tempfile
from contextlib import contextmanager
from typing import Optional

# Advisory host-busy sentinel. This host has ONE CPU core feeding the TPU
# tunnel, so a training/bench/eval job running concurrently with the test
# suite starves the multihost e2e tests' subprocess timeouts (measured: 2
# spurious 600 s-timeout failures when the suite overlapped a training run;
# both pass uncontended). Long TPU jobs hold this lock; the
# contention-sensitive tests skip with a documented reason while it is held
# by a live process (tests/helpers.require_uncontended_host).
TPU_JOB_LOCK = os.path.join(tempfile.gettempdir(), "foldingdiff_tpu_job.lock")


@contextmanager
def tpu_job_lock():
    """Mark this process as a long-running TPU job for the duration of the
    context (best-effort, advisory; never raises)."""
    mine = False
    try:
        with open(TPU_JOB_LOCK, "w") as f:
            f.write(str(os.getpid()))
        mine = True
    except OSError:
        pass
    try:
        yield
    finally:
        if mine:
            try:
                with open(TPU_JOB_LOCK) as f:
                    if f.read().strip() == str(os.getpid()):
                        os.remove(TPU_JOB_LOCK)
            except OSError:
                pass


def tpu_job_lock_if_tpu():
    """tpu_job_lock() when jax will run on a real accelerator, else a no-op
    context. CPU-only runs (the test suite, --cpu CLIs) don't contend for the
    device tunnel and must not cause spurious busy-host skips. Decides from
    the JAX_PLATFORMS env var (NOT jax.default_backend(), which would
    initialize the backend before a later maybe_force_cpu() could act) --
    call after maybe_force_cpu() where a --cpu flag is in play."""
    from contextlib import nullcontext

    env = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    return nullcontext() if env == "cpu" else tpu_job_lock()


def host_busy_reason() -> Optional[str]:
    """Why the host should be considered contended right now, or None.
    Checks the TPU-job lock (stale locks from dead pids are ignored) and the
    per-core 1-minute load average."""
    try:
        with open(TPU_JOB_LOCK) as f:
            pid = int(f.read().strip())
        os.kill(pid, 0)  # ProcessLookupError if the owner died
        return f"TPU job lock held by live pid {pid} ({TPU_JOB_LOCK})"
    except (OSError, ValueError):
        pass
    try:
        per_core = os.getloadavg()[0] / (os.cpu_count() or 1)
        if per_core >= 1.75:
            return f"1-min loadavg {per_core:.2f}/core >= 1.75"
    except OSError:
        pass
    return None


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
