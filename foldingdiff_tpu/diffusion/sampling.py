"""
Reverse-diffusion (DDPM ancestral) sampling, compiled to a single lax.scan.

Reference behavior: foldingdiff/sampling.py:27-224.
- p_sample (DDPM Eq. 11): mean = 1/sqrt(a_t) (x - b_t * eps_pred / sqrt(1-abar_t)),
  plus sqrt(posterior_variance_t) noise for t > 0 (sampling.py:60-75)
- per-feature angular wrap after EVERY step (sampling.py:118-130)
- x_T ~ wrapped N(0, scale) from the dataset noiser (sampling.py:182-188)
- mean-offset un-shift + re-wrap at the end (sampling.py:208-223)

The reference runs a python loop with a host sync + CPU copy per timestep
(sampling.py:131); here the T-step loop is one lax.scan inside jit -- zero
host round-trips -- and the batch axis can be sharded over a device mesh
(see parallel/mesh.py). Full-history mode returns the scan's stacked ys.
"""
from __future__ import annotations

import logging
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from foldingdiff_tpu.diffusion.noise import sample_wrapped_noise
from foldingdiff_tpu.diffusion.schedules import DiffusionSchedule
from foldingdiff_tpu.ops.angles import wrap_angles
from foldingdiff_tpu.utils import modulo_with_wrapped_range


def p_sample_step(
    model_fn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    key: jax.Array,
    attn_mask: jnp.ndarray,
    schedule: DiffusionSchedule,
    is_angular: jnp.ndarray,
    noise_scale=1.0,
) -> jnp.ndarray:
    """
    One reverse step at (scalar) timestep t. model_fn(x, t_vec, mask) -> eps.
    Adds posterior noise only when t > 0, then wraps angular channels.

    noise_scale: scalar or (F,)-vector sampling temperature on the posterior
    noise (1.0 = reference-parity DDPM, sampling.py:69-75). Per-feature
    values calibrate marginal dispersion: the 24k study measured the narrow
    bond-angle marginals ~15% under-dispersed vs the data at scale 1.0
    (analysis/synthetic_24k/), so a mild >1 temperature on those features
    matches the data variance without touching the trained model.
    """
    b = x.shape[0]
    t_vec = jnp.full((b,), t, dtype=jnp.int32)
    eps_pred = model_fn(x, t_vec, attn_mask)

    sqrt_recip_alpha_t = schedule.sqrt_recip_alphas[t]
    beta_t = schedule.betas[t]
    sqrt_omac_t = schedule.sqrt_one_minus_alphas_cumprod[t]
    model_mean = sqrt_recip_alpha_t * (x - beta_t * eps_pred / sqrt_omac_t)

    noise = jax.random.normal(key, x.shape, dtype=x.dtype)
    sigma_t = schedule.sqrt_posterior_variance[t]
    x_next = model_mean + jnp.where(t > 0, sigma_t, 0.0) * (
        jnp.asarray(noise_scale, dtype=x.dtype) * noise
    )

    is_angular = jnp.asarray(is_angular, dtype=bool)
    return jnp.where(is_angular, wrap_angles(x_next), x_next)


def p_sample_loop(
    model_fn,
    noise: jnp.ndarray,
    key: jax.Array,
    attn_mask: jnp.ndarray,
    schedule: DiffusionSchedule,
    is_angular,
    return_history: bool = False,
    start_t: Optional[int] = None,
    unroll: int = 1,
    noise_scale=1.0,
) -> jnp.ndarray:
    """
    Reverse chain (start_t or T)-1 .. 0 as one scan. unroll > 1 pipelines
    consecutive steps (~10% faster at unroll=4 on v5e) at the cost of
    proportionally longer compiles -- off by default because compiles through
    a remote-compile service dominate. Returns final x
    (B, L, F), or the full (start_t, B, L, F) trajectory when return_history
    (reference keeps history always; we make it opt-in to avoid the T-times
    memory). start_t < T runs a partial reverse chain (used by
    partial-noise reconstruction, reference sampling.py:319-330).
    """
    timesteps = start_t if start_t is not None else schedule.timesteps
    is_angular = jnp.asarray(np.asarray(is_angular, dtype=bool))
    keys = jax.random.split(key, timesteps)

    def step(x, scan_in):
        t, k = scan_in
        x_next = p_sample_step(
            model_fn, x, t, k, attn_mask, schedule, is_angular, noise_scale
        )
        return x_next, (x_next if return_history else None)

    ts = jnp.arange(timesteps - 1, -1, -1)
    x_final, hist = jax.lax.scan(step, noise, (ts, keys), unroll=unroll)
    return hist if return_history else x_final


def build_sampler(
    model,
    params,
    constants,
    schedule: DiffusionSchedule,
    is_angular,
    return_history: bool = False,
    start_t: Optional[int] = None,
    method: str = "ddpm",
    ddim_steps: int = 50,
    ddim_eta: float = 0.0,
    gen_noise: bool = False,
    n_ft: Optional[int] = None,
    angular_variance: float = 1.0,
    nonangular_variance: float = 1.0,
    unroll: int = 1,
    params_as_arg: bool = False,
    noise_scale=1.0,
    noise_scale_as_arg: bool = False,
):
    """
    jit-compiled sampler closure. Weights are closed over; one compilation per
    (batch, length) shape. method: "ddpm" (ancestral, reference-parity),
    "ddim" (accelerated, ddim_steps model evals), or "dpmpp"
    (DPM-Solver++(2M), ddim_steps sets its step budget too).

    params_as_arg=True prepends `params` to the returned signature so one
    compiled sampler serves MANY weight sets of the same shape (checkpoint
    sweeps, SWA-vs-final comparisons): closed-over weights are baked into the
    jaxpr as constants, so swapping checkpoints with params_as_arg=False pays
    a fresh trace+compile per checkpoint (minutes each through the remote
    compile tunnel). Use `functools.partial(sampler, params)` to feed the
    result into sample(sampler=...).

    noise_scale_as_arg=True likewise turns the DDPM sampling temperature into
    a runtime argument, inserted AFTER params (when params_as_arg) and before
    the rest: calibration sweeps try many per-feature noise_scale vectors on
    one compiled T-step scan instead of re-tracing per gamma. DDPM only (the
    accelerated samplers take no posterior-noise temperature). All vectors
    must share one shape per compilation -- pass jnp.ones(n_ft) for the
    uncalibrated rows of a sweep, not the scalar 1.0.

    gen_noise=False: signature (noise, attn_mask, key) -- caller provides x_T
    (used by partial-noise reconstruction).
    gen_noise=True: signature (attn_mask, seed_lo, seed_hi, chunk_i) with
    uint32 scalars (the two halves of a 64-bit seed) -- the PRNG keys AND x_T
    are derived INSIDE jit, so a sample() chunk is exactly one device
    execution with zero eager host-side ops (each eager op through a
    remote-dispatch tunnel costs a round-trip; per-chunk fold_in/split/asarray
    used to dominate contended runs).

    NOTE (seed compatibility): since the 64-bit-seed change, the master key is
    fold_in(PRNGKey(seed_lo), seed_hi). For pre-existing 32-bit seeds this
    replaces the previous fold_in(seed, 0) derivation, so seed->sample
    mappings differ from releases before the flagship rerun.
    """
    # Partial chains (start_t, used by partial-noise reconstruction) are a
    # DDPM-ancestral concept here: the accelerated samplers' node grids
    # start at t=T-1, so running them on a q-sampled x_{start_t} input would
    # silently apply the wrong inversion. Fail loudly instead.
    if start_t is not None and method != "ddpm":
        raise ValueError(f"start_t is only supported with method='ddpm', got {method!r}")
    if noise_scale_as_arg and method != "ddpm":
        raise ValueError(
            f"noise_scale_as_arg is only supported with method='ddpm', got {method!r}"
        )

    def run_loop(p, ns, noise, attn_mask, key):
        def model_fn(x, t_vec, mask):
            return model.apply(
                {"params": p, "constants": constants}, x, t_vec, mask, deterministic=True
            )

        if method == "ddim":
            return ddim_sample_loop(
                model_fn, noise, key, attn_mask, schedule, is_angular,
                n_steps=ddim_steps, eta=ddim_eta, return_history=return_history,
            )
        if method == "dpmpp":
            return dpmpp_sample_loop(
                model_fn, noise, key, attn_mask, schedule, is_angular,
                n_steps=ddim_steps, return_history=return_history,
            )
        return p_sample_loop(
            model_fn, noise, key, attn_mask, schedule, is_angular, return_history,
            start_t=start_t, unroll=unroll, noise_scale=ns,
        )

    def _bind(core):
        # core(p, ns, *rest) -> jit-compiled fn with p/ns either runtime args
        # (prepended in that order) or baked-in constants
        if params_as_arg and noise_scale_as_arg:
            return jax.jit(core)
        if params_as_arg:
            return jax.jit(lambda p, *rest: core(p, noise_scale, *rest))
        if noise_scale_as_arg:
            return jax.jit(lambda ns, *rest: core(params, ns, *rest))
        return jax.jit(lambda *rest: core(params, noise_scale, *rest))

    if not gen_noise:
        return _bind(run_loop)

    assert n_ft is not None

    def _sampler(p, ns, attn_mask, seed_lo, seed_hi, chunk_i):
        # Same derivation sample() used to do eagerly: build the master key
        # from the seed (split into two uint32 words so 64-bit seeds keep
        # distinct streams instead of silently colliding mod 2**32), fold the
        # chunk index in, then split into (noise, loop) keys
        key = jax.random.fold_in(jax.random.PRNGKey(seed_lo), seed_hi)
        key = jax.random.fold_in(key, chunk_i)
        noise_key, loop_key = jax.random.split(key)
        b, l = attn_mask.shape
        noise = sample_wrapped_noise(
            noise_key, (b, l, n_ft), is_angular, angular_variance, nonangular_variance
        )
        return run_loop(p, ns, noise, attn_mask, loop_key)

    return _bind(_sampler)


def ddim_sample_loop(
    model_fn,
    noise: jnp.ndarray,
    key: jax.Array,
    attn_mask: jnp.ndarray,
    schedule: DiffusionSchedule,
    is_angular,
    n_steps: int = 50,
    eta: float = 0.0,
    return_history: bool = False,
    clip_x0: bool = True,
) -> jnp.ndarray:
    """
    DDIM sampling (Song et al. 2021) over a strided timestep subsequence --
    an accelerated sampler the reference lacks: eta=0 is deterministic with
    10-20x fewer model evaluations than DDPM-T.

    clip_x0 clamps the x0 prediction of angular channels to [-pi, pi] before
    the jump to t_prev. This is essential for wrapped-angle diffusion: the
    per-step wrap makes x_t only piecewise-linear in x0, and at high t the
    1/sqrt(alphabar_t) inversion amplifies any wrap displacement ~300x --
    without the clamp, DDIM-50 on the flagship model produces unstructured
    chains (KS stat 0.83 vs test split, zero helices) while with it the
    samples match DDPM quality. DDPM ancestral sampling never hits this
    because its per-step coefficients are ~1.
    """
    T = schedule.timesteps
    is_angular = jnp.asarray(np.asarray(is_angular, dtype=bool))
    ts = np.linspace(0, T - 1, num=n_steps, dtype=np.int64)[::-1].copy()
    ts_prev = np.concatenate([ts[1:], [-1]])
    abar = jnp.concatenate([schedule.alphas_cumprod, jnp.ones(1)])  # abar[-1] -> 1
    keys = jax.random.split(key, n_steps)

    def step(x, scan_in):
        t, t_prev, k = scan_in
        b = x.shape[0]
        eps = model_fn(x, jnp.full((b,), t, dtype=jnp.int32), attn_mask)
        a_t = abar[t]
        a_prev = abar[t_prev]  # t_prev = -1 indexes the appended 1.0
        x0_pred = (x - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
        if clip_x0:
            x0_pred = jnp.where(
                is_angular, jnp.clip(x0_pred, -jnp.pi, jnp.pi), x0_pred
            )
        sigma = (
            eta
            * jnp.sqrt((1.0 - a_prev) / (1.0 - a_t))
            * jnp.sqrt(jnp.maximum(1.0 - a_t / a_prev, 0.0))
        )
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma**2, 0.0)) * eps
        x_next = jnp.sqrt(a_prev) * x0_pred + dir_xt
        if eta > 0:
            x_next = x_next + sigma * jax.random.normal(k, x.shape, dtype=x.dtype)
        x_next = jnp.where(is_angular, wrap_angles(x_next), x_next)
        return x_next, (x_next if return_history else None)

    x_final, hist = jax.lax.scan(
        step, noise, (jnp.asarray(ts), jnp.asarray(ts_prev), keys)
    )
    return hist if return_history else x_final


def dpmpp_sample_loop(
    model_fn,
    noise: jnp.ndarray,
    key: jax.Array,
    attn_mask: jnp.ndarray,
    schedule: DiffusionSchedule,
    is_angular,
    n_steps: int = 20,
    return_history: bool = False,
    clip_x0: bool = True,
    t_spacing: str = "lambda",
) -> jnp.ndarray:
    """
    DPM-Solver++(2M) (Lu et al. 2022), x0-parameterization, adapted to
    wrapped angles -- a second-order multistep ODE sampler the reference
    lacks: ~10 steps match DDIM-50 quality (one model eval per step, so
    2-5x fewer than DDIM at equal quality, 50-100x fewer than DDPM-T).

    t_spacing="lambda" (default) places the nodes uniformly in half-logSNR,
    the spacing the solver's local error analysis assumes; on a cosine
    schedule it is ~10-30x more accurate at 10-20 steps than the DDIM-style
    uniform-in-t grid ("time"), measured against the closed-form ODE
    solution for Gaussian data (see tests). Rounding the lambda grid onto
    the discrete schedule resolves collisions to neighboring timesteps, so
    the chain always runs EXACTLY n_steps model evals.

    Half-log-SNR lambda_t = log(alpha_t/sigma_t) with alpha=sqrt(abar),
    sigma=sqrt(1-abar). Update i over nodes t_{i-1} -> t_i:
        x0_i = (x - sigma_{i-1} * eps(x, t_{i-1})) / alpha_{i-1}
        D_i  = x0_i + (1/(2 r_i)) * (x0_i - x0_{i-1}),  r_i = h_{i-1}/h_i
        x   <- (sigma_i/sigma_{i-1}) * x + alpha_i * (1 - e^{-h_i}) * D_i
    with first-order D (= x0_i) on the first step (no history) and the
    final step to abar=1 (the standard lower_order_final stabilizer; it
    also keeps every coefficient finite as sigma -> 0).

    Wrapped-angle adaptations, both essential for the same reason as the
    DDIM clamp (see ddim_sample_loop): x0 predictions of angular channels
    are clamped to [-pi, pi], and the 2M correction uses the GEODESIC
    difference wrap(x0_i - x0_{i-1}) so a pair of predictions straddling
    the +-pi seam extrapolates along the short arc, not across 2pi.

    All per-step coefficients are precomputed host-side in float64 and fed
    through the scan -- data-independent scalars, so the compiled step is
    exactly one model eval plus fused elementwise math. Deterministic:
    `key` is unused (kept for signature parity with the other loops).
    """
    del key  # ODE sampler: no stochastic term
    T = schedule.timesteps
    assert 1 <= n_steps <= T, f"n_steps must be in [1, {T}], got {n_steps}"
    assert t_spacing in ("lambda", "time"), t_spacing
    is_angular = jnp.asarray(np.asarray(is_angular, dtype=bool))
    abar = np.asarray(schedule.alphas_cumprod, dtype=np.float64)
    # Source timesteps (node M is the clean state abar=1, the DDIM t_prev=-1
    # convention): uniform in lambda (solver-natural) or uniform in t
    # (matches ddim_sample_loop's grid, for like-for-like comparisons)
    if t_spacing == "lambda":
        lam_all = 0.5 * (np.log(abar) - np.log1p(-abar))
        targets = np.linspace(lam_all[T - 1], lam_all[0], num=n_steps)
        # Nearest discrete timestep per lambda target, with collisions
        # resolved to the next free node so the result is EXACTLY n_steps
        # strictly-decreasing timesteps (plain rounding+unique silently
        # dropped 10-35% of the requested evals at T=1000, misstating the
        # compute budget): each mapped t is clamped below the previous node
        # and above the count still needed after it.
        nodes = []
        prev = T
        for k, lt in enumerate(targets):
            t = int(np.argmin(np.abs(lam_all - lt)))
            t = min(t, prev - 1)
            t = max(t, n_steps - k - 1)
            nodes.append(t)
            prev = t
        ts = np.asarray(nodes, dtype=np.int64)
    else:
        ts = np.linspace(0, T - 1, num=n_steps, dtype=np.int64)[::-1].copy()
    a_nodes = np.concatenate([abar[ts], [1.0]])  # abar at nodes 0..M
    alpha = np.sqrt(a_nodes)
    sigma = np.sqrt(1.0 - a_nodes)
    # lambda at non-final nodes only (sigma_M = 0 -> lambda_M = +inf; the
    # final step's coefficients are set by the analytic limit instead)
    lam = 0.5 * (np.log(a_nodes[:-1]) - np.log1p(-a_nodes[:-1]))
    h = np.diff(lam)  # h_i for updates 1..M-1 (update M's h is +inf)

    c_x = np.empty(n_steps)
    c_D = np.empty(n_steps)
    c_corr = np.zeros(n_steps)
    c_x[:-1] = sigma[1:-1] / sigma[:-2]
    c_D[:-1] = alpha[1:-1] * -np.expm1(-h)
    if n_steps >= 3:
        # 1/(2 r_i) with r_i = h_{i-1}/h_i, i.e. h_i/(2 h_{i-1}); first step
        # has no history and the final step is first-order
        # (lower_order_final), so corrections apply to updates 1..M-2
        c_corr[1:-1] = h[1:] / (2.0 * h[:-1])
    # Final step to abar=1: e^{-h}=0, sigma_M=0
    c_x[-1] = 0.0
    c_D[-1] = 1.0

    coefs = (
        jnp.asarray(ts),
        jnp.asarray(c_x, dtype=noise.dtype),
        jnp.asarray(c_D, dtype=noise.dtype),
        jnp.asarray(c_corr, dtype=noise.dtype),
        jnp.asarray(sigma[:-1], dtype=noise.dtype),
        jnp.asarray(1.0 / alpha[:-1], dtype=noise.dtype),
    )

    def step(carry, scan_in):
        x, x0_prev = carry
        t, cx, cd, ccorr, sig_src, recip_alpha_src = scan_in
        b = x.shape[0]
        eps = model_fn(x, jnp.full((b,), t, dtype=jnp.int32), attn_mask)
        x0 = (x - sig_src * eps) * recip_alpha_src
        if clip_x0:
            x0 = jnp.where(is_angular, jnp.clip(x0, -jnp.pi, jnp.pi), x0)
        delta = x0 - x0_prev
        delta = jnp.where(is_angular, wrap_angles(delta), delta)
        d = x0 + ccorr * delta
        x_next = cx * x + cd * d
        x_next = jnp.where(is_angular, wrap_angles(x_next), x_next)
        return (x_next, x0), (x_next if return_history else None)

    (x_final, _), hist = jax.lax.scan(step, (noise, jnp.zeros_like(noise)), coefs)
    return hist if return_history else x_final


def sample_simple(
    model_dir: str,
    n: int = 10,
    sweep_lengths: Tuple[int, int] = (50, 128),
    seed: int = 0x1234,
):
    """
    Load a model directory or HF-hub id and sample, returning per-structure
    DataFrames (reference sampling.sample_simple, sampling.py:227-264; seeded
    like bin/sample.py:34-37 so same-seed runs are bit-reproducible --
    reference tests/test_sampling.py).
    """
    import pandas as pd

    from foldingdiff_tpu.data.datasets import AnglesEmptyDataset
    from foldingdiff_tpu.models import io as model_io

    # Resolve hub ids ONCE so the empty dataset below reads from the same
    # local snapshot the model loads from (bin/sample.py does the same)
    model_dir = model_io.resolve_model_dir(model_dir)
    model, params, constants, train_args = model_io.from_dir(model_dir)
    schedule = DiffusionSchedule.create(
        train_args["variance_schedule"], train_args["timesteps"]
    )
    empty = AnglesEmptyDataset.from_dir(model_dir)
    try:
        mean_offset = empty.get_masked_means()
    except NotImplementedError:
        mean_offset = None
    # cart-coords models store features under "coords"; all others "angles"
    ft_key = next(iter(empty.feature_names))
    sampled = sample(
        model, params, constants, schedule,
        is_angular=empty.feature_is_angular[ft_key],
        pad=empty.pad,
        n=n,
        sweep_lengths=sweep_lengths,
        angular_variance=train_args.get("variance_scale", 1.0),
        mean_offset=mean_offset,
        seed=seed,
    )
    cols = list(empty.feature_names[ft_key])
    return [pd.DataFrame(s, columns=cols) for s in sampled]


def get_reconstruction_error(
    model,
    params,
    constants,
    schedule: DiffusionSchedule,
    data: dict,
    *,
    is_angular: Sequence[bool],
    noise_timesteps: int = 250,
    batch_size: int = 512,
    seed: int = 0,
    mean_offset: Optional[np.ndarray] = None,
    shard_fn=None,
) -> List[np.ndarray]:
    """
    Partial-noise reconstruction (reference sampling.get_reconstruction_error,
    sampling.py:287-356): q-sample each test item to t=noise_timesteps, run
    the reverse chain from there, return the reconstructed angle sets trimmed
    to their lengths. TM scoring against the truth is the caller's business
    (bin/partial_noise_reconstruct.py).

    data: {"angles": (N, L, F), "attn_mask": (N, L), "lengths": (N,)}.
    """
    from foldingdiff_tpu.diffusion.noise import q_sample

    assert noise_timesteps <= schedule.timesteps
    is_angular_arr = np.asarray(is_angular, dtype=bool)
    sampler = build_sampler(
        model, params, constants, schedule, is_angular_arr, start_t=noise_timesteps
    )
    key = jax.random.PRNGKey(seed)
    n = data["angles"].shape[0]
    out: List[np.ndarray] = []
    for start in range(0, n, batch_size):
        x0 = jnp.asarray(data["angles"][start : start + batch_size])
        mask = jnp.asarray(data["attn_mask"][start : start + batch_size])
        lengths = data["lengths"][start : start + batch_size]
        key, nk, lk = jax.random.split(key, 3)
        b = x0.shape[0]
        t = jnp.full((b,), noise_timesteps - 1, dtype=jnp.int32)
        eps = sample_wrapped_noise(nk, x0.shape, is_angular_arr)
        corrupted = q_sample(x0, t, eps, schedule, is_angular_arr)
        if shard_fn is not None:
            corrupted, mask = shard_fn(corrupted, mask)
        recon = np.asarray(jax.device_get(sampler(corrupted, mask, lk)))
        if mean_offset is not None:
            recon = recon + np.asarray(mean_offset)
            ang_idx = np.where(is_angular_arr)[0]
            recon[..., ang_idx] = modulo_with_wrapped_range(recon[..., ang_idx], -np.pi, np.pi)
        out.extend(recon[i, : int(l)] for i, l in enumerate(lengths))
    return out


def sample(
    model,
    params,
    constants,
    schedule: DiffusionSchedule,
    *,
    is_angular: Sequence[bool],
    pad: int,
    n: int = 10,
    sweep_lengths: Optional[Tuple[int, int]] = (50, 128),
    lengths: Optional[Sequence[int]] = None,
    batch_size: int = 512,
    angular_variance: float = 1.0,
    nonangular_variance: float = 1.0,
    mean_offset: Optional[np.ndarray] = None,
    seed: int = 0x1234,
    trim_to_length: bool = True,
    bucket_multiple: int = 64,
    return_history: bool = False,
    method: str = "ddpm",
    ddim_steps: int = 50,
    ddim_eta: float = 0.0,
    noise_scale=1.0,
    shard_fn=None,
    sampler=None,
) -> List[np.ndarray]:
    """
    Batched sampling with a length sweep (reference sampling.sample,
    sampling.py:135-224). Returns a list of (length, F) arrays -- or
    (T, length, F) with return_history -- one per requested structure, with
    the training mean offset re-applied and angular features re-wrapped.

    `shard_fn` optionally places each batch onto a device mesh (data-parallel
    sampling); see parallel/mesh.py:shard_batch.
    """
    if lengths is None:
        assert sweep_lengths is not None
        sweep_min, sweep_max = sweep_lengths
        if not sweep_min < sweep_max:
            raise ValueError(f"Min length {sweep_min} must be < max {sweep_max}")
        lengths = [l for l in range(sweep_min, sweep_max) for _ in range(n)]
    lengths = list(lengths)
    logging.info(f"Sampling {len(lengths)} items in batches of {batch_size}")

    is_angular_arr = np.asarray(is_angular, dtype=bool)
    n_ft = len(is_angular_arr)
    # Reuse a prebuilt jitted sampler when given: each build_sampler call is a
    # fresh jit cache, so repeated sample() calls would recompile every shape
    if sampler is None:
        sampler = build_sampler(
            model, params, constants, schedule, is_angular_arr, return_history,
            method=method, ddim_steps=ddim_steps, ddim_eta=ddim_eta,
            gen_noise=True, n_ft=n_ft,
            angular_variance=angular_variance, nonangular_variance=nonangular_variance,
            noise_scale=noise_scale,
        )

    # Bucket-aware chunking: group lengths by their padded seq bucket before
    # chunking so short-length chunks compile and run at the small bucket
    # instead of being dragged to the next one by a single longer item
    def bucket_of(length: int) -> int:
        return min(pad, -(-length // bucket_multiple) * bucket_multiple) if trim_to_length else pad

    groups: dict = {}
    for i in range(len(lengths)):
        groups.setdefault(bucket_of(lengths[i]), []).append(i)
    # Chunk within each bucket group: at most one ragged tail per bucket, so
    # the number of compiled shapes stays <= 2 per bucket
    split_chunks: List[List[int]] = [
        g[i : i + batch_size]
        for _, g in sorted(groups.items())
        for i in range(0, len(g), batch_size)
    ]
    # Dispatch ALL chunks asynchronously, then fetch: each synchronous
    # dispatch+fetch cycle pays the device round-trip latency (seconds through
    # a remote-dispatch tunnel); pipelining pays it once
    pending = []
    for chunk_i, idx_chunk in enumerate(split_chunks):
        this_lengths = [lengths[i] for i in idx_chunk]
        seq_len = max(this_lengths) if trim_to_length else pad
        # Bucket to multiples of bucket_multiple: coarse buckets mean few
        # compilations per sweep (compile >> padded-compute waste here)
        seq_len = (
            min(pad, -(-seq_len // bucket_multiple) * bucket_multiple)
            if trim_to_length
            else pad
        )

        attn_mask = (np.arange(seq_len)[None, :] < np.asarray(this_lengths)[:, None]).astype(
            np.float32
        )
        if shard_fn is not None:
            attn_mask = shard_fn(attn_mask)
        # PRNG key derivation happens inside the jitted sampler: the only
        # per-chunk host work is building the numpy mask + one jit dispatch
        pending.append((
            idx_chunk,
            this_lengths,
            sampler(attn_mask, np.uint32(seed & 0xFFFFFFFF),
                    np.uint32((seed >> 32) & 0xFFFFFFFF), np.uint32(chunk_i)),
        ))

    results: dict = {}
    for idx_chunk, this_lengths, device_out in pending:
        sampled = np.asarray(jax.device_get(device_out))
        for i, (orig_idx, l) in enumerate(zip(idx_chunk, this_lengths)):
            results[orig_idx] = (
                sampled[:, i, :l, :] if return_history else sampled[i, :l, :]
            )
    retval: List[np.ndarray] = [results[i] for i in range(len(lengths))]

    if mean_offset is not None:
        mean_offset = np.asarray(mean_offset)
        logging.info(f"Shifting predicted values by original offset: {mean_offset}")
        angular_idx = np.where(is_angular_arr)[0]
        shifted = []
        for s in retval:
            s = s + mean_offset
            s[..., angular_idx] = modulo_with_wrapped_range(
                s[..., angular_idx], -np.pi, np.pi
            )
            shifted.append(s)
        retval = shifted
    return retval
