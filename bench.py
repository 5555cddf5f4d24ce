"""
Benchmark: the manuscript sampling protocol -- 10 backbones per length in
[50, 128) = 780 structures, T=1000 DDPM steps -- on the flagship
model config (12x384 BERT, relative_key), matching README.md:84-85 +
bin/sample.py:255-268 of the reference.

Baseline: the reference samples 512 structures in ~7 min on an RTX 2080Ti
(README.md:100-102) = 1.219 backbones/sec. vs_baseline is our backbones/sec
over that rate.

Robustness: the host has ONE cpu core feeding a remote-dispatch TPU tunnel;
concurrent host load has been measured to inflate wall clock 4-8x. The bench
therefore (a) runs BENCH_REPS timed sweeps and reports the best, (b) probes
per-step device time on a single chunk so a contended run is self-evident in
the JSON (sweep wall-clock inconsistent with step_ms * n_steps => host-side
interference, not device regression), and (c) records loadavg.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""
import json
import os
import sys
import time


def _is_resource_error(e: BaseException) -> bool:
    # Uppercase markers only: a lowercase "oom" substring matches ordinary
    # words/paths ("zoomcache", "room") and would silently degrade a real bug
    s = repr(e)
    return any(k in s for k in ("RESOURCE_EXHAUSTED", "Out of memory", "OOM"))


def main():
    # Persistent compilation cache: saves most of the (remote) compile time
    # across bench invocations
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    try:
        from foldingdiff_tpu.utils_platform import tpu_job_lock_if_tpu
    except Exception:
        from contextlib import nullcontext as tpu_job_lock_if_tpu
    try:
        with tpu_job_lock_if_tpu():
            _run_bench()
    except Exception as e:
        # Retry ONLY on memory pressure at a smaller batch; any other failure
        # (shape bug, compile error) must fail the bench loudly, not be masked
        # as a slow-but-green run.
        if not _is_resource_error(e):
            raise
        print(f"bench OOM at default batch ({e!r}); retrying degraded at batch 32",
              file=sys.stderr)
        os.environ["BENCH_BATCH"] = "32"
        _run_bench(degraded=True)


def _run_bench(degraded: bool = False):
    from foldingdiff_tpu.utils_platform import maybe_force_cpu

    maybe_force_cpu()  # honor an inherited JAX_PLATFORMS=cpu (smoke runs)
    import jax

    from foldingdiff_tpu.diffusion import sampling as samp
    from foldingdiff_tpu.diffusion.schedules import DiffusionSchedule
    from foldingdiff_tpu.models import io as model_io
    from foldingdiff_tpu.models.bert import BertForDiffusion
    from foldingdiff_tpu.models.config import ModelConfig

    n_per_length = int(os.environ.get("BENCH_N_PER_LENGTH", "10"))
    timesteps = int(os.environ.get("BENCH_TIMESTEPS", "1000"))
    # Throughput-optimal single-chip batch measured on v5e: per-step time is
    # 6 ms at B=64 vs 34.5 ms at B=256 (sublinear scaling below ~128), so
    # smaller batches win per-item despite more chunks.
    batch_size = int(os.environ.get("BENCH_BATCH", "64"))
    n_reps = int(os.environ.get("BENCH_REPS", "3"))

    config = ModelConfig(
        hidden_size=384,
        num_hidden_layers=12,
        num_attention_heads=12,
        intermediate_size=768,
        max_position_embeddings=128,
        position_embedding_type="relative_key",
        # A/B knob: "auto" (XLA einsums), "pallas" (v1 kernel), "pallas_v2"
        attention_impl=os.environ.get("BENCH_ATTN", "auto"),
    )
    model = BertForDiffusion(config)
    variables = model_io.init_model_variables(model, jax.random.PRNGKey(0), pad=128)
    schedule = DiffusionSchedule.create("cosine", timesteps)

    # Measured on v5e (B=64, T=1000 sweep): bucket 64 -> 15.3/s, 32 -> 17.2/s,
    # 16 -> 18.0/s (finer buckets cut padded compute; below 16 the extra
    # compiled shapes and tail chunks outweigh the ~4% compute saving). The
    # extra shapes' compile cost is one-time via the persistent cache.
    bucket = int(os.environ.get("BENCH_BUCKET", "16"))
    kwargs = dict(
        is_angular=[True] * 6,
        pad=128,
        n=n_per_length,
        sweep_lengths=(50, 128),
        batch_size=batch_size,
        bucket_multiple=bucket,
        seed=1234,
    )

    # Shard the sampling batch across all available devices
    devices = jax.devices()
    shard_fn = None
    if len(devices) > 1:
        from foldingdiff_tpu.parallel.mesh import make_mesh, shard_batch

        mesh = make_mesh(devices)
        shard_fn = lambda *arrs: shard_batch(mesh, *arrs)

    # One jitted sampler reused for warmup and the timed run (each
    # build_sampler is its own jit cache). Warmup pre-compiles every
    # (chunk_size, seq_bucket) shape the timed sweep will hit.
    # scan unroll pipelines consecutive reverse steps (~10% on v5e) at the
    # cost of proportionally longer compiles; worthwhile here because the
    # persistent compile cache amortizes them across bench runs
    unroll = int(os.environ.get("BENCH_UNROLL", "4"))
    # BENCH_METHOD=ddim|dpmpp benchmarks the accelerated samplers
    # (BENCH_STEPS sets their eval budget); the DEFAULT stays the
    # reference-parity DDPM manuscript protocol that vs_baseline refers to
    method = os.environ.get("BENCH_METHOD", "ddpm")
    sampler = samp.build_sampler(
        model, variables["params"], variables["constants"], schedule, [True] * 6,
        gen_noise=True, n_ft=6, unroll=unroll,
        method=method, ddim_steps=int(os.environ.get("BENCH_STEPS", "20")),
    )
    # Mirror sample()'s bucket-aware chunking to enumerate compiled shapes
    lengths = [l for l in range(50, 128) for _ in range(n_per_length)]
    groups = {}
    for l in lengths:
        groups.setdefault(min(128, -(-l // bucket) * bucket), []).append(l)
    chunk_shapes = []  # every (chunk_size, padded_len) the sweep executes
    for bkt, g in sorted(groups.items()):
        chunk_shapes += [(batch_size, bkt)] * (len(g) // batch_size)
        if len(g) % batch_size:
            chunk_shapes.append((len(g) % batch_size, bkt))
    shapes = set(chunk_shapes)
    n_chunks = len(chunk_shapes)
    for chunk_size, bkt in sorted(shapes):
        warm = dict(kwargs)
        warm.pop("n")
        warm.pop("sweep_lengths")
        warm["lengths"] = [bkt - 1] * chunk_size
        samp.sample(model, variables["params"], variables["constants"], schedule,
                    shard_fn=shard_fn, sampler=sampler, **warm)
    # One full unrecorded sweep: the first post-compile sweep intermittently
    # pays a ~13s program-(re)load penalty through the remote runtime; the
    # second is steady-state
    samp.sample(model, variables["params"], variables["constants"], schedule,
                shard_fn=shard_fn, sampler=sampler, **kwargs)

    # Per-step device-time probe on one already-compiled chunk shape: one
    # synchronous execution of the T-step scan, min over 3 tries. This is
    # (nearly) pure device time -- if the sweep wall clock far exceeds
    # step_ms * T * n_chunks, the run was host/tunnel-contended.
    import numpy as np

    # Probe a shape the sweep actually executes (largest bucket, then largest
    # chunk at that bucket) -- probing (batch_size, max_bucket) blindly would
    # compile an unused shape whenever the largest group has < batch_size
    # items (e.g. BENCH_N_PER_LENGTH=1) and report a floor for a chunk shape
    # that never runs.
    probe_shape = max(shapes, key=lambda s: (s[1], s[0]))
    n_probe_chunks = chunk_shapes.count(probe_shape)
    probe_mask = np.ones(probe_shape, dtype=np.float32)
    if shard_fn is not None:
        probe_mask = shard_fn(probe_mask)
    probe_times = []
    for i in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(sampler(probe_mask, np.uint32(1234), np.uint32(0), np.uint32(i)))
        probe_times.append(time.perf_counter() - t0)
    # Accelerated samplers run BENCH_STEPS model evals, not T
    evals_per_chain = (
        timesteps if method == "ddpm" else int(os.environ.get("BENCH_STEPS", "20"))
    )
    step_ms = min(probe_times) / evals_per_chain * 1000.0

    loadavg_start = os.getloadavg()
    rep_times = []
    n_structures = 0
    for _ in range(max(1, n_reps)):
        t0 = time.perf_counter()
        out = samp.sample(model, variables["params"], variables["constants"], schedule,
                          shard_fn=shard_fn, sampler=sampler, **kwargs)
        rep_times.append(time.perf_counter() - t0)
        n_structures = len(out)
    loadavg_end = os.getloadavg()

    elapsed = min(rep_times)
    rate = n_structures / elapsed
    baseline_rate = 512 / (7 * 60)  # RTX 2080Ti reference
    # The published baseline is the DDPM T=1000 protocol; an accelerated
    # sampler (ddim/dpmpp) solves the same sweep with ~50x fewer model evals,
    # so its vs_baseline is a DIFFERENT-protocol multiplier -- flagged in the
    # JSON itself (vs_baseline_protocol) so downstream consumers can't
    # mistake it for a same-protocol speedup.
    print(json.dumps({
        "metric": "sampling_backbones_per_sec",
        "value": round(rate, 3),
        "unit": "backbones/sec/chip",
        "vs_baseline": round(rate / baseline_rate, 2),
        "vs_baseline_protocol": (
            "same (DDPM T=1000)" if method == "ddpm" and timesteps == 1000
            else f"DIFFERENT: bench ran {method}-{evals_per_chain} evals vs "
                 "baseline DDPM-1000"
        ),
        "n_structures": n_structures,
        "timesteps": timesteps,
        "method": method,
        "evals_per_chain": evals_per_chain,
        "batch_size": batch_size,
        "wall_clock_sec": round(elapsed, 2),
        "rep_wall_clock_sec": [round(t, 2) for t in rep_times],
        "step_ms_probe": round(step_ms, 3),
        # Device-time floor for just the probe-bucket chunks; the remaining
        # (smaller-bucket) chunks add less. wall_clock >> this floor means
        # the run was host/tunnel-contended, not a device regression.
        "device_floor_sec": round(step_ms / 1000.0 * evals_per_chain * n_probe_chunks, 1),
        "n_chunks": n_chunks,
        "loadavg_start": round(loadavg_start[0], 2),
        "loadavg_end": round(loadavg_end[0], 2),
        "degraded": degraded,
        "n_devices": len(devices),
        "platform": devices[0].platform,
    }))


if __name__ == "__main__":
    sys.exit(main())
