"""
Measure per-scan device time of the T=1000 sampling scan across
(chunk_size, seq_bucket) shapes, to pick the chunking policy for the
780-structure sweep (bench.py / diffusion/sampling.py chunking).

Usage: python scripts/microbench_chunks.py "64,128" "22,128" ...
(defaults to every shape the default bench sweep executes -- all of which
are already in .jax_cache after a bench run, so measuring them costs no
remote compiles).

Prints one line per shape: B, L, total_s for the full scan, per-item ms.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from foldingdiff_tpu.diffusion import sampling as samp
from foldingdiff_tpu.diffusion.schedules import DiffusionSchedule
from foldingdiff_tpu.models import io as model_io
from foldingdiff_tpu.models.bert import BertForDiffusion
from foldingdiff_tpu.models.config import ModelConfig

T = int(os.environ.get("MB_TIMESTEPS", "1000"))
UNROLL = int(os.environ.get("MB_UNROLL", "4"))

DEFAULT_SHAPES = [
    (64, 64), (22, 64),
    (64, 80), (32, 80),
    (64, 96), (32, 96),
    (64, 112), (32, 112),
    (64, 128), (22, 128),
]


def main():
    shapes = (
        [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]]
        if len(sys.argv) > 1
        else DEFAULT_SHAPES
    )
    config = ModelConfig(
        hidden_size=384,
        num_hidden_layers=12,
        num_attention_heads=12,
        intermediate_size=768,
        max_position_embeddings=128,
        position_embedding_type="relative_key",
    )
    model = BertForDiffusion(config)
    variables = model_io.init_model_variables(model, jax.random.PRNGKey(0), pad=128)
    schedule = DiffusionSchedule.create("cosine", T)
    sampler = samp.build_sampler(
        model, variables["params"], variables["constants"], schedule, [True] * 6,
        gen_noise=True, n_ft=6, unroll=UNROLL,
    )
    print(f"T={T} unroll={UNROLL} platform={jax.devices()[0].platform}", flush=True)
    for b, l in shapes:
        mask = np.ones((b, l), dtype=np.float32)
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(sampler(mask, np.uint32(1), np.uint32(0), np.uint32(i)))
            times.append(time.perf_counter() - t0)
        total = min(times)
        print(
            f"B={b:4d} L={l:4d}: scan {total:7.3f} s"
            f"  step {total / T * 1e3:6.3f} ms"
            f"  per-item {total / b * 1e3:7.1f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
