#!/usr/bin/env python
"""
Training-step throughput A/B: fused_steps=1 vs K on the flagship config
(12x384 relative_key, B=64, L=128, on-device q-sample + fwd + bwd + adamw).

The per-step host dispatch is the suspected bottleneck on a 1-core host
driving a remote-dispatch TPU (device step ~15-20 ms, measured epoch rate
22-25 steps/s => ~20 ms/step of host overhead). fused_steps=K amortizes the
dispatch over K scanned steps.

Usage: python scripts/microbench_train.py [--epochs 8] [--fused 1 8]
Prints one line per setting: steps/s and epoch seconds (median over epochs,
excluding the first/compile epoch).
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


V5E_BF16_PEAK = 197e12  # TPU v5e per-chip bf16 peak FLOP/s


def train_step_flops(b: int, l: int, h: int, ffn: int, layers: int, rel: bool) -> float:
    """Analytic matmul FLOPs for ONE train step (fwd + bwd ~= 3x fwd)."""
    proj = 8 * b * l * h * h          # QKV + output projections
    ff = 4 * b * l * h * ffn          # two FFN matmuls
    attn = 4 * b * l * l * h          # QK^T + AV
    relk = (2 * b * l * l * h) if rel else 0.0  # q . E_rel gather einsum
    fwd = layers * (proj + ff + attn + relk)
    return 3.0 * fwd


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=8)
    parser.add_argument("--fused", type=int, nargs="+", default=[1, 8])
    parser.add_argument("--batch", type=int, nargs="+", default=[64])
    parser.add_argument("--remat", action="store_true",
                        help="also run a remat=True variant of each setting")
    parser.add_argument("--n-items", type=int, default=1600,
                        help="training items per epoch (25 steps at B=64)")
    args = parser.parse_args()

    import jax

    # Persistent compile cache (same as bench.py): remote compiles of the
    # fused-scan step take minutes; repeat A/Bs should pay once.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from foldingdiff_tpu.diffusion.schedules import DiffusionSchedule
    from foldingdiff_tpu.models.bert import BertForDiffusion
    from foldingdiff_tpu.models.config import ModelConfig
    from foldingdiff_tpu.training.trainer import Trainer, TrainConfig

    schedule = DiffusionSchedule.create("cosine", 1000)
    rng = np.random.default_rng(0)
    n, l = args.n_items, 128
    data = {
        "angles": rng.uniform(-np.pi, np.pi, (n, l, 6)).astype(np.float32),
        "attn_mask": np.ones((n, l), np.float32),
        "lengths": np.full((n,), l, np.int64),
    }

    variants = [(b, f, r) for b in args.batch for f in args.fused
                for r in ([False, True] if args.remat else [False])]
    for batch, fused, remat in variants:
        config = ModelConfig(
            hidden_size=384,
            num_hidden_layers=12,
            num_attention_heads=12,
            intermediate_size=768,
            max_position_embeddings=128,
            position_embedding_type="relative_key",
            remat=remat,
        )
        steps_per_epoch = n // batch
        tcfg = TrainConfig(
            lr=1e-4, batch_size=batch, max_epochs=args.epochs,
            lr_scheduler=None, seed=0, fused_steps=fused,
        )
        trainer = Trainer(BertForDiffusion(config), schedule, tcfg,
                          steps_per_epoch=steps_per_epoch)
        state = trainer.init_state(jax.random.PRNGKey(0), pad=l)
        t0 = time.time()
        state, rows = trainer.fit(state, data)
        total = time.time() - t0
        epoch_s = [r["epoch_seconds"] for r in rows[1:]]  # drop compile epoch
        med = float(np.median(epoch_s))
        step_s = med / steps_per_epoch
        flops = train_step_flops(batch, l, 384, 768, 12, rel=True)
        mfu = flops / step_s / V5E_BF16_PEAK
        print(
            f"batch={batch} fused_steps={fused} remat={remat}: "
            f"{steps_per_epoch / med:.1f} steps/s "
            f"({steps_per_epoch * batch / med:.0f} samples/s, "
            f"{step_s * 1000:.1f} ms/step, "
            f"{flops / step_s / 1e12:.2f} TFLOP/s = {mfu * 100:.1f}% MFU vs "
            f"v5e bf16 peak), median epoch {med:.2f}s, "
            f"first(compile) {rows[0]['epoch_seconds']:.1f}s, total {total:.1f}s"
        )


if __name__ == "__main__":
    main()
