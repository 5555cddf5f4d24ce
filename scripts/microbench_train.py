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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=8)
    parser.add_argument("--fused", type=int, nargs="+", default=[1, 8])
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--n-items", type=int, default=1600,
                        help="training items per epoch (25 steps at B=64)")
    args = parser.parse_args()

    import jax

    from foldingdiff_tpu.diffusion.schedules import DiffusionSchedule
    from foldingdiff_tpu.models.bert import BertForDiffusion
    from foldingdiff_tpu.models.config import ModelConfig
    from foldingdiff_tpu.training.trainer import Trainer, TrainConfig

    config = ModelConfig(
        hidden_size=384,
        num_hidden_layers=12,
        num_attention_heads=12,
        intermediate_size=768,
        max_position_embeddings=128,
        position_embedding_type="relative_key",
    )
    schedule = DiffusionSchedule.create("cosine", 1000)
    rng = np.random.default_rng(0)
    n, l = args.n_items, 128
    data = {
        "angles": rng.uniform(-np.pi, np.pi, (n, l, 6)).astype(np.float32),
        "attn_mask": np.ones((n, l), np.float32),
        "lengths": np.full((n,), l, np.int64),
    }
    steps_per_epoch = n // args.batch

    for fused in args.fused:
        tcfg = TrainConfig(
            lr=1e-4, batch_size=args.batch, max_epochs=args.epochs,
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
        print(
            f"fused_steps={fused}: {steps_per_epoch / med:.1f} steps/s "
            f"({steps_per_epoch * args.batch / med:.0f} samples/s), "
            f"median epoch {med:.2f}s, first(compile) {rows[0]['epoch_seconds']:.1f}s, "
            f"total {total:.1f}s"
        )


if __name__ == "__main__":
    main()
