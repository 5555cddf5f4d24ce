#!/usr/bin/env python
"""
Capture + summarize an XProf trace of the flagship TRAIN step (the sampler
twin of this analysis lives in docs/performance.md "Where the step time
goes"). Runs ~N jitted steps under jax.profiler.trace, then parses the
.xplane.pb directly (tensorflow's xplane proto) and prints the top device
ops by total self-time, bucketed by fusion kind.

Usage: python scripts/xprof_train_step.py [--steps 12] [--batch 64]
"""
import argparse
import glob
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def summarize_xplane(trace_dir: str, top_k: int = 25):
    from tensorflow.core.profiler.protobuf import xplane_pb2  # type: ignore

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    totals = defaultdict(float)  # event name -> total us
    device_total = 0.0
    for path in paths:
        xspace = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xspace.ParseFromString(f.read())
        for plane in xspace.planes:
            # device planes: "/device:TPU:0" / TensorCore; skip host threads
            name = plane.name.lower()
            if "tpu" not in name and "device" not in name:
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                lname = line.name.lower()
                # XLA op lines carry per-op self time; step/module lines
                # would double-count
                if "xla op" not in lname and "xla ops" not in lname:
                    continue
                for ev in line.events:
                    dur = ev.duration_ps / 1e6  # ps -> us
                    totals[ev_meta.get(ev.metadata_id, "?")] += dur
                    device_total += dur
    ranked = sorted(totals.items(), key=lambda kv: -kv[1])
    print(f"device op time total: {device_total / 1e3:.2f} ms across {len(totals)} ops")
    print(f"{'us':>10}  {'%':>5}  op")
    for name, us in ranked[:top_k]:
        print(f"{us:10.0f}  {100 * us / max(device_total, 1e-9):5.1f}  {name[:110]}")
    # bucket by op family
    buckets = defaultdict(float)
    for name, us in totals.items():
        low = name.lower()
        if "fusion" in low:
            buckets["fusion (elementwise/reduce/HBM-bound)"] += us
        elif "convolution" in low or "dot" in low or "einsum" in low:
            buckets["matmul/conv (MXU)"] += us
        elif "copy" in low or "transpose" in low or "reshape" in low or "bitcast" in low:
            buckets["layout/copy"] += us
        elif "all-reduce" in low or "collective" in low:
            buckets["collectives"] += us
        else:
            buckets["other"] += us
    print("\nby family:")
    for k, us in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {k}: {us / 1e3:.2f} ms ({100 * us / max(device_total, 1e-9):.1f}%)")
    return device_total, ranked


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=12)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--out", default="/tmp/xprof_train_step")
    parser.add_argument("--summarize-only", default=None,
                        help="skip capture; summarize an existing trace dir")
    args = parser.parse_args()

    if args.summarize_only:
        summarize_xplane(args.summarize_only)
        return

    import jax

    from foldingdiff_tpu.diffusion.schedules import DiffusionSchedule
    from foldingdiff_tpu.models.bert import BertForDiffusion
    from foldingdiff_tpu.models.config import ModelConfig
    from foldingdiff_tpu.training.trainer import Trainer, TrainConfig

    config = ModelConfig(
        hidden_size=384, num_hidden_layers=12, num_attention_heads=12,
        intermediate_size=768, max_position_embeddings=128,
        position_embedding_type="relative_key",
    )
    schedule = DiffusionSchedule.create("cosine", 1000)
    tcfg = TrainConfig(lr=1e-4, batch_size=args.batch, max_epochs=1,
                       lr_scheduler=None, seed=0)
    trainer = Trainer(BertForDiffusion(config), schedule, tcfg, steps_per_epoch=1)
    state = trainer.init_state(jax.random.PRNGKey(0), pad=128)
    rng = np.random.default_rng(0)
    b, l = args.batch, 128
    batch = {
        "angles": rng.uniform(-np.pi, np.pi, (b, l, 6)).astype(np.float32),
        "attn_mask": np.ones((b, l), np.float32),
        "lengths": np.full((b,), l, np.int64),
    }
    key = jax.random.PRNGKey(1)
    # compile + warm outside the trace
    for _ in range(3):
        key, sk = jax.random.split(key)
        state, avg, _ = trainer._train_step(state, batch, sk)
    jax.block_until_ready(avg)

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            key, sk = jax.random.split(key)
            state, avg, _ = trainer._train_step(state, batch, sk)
        jax.block_until_ready(avg)
    print(f"trace written to {args.out}")
    total_us, _ = summarize_xplane(args.out)
    print(f"\nper-step device time: {total_us / args.steps / 1e3:.2f} ms "
          f"over {args.steps} steps (B={args.batch})")


if __name__ == "__main__":
    main()
