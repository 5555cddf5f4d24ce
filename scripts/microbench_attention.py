"""
Standalone attention microbenchmark at the flagship sampling shape
(B=64, h=12, L=128, d=32, f32): one attention layer's score+softmax+PV
chain, per-call device time.

Variants:
  xla          scores einsum + rel gather-einsum + bias + softmax + PV
               (exactly models/bert.py's gather path)
  xla_norel    same without the relative_key term
  flash        pallas TPU flash-attention kernel, rel passed as `ab` bias
               (rel still materializes once: einsum write + kernel read)
  flash_norel  flash kernel, no bias
  pallas_v1    ops/pallas_attention.fused_attention (precomputed rel table)
  pallas_v2    ops/pallas_attention.fused_attention_v2 (in-kernel skew)

Profile context (see docs/performance.md): at this shape XLA's attention is
HBM-bound on the materialized (B,h,L,L) f32 tensors -- every hot fusion costs
~31.5 us = ~25 MB at ~800 GB/s. Variants that keep scores in VMEM should win
in proportion to the traffic they avoid.

Usage: python scripts/microbench_attention.py [variant ...]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("MB_B", "64"))
H = int(os.environ.get("MB_H", "12"))
L = int(os.environ.get("MB_L", "128"))
D = int(os.environ.get("MB_D", "32"))
ITERS = int(os.environ.get("MB_ITERS", "100"))
SCALE = 1.0 / np.sqrt(D)


def _rel_scores(q_blhd, table, m):
    """models/bert.py gather path: dist_emb (L, L, d) + einsum."""
    pos = jnp.arange(q_blhd.shape[1])
    distance = pos[:, None] - pos[None, :]
    dist_emb = table[distance + m - 1]
    return jnp.einsum("blhd,lrd->bhlr", q_blhd, dist_emb)


def make_fn(variant: str, table, bias2d):
    m = L

    if variant in ("xla", "xla_norel"):

        def fn(q, k, v):
            # q,k,v (B,H,L,D); bert.py works in (B,L,H,D) -- transpose-free
            # here because einsum specs absorb it
            scores = jnp.einsum("bhld,bhmd->bhlm", q, k)
            if variant == "xla":
                scores = scores + _rel_scores(q.transpose(0, 2, 1, 3), table, m)
            scores = scores * SCALE + bias2d[:, None, None, :]
            probs = jax.nn.softmax(scores, axis=-1)
            return jnp.einsum("bhlm,bhmd->bhld", probs, v)

    elif variant in ("flash", "flash_norel"):
        from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

        def fn(q, k, v):
            ab = None
            if variant == "flash":
                rel = _rel_scores(q.transpose(0, 2, 1, 3), table, m)
                ab = (rel + bias2d[:, None, None, :] / SCALE).astype(q.dtype)
            else:
                ab = jnp.broadcast_to(
                    (bias2d / SCALE)[:, None, None, :], (B, H, L, L)
                ).astype(q.dtype)
            return flash_attention(q, k, v, ab=ab, sm_scale=SCALE)

    elif variant == "pallas_v1":
        from foldingdiff_tpu.ops.pallas_attention import fused_attention

        def fn(q, k, v):
            pos = jnp.arange(L)
            dist_emb = table[pos[:, None] - pos[None, :] + m - 1]
            return fused_attention(q, k, v, bias2d, dist_emb)  # (B,H,L,D)

    elif variant == "pallas_v2":
        from foldingdiff_tpu.ops.pallas_attention import fused_attention_v2

        def fn(q, k, v):
            return fused_attention_v2(q, k, v, bias2d, rel_table=table, m=m)  # (B,H,L,D)

    else:
        raise ValueError(variant)

    def looped(q, k, v):
        def body(_, carry):
            out = fn(carry, k, v)
            return out.astype(carry.dtype)

        return jax.lax.fori_loop(0, ITERS, body, q)

    return jax.jit(looped)


def main():
    variants = sys.argv[1:] or ["xla", "xla_norel", "flash", "flash_norel"]
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
    table = jnp.asarray(rng.normal(size=(2 * L - 1, D)) * 0.02, jnp.float32)
    bias2d = jnp.zeros((B, L), jnp.float32)
    print(f"B={B} H={H} L={L} D={D} iters={ITERS} platform={jax.devices()[0].platform}",
          flush=True)
    for variant in variants:
        try:
            f = make_fn(variant, table, bias2d)
            jax.block_until_ready(f(q, k, v))  # compile
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(f(q, k, v))
                times.append(time.perf_counter() - t0)
            per = min(times) / ITERS * 1e6
            print(f"{variant:12s}: {per:8.1f} us/layer-call", flush=True)
        except Exception as e:
            print(f"{variant:12s}: FAILED {repr(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
