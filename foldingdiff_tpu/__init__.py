"""
foldingdiff_tpu: a TPU-native (JAX/XLA/Pallas/pjit) protein-backbone diffusion framework.

Provides the full capability surface of microsoft/foldingdiff (see /root/reference):
a DDPM over protein internal angles with a BERT-style denoiser, wrapped-angle losses
and noise schedules, NeRF angle->Cartesian reconstruction, and an evaluation toolchain
(TM-score, scTM designability, lDDT, secondary structure, clash counting, metrics).

Design stance (not a port):
- diffusion math is pure functions over a frozen `DiffusionSchedule` pytree
- the denoiser is a Flax transformer (HF-BertEncoder-compatible numerics incl.
  relative_key attention) so reference torch checkpoints convert mechanically
- reverse sampling compiles to a single `lax.scan` over T timesteps
- NeRF is a `lax.scan` over residues, vectorized over the batch
- scaling is `jax.sharding.Mesh` + NamedSharding data parallelism over ICI
"""

__version__ = "0.1.0"
