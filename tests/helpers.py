"""Shared test fixtures: synthesize a directory of valid PDB files by
perturbing 1CRN's internal angles and rebuilding chains via NeRF."""
import os

import numpy as np

from foldingdiff_tpu.geometry import featurize

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
CRN = os.path.join(DATA_DIR, "1CRN.pdb")


def require_uncontended_host():
    """Skip (with a documented reason) when the 1-core host is already busy
    with a TPU job. The multihost e2e tests spawn 2-4 cooperating jax
    subprocesses under a 600 s timeout; measured fact (CLAUDE.md): they time
    out spuriously when a training/eval job shares the core, and pass
    uncontended. Checks the advisory TPU-job lock written by bin/train.py /
    bench.py / analysis evals, plus the per-core loadavg."""
    import pytest

    from foldingdiff_tpu.utils_platform import host_busy_reason

    reason = host_busy_reason()
    if reason:
        pytest.skip(
            f"host contended ({reason}); multihost e2e needs the core to "
            "itself -- rerun the suite without concurrent TPU jobs"
        )


def make_synthetic_pdb_dir(out_dir: str, n: int = 24, seed: int = 0, min_len: int = 20):
    """Write n synthetic backbone PDBs with varying lengths into out_dir."""
    os.makedirs(out_dir, exist_ok=True)
    feats = featurize.canonical_distances_and_dihedrals(
        CRN, distances=featurize.EXHAUSTIVE_DISTS, angles=featurize.EXHAUSTIVE_ANGLES
    )
    rng = np.random.default_rng(seed)
    fnames = []
    for i in range(n):
        df = feats.copy()
        vals = df.values
        noise = rng.normal(scale=0.08, size=vals.shape)
        noise[:, :3] *= 0.02  # keep bond lengths sane
        df.iloc[:, :] = vals + noise
        length = int(rng.integers(min_len, len(df) + 1))
        df = df.iloc[:length]
        out = os.path.join(out_dir, f"synth_{i:03d}.pdb")
        written = featurize.create_new_chain_nerf(out, df)
        assert written, f"Failed to build {out}"
        fnames.append(out)
    return fnames


def build_torch_reference(config, seed: int = 0):
    """
    Independently assemble the reference architecture in torch from its
    documented semantics (modelling.py:211-484): input proj -> BertEmbeddings
    (LN+dropout, no abs pos for relative_key) -> +time embedding -> HF
    BertEncoder -> MLP head. Returns an eval-mode nn.Module whose state_dict
    uses the reference's parameter names. Shared by the torch-parity tests
    and scripts/make_torch_trained_fixture.py.
    """
    import torch
    from torch import nn as tnn
    from transformers import BertConfig
    from transformers.models.bert.modeling_bert import BertEncoder

    torch.manual_seed(seed)
    hf_cfg = BertConfig(
        max_position_embeddings=config.max_position_embeddings,
        num_attention_heads=config.num_attention_heads,
        hidden_size=config.hidden_size,
        intermediate_size=config.intermediate_size,
        num_hidden_layers=config.num_hidden_layers,
        position_embedding_type=config.position_embedding_type,
        hidden_dropout_prob=config.hidden_dropout_prob,
        attention_probs_dropout_prob=config.attention_probs_dropout_prob,
        use_cache=False,
        attn_implementation="eager",
    )

    class Embeddings(tnn.Module):
        def __init__(self):
            super().__init__()
            if config.position_embedding_type == "absolute":
                self.position_embeddings = tnn.Embedding(
                    config.max_position_embeddings, config.hidden_size
                )
            self.LayerNorm = tnn.LayerNorm(config.hidden_size, eps=1e-12)
            self.dropout = tnn.Dropout(config.hidden_dropout_prob)

        def forward(self, x, position_ids):
            if config.position_embedding_type == "absolute":
                x = x + self.position_embeddings(position_ids)
            return self.dropout(self.LayerNorm(x))

    class TimeEmbed(tnn.Module):
        def __init__(self):
            super().__init__()
            w = torch.randn(config.hidden_size // 2) * (2 * torch.pi)
            self.register_buffer("W", w)

        def forward(self, t):
            proj = t.float()[:, None] * self.W[None, :] * 2 * torch.pi
            return torch.cat([torch.sin(proj), torch.cos(proj)], dim=-1)

    class Head(tnn.Module):
        def __init__(self):
            super().__init__()
            self.dense1 = tnn.Linear(config.hidden_size, config.hidden_size)
            self.layer_norm = tnn.LayerNorm(config.hidden_size, eps=1e-12)
            self.dense2 = tnn.Linear(config.hidden_size, config.n_inputs)

        def forward(self, x):
            return self.dense2(self.layer_norm(tnn.functional.gelu(self.dense1(x))))

    class RefModel(tnn.Module):
        def __init__(self):
            super().__init__()
            self.inputs_to_hidden_dim = tnn.Linear(config.n_inputs, config.hidden_size)
            self.embeddings = Embeddings()
            self.encoder = BertEncoder(hf_cfg)
            self.token_decoder = Head()
            self.time_embed = TimeEmbed()

        def forward(self, inputs, timestep, attention_mask):
            b, l, _ = inputs.shape
            position_ids = torch.arange(l).expand(b, -1)
            ext_mask = (1.0 - attention_mask[:, None, None, :]) * -10000.0
            h = self.inputs_to_hidden_dim(inputs)
            h = self.embeddings(h, position_ids)
            h = h + self.time_embed(timestep).unsqueeze(1)
            out = self.encoder(h, attention_mask=ext_mask, return_dict=True)
            return self.token_decoder(out.last_hidden_state)

    return RefModel().eval()
