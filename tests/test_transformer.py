"""
Model tests: determinism, mask invariance, batch-order agnosticism, save/load
(port of reference tests/test_transformer.py), plus a hard numerics-parity
gate vs the HF torch BertEncoder with converted weights.
"""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from foldingdiff_tpu.models import BertForDiffusion, ModelConfig
from foldingdiff_tpu.models import io as model_io

MINI_CONFIG = ModelConfig(
    hidden_size=96,
    num_hidden_layers=3,
    num_attention_heads=6,
    intermediate_size=192,
    max_position_embeddings=64,
    position_embedding_type="relative_key",
    hidden_dropout_prob=0.1,
    attention_probs_dropout_prob=0.1,
)


def make_model(config=MINI_CONFIG, seed=0):
    model = BertForDiffusion(config)
    variables = model_io.init_model_variables(
        model, jax.random.PRNGKey(seed), pad=config.max_position_embeddings
    )
    return model, variables


def rand_batch(config, b=4, l=None, seed=0):
    l = l or config.max_position_embeddings
    rng = np.random.default_rng(seed)
    x = rng.uniform(-np.pi, np.pi, size=(b, l, config.n_inputs)).astype(np.float32)
    t = rng.integers(0, 250, size=(b,))
    lengths = rng.integers(l // 2, l + 1, size=b)
    mask = (np.arange(l)[None, :] < lengths[:, None]).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(t), jnp.asarray(mask), lengths


class TestModelProperties:
    def test_determinism(self):
        model, variables = make_model()
        x, t, mask, _ = rand_batch(MINI_CONFIG)
        out1 = model.apply(variables, x, t, mask, deterministic=True)
        out2 = model.apply(variables, x, t, mask, deterministic=True)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    def test_mask_invariance(self):
        """Noise on masked tail must not change unmasked outputs
        (reference test_transformer.py:101-134)."""
        model, variables = make_model()
        x, t, mask, lengths = rand_batch(MINI_CONFIG, seed=3)
        out_clean = np.asarray(model.apply(variables, x, t, mask, deterministic=True))
        noise = np.random.default_rng(9).normal(size=np.asarray(x).shape).astype(np.float32)
        x_noised = np.asarray(x) + noise * (1.0 - np.asarray(mask))[:, :, None]
        out_noised = np.asarray(
            model.apply(variables, jnp.asarray(x_noised), t, mask, deterministic=True)
        )
        for i, length in enumerate(lengths):
            np.testing.assert_allclose(
                out_clean[i, :length], out_noised[i, :length], atol=1e-5
            )

    def test_batch_order_agnostic(self):
        model, variables = make_model()
        x, t, mask, _ = rand_batch(MINI_CONFIG, seed=5)
        out = np.asarray(model.apply(variables, x, t, mask, deterministic=True))
        perm = np.array([2, 0, 3, 1])
        out_perm = np.asarray(
            model.apply(variables, x[perm], t[perm], mask[perm], deterministic=True)
        )
        np.testing.assert_allclose(out[perm], out_perm, atol=1e-5)

    def test_dropout_changes_output(self):
        model, variables = make_model()
        x, t, mask, _ = rand_batch(MINI_CONFIG)
        out1 = model.apply(
            variables, x, t, mask, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)}
        )
        out2 = model.apply(
            variables, x, t, mask, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)}
        )
        assert not np.allclose(np.asarray(out1), np.asarray(out2))

    def test_timestep_changes_output(self):
        model, variables = make_model()
        x, t, mask, _ = rand_batch(MINI_CONFIG)
        out1 = model.apply(variables, x, jnp.zeros_like(t), mask, deterministic=True)
        out2 = model.apply(variables, x, jnp.full_like(t, 100), mask, deterministic=True)
        assert not np.allclose(np.asarray(out1), np.asarray(out2), atol=1e-3)


class TestRelativeScoresImpls:
    """All relative_key score formulations compute the same dot products
    (gather = HF semantics; skew and onedot are matmul-shaped rewrites --
    see scripts/microbench_relkey.py for the perf A/B on real TPU)."""

    @pytest.mark.parametrize("impl", ["skew", "onedot"])
    def test_matches_gather(self, impl):
        import dataclasses

        model, variables = make_model()
        alt_model = BertForDiffusion(
            dataclasses.replace(MINI_CONFIG, relative_scores_impl=impl)
        )
        x, t, mask, _ = rand_batch(MINI_CONFIG)
        ref = model.apply(variables, x, t, mask, deterministic=True)
        alt = alt_model.apply(variables, x, t, mask, deterministic=True)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(alt), atol=2e-5)


class TestSaveLoad:
    def test_roundtrip(self, tmp_path):
        model, variables = make_model()
        train_args = {
            "angles_definitions": "canonical-full-angles",
            "max_seq_len": MINI_CONFIG.max_position_embeddings,
            "num_hidden_layers": MINI_CONFIG.num_hidden_layers,
            "hidden_size": MINI_CONFIG.hidden_size,
            "intermediate_size": MINI_CONFIG.intermediate_size,
            "num_heads": MINI_CONFIG.num_attention_heads,
            "position_embedding_type": "relative_key",
            "time_encoding": "gaussian_fourier",
            "decoder": "mlp",
            "dropout_p": 0.1,
            "timesteps": 250,
            "variance_schedule": "cosine",
            "variance_scale": 1.0,
        }
        model_io.save_model_dir(
            str(tmp_path),
            MINI_CONFIG,
            variables["params"],
            variables["constants"],
            train_args,
            mean_offset=np.zeros(6),
            epoch=3,
        )
        model2, params2, constants2, args2 = model_io.from_dir(str(tmp_path))
        x, t, mask, _ = rand_batch(MINI_CONFIG, seed=11)
        out1 = model.apply(variables, x, t, mask, deterministic=True)
        out2 = model2.apply(
            {"params": params2, "constants": constants2}, x, t, mask, deterministic=True
        )
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)
        assert args2["timesteps"] == 250

    def test_top_k_pruning(self, tmp_path):
        model, variables = make_model()
        ta = {"angles_definitions": "canonical-full-angles", "max_seq_len": 64,
              "num_hidden_layers": 3, "hidden_size": 96, "intermediate_size": 192,
              "num_heads": 6, "decoder": "mlp", "time_encoding": "gaussian_fourier"}
        for e in range(8):
            model_io.save_model_dir(
                str(tmp_path), MINI_CONFIG, variables["params"], variables["constants"],
                ta, epoch=e, keep_top_k=5,
            )
        import glob
        ckpts = glob.glob(str(tmp_path / "models" / "best_by_valid" / "*.msgpack"))
        assert len(ckpts) == 5


def _build_torch_reference(config: ModelConfig, seed: int = 0):
    from tests.helpers import build_torch_reference

    return build_torch_reference(config, seed=seed)


@pytest.mark.parametrize("pos_type", ["relative_key", "absolute", "relative_key_query"])
def test_numerics_parity_with_torch(pos_type):
    """Converted torch weights must reproduce the reference forward pass."""
    torch = pytest.importorskip("torch")
    config = ModelConfig(
        hidden_size=96,
        num_hidden_layers=2,
        num_attention_heads=6,
        intermediate_size=192,
        max_position_embeddings=32,
        position_embedding_type=pos_type,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        matmul_precision="highest",
    )
    ref = _build_torch_reference(config, seed=17)

    rng = np.random.default_rng(4)
    b, l = 3, 32
    x = rng.uniform(-np.pi, np.pi, size=(b, l, 6)).astype(np.float32)
    t = rng.integers(0, 250, size=(b,))
    lengths = np.array([32, 20, 25])
    mask = (np.arange(l)[None, :] < lengths[:, None]).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(mask)
        ).numpy()

    params, constants = model_io.convert_torch_state_dict(ref.state_dict(), config)
    model = BertForDiffusion(config)
    ours = np.asarray(
        model.apply(
            {"params": params, "constants": constants},
            jnp.asarray(x),
            jnp.asarray(t),
            jnp.asarray(mask),
            deterministic=True,
        )
    )
    np.testing.assert_allclose(ours, ref_out, atol=2e-5, rtol=1e-4)


class TestTimeEmbed:
    def test_gaussian_fourier_determinism_and_uniqueness(self):
        """Reference test_model_subparts.py: unique encodings across t."""
        from foldingdiff_tpu.models.time_embed import GaussianFourierProjection

        m = GaussianFourierProjection(embed_dim=64)
        variables = m.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((4,)))
        t = jnp.arange(1000, dtype=jnp.float32)
        out = np.asarray(m.apply(variables, t))
        out2 = np.asarray(m.apply(variables, t))
        np.testing.assert_array_equal(out, out2)
        # All timesteps produce distinct encodings
        assert len(np.unique(out.round(6), axis=0)) == 1000

    def test_permutation_equivariance(self):
        from foldingdiff_tpu.models.time_embed import GaussianFourierProjection

        m = GaussianFourierProjection(embed_dim=64)
        variables = m.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((4,)))
        t = jnp.asarray([3.0, 7.0, 11.0, 200.0])
        perm = np.array([2, 0, 3, 1])
        out = np.asarray(m.apply(variables, t))
        out_p = np.asarray(m.apply(variables, t[perm]))
        np.testing.assert_allclose(out[perm], out_p, atol=1e-6)

    def test_sinusoidal(self):
        from foldingdiff_tpu.models.time_embed import SinusoidalPositionEmbeddings

        m = SinusoidalPositionEmbeddings(embed_dim=64)
        variables = m.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((4,)))
        out = np.asarray(m.apply(variables, jnp.arange(100, dtype=jnp.float32)))
        assert out.shape == (100, 64)
        assert len(np.unique(out.round(6), axis=0)) == 100


class TestPositionalEncoding:
    """Reference tests/test_model_subparts.py: determinism + broadcast."""

    def test_determinism_and_shape(self):
        from foldingdiff_tpu.models.time_embed import PositionalEncoding

        m = PositionalEncoding(d_model=32)
        v = m.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((2, 8, 32)))
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 32)).astype(np.float32))
        o1 = np.asarray(m.apply(v, x))
        o2 = np.asarray(m.apply(v, x))
        np.testing.assert_array_equal(o1, o2)
        assert o1.shape == (2, 8, 32)

    def test_broadcast_same_encoding_across_batch(self):
        from foldingdiff_tpu.models.time_embed import PositionalEncoding

        m = PositionalEncoding(d_model=32)
        v = m.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((3, 8, 32)))
        x = jnp.zeros((3, 8, 32))
        out = np.asarray(m.apply(v, x))
        # zero input -> output IS the positional encoding, equal across batch
        np.testing.assert_array_equal(out[0], out[1])
        np.testing.assert_array_equal(out[0], out[2])
        # distinct across positions
        assert not np.allclose(out[0, 0], out[0, 1])


class TestRemat:
    """config.remat wraps each encoder layer in jax.checkpoint: same params
    tree (checkpoints interchangeable), outputs/grads equal to float
    reassociation tolerance."""

    def test_remat_equivalence(self):
        import dataclasses

        from foldingdiff_tpu.models import io as model_io
        from foldingdiff_tpu.models.bert import BertForDiffusion
        from foldingdiff_tpu.models.config import ModelConfig

        cfg = ModelConfig(
            hidden_size=48, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=96, max_position_embeddings=16,
        )
        m = BertForDiffusion(cfg)
        v = model_io.init_model_variables(m, jax.random.PRNGKey(0), pad=16)
        mr = BertForDiffusion(dataclasses.replace(cfg, remat=True))
        x = np.random.default_rng(0).uniform(-1, 1, (3, 16, 6)).astype(np.float32)
        t = np.array([1, 5, 9], np.int32)
        mask = np.ones((3, 16), np.float32)
        np.testing.assert_allclose(
            np.asarray(m.apply(v, x, t, mask, deterministic=True)),
            np.asarray(mr.apply(v, x, t, mask, deterministic=True)),
            atol=1e-5, rtol=1e-4,
        )

        def loss(params, model):
            out = model.apply(
                {"params": params, "constants": v.get("constants", {})},
                x, t, mask, deterministic=True,
            )
            return jnp.mean(out ** 2)

        ga = jax.grad(lambda p: loss(p, m))(v["params"])
        gb = jax.grad(lambda p: loss(p, mr))(v["params"])
        assert jax.tree.structure(ga) == jax.tree.structure(gb)
        for la, lb in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
            np.testing.assert_allclose(la, lb, atol=1e-5, rtol=1e-3)
