"""End-to-end training slice: synthetic PDBs -> dataset -> jitted train loop
-> checkpoints -> reload -> sample -> NeRF -> PDB. The 'one model running'
milestone from SURVEY.md section 7."""
import glob
import os

import numpy as np
import pytest

import jax

from foldingdiff_tpu.data import datasets as dsets
from foldingdiff_tpu.diffusion import sampling as samp
from foldingdiff_tpu.diffusion.schedules import DiffusionSchedule
from foldingdiff_tpu.models import BertForDiffusion, ModelConfig
from foldingdiff_tpu.models import io as model_io
from foldingdiff_tpu.training import Trainer, TrainConfig
from tests.helpers import make_synthetic_pdb_dir

CONFIG = ModelConfig(
    hidden_size=48,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=96,
    max_position_embeddings=48,
)


@pytest.fixture(scope="module")
def train_setup(tmp_path_factory):
    pdb_dir = str(tmp_path_factory.mktemp("pdbs"))
    cache_dir = str(tmp_path_factory.mktemp("cache"))
    make_synthetic_pdb_dir(pdb_dir, n=16, seed=2, min_len=30)
    ds = dsets.AnglesOnlyDataset(
        pdbs=pdb_dir, pad=48, min_length=0, trim_strategy="leftalign",
        cache_dir=cache_dir, n_workers=1,
    )
    return ds


def test_train_loop_decreases_loss_and_checkpoints(train_setup, tmp_path):
    ds = train_setup
    data = ds.to_arrays()
    sched = DiffusionSchedule.create("cosine", 25)
    tcfg = TrainConfig(lr=3e-4, batch_size=8, max_epochs=12, lr_scheduler=None, seed=0)
    model = BertForDiffusion(CONFIG)
    trainer = Trainer(model, sched, tcfg, steps_per_epoch=len(ds) // tcfg.batch_size)
    state = trainer.init_state(jax.random.PRNGKey(0), pad=48)

    train_args = {
        "angles_definitions": "canonical-full-angles",
        "max_seq_len": 48,
        "num_hidden_layers": CONFIG.num_hidden_layers,
        "hidden_size": CONFIG.hidden_size,
        "intermediate_size": CONFIG.intermediate_size,
        "num_heads": CONFIG.num_attention_heads,
        "position_embedding_type": CONFIG.position_embedding_type,
        "time_encoding": "gaussian_fourier",
        "decoder": "mlp",
        "timesteps": 25,
        "variance_schedule": "cosine",
        "variance_scale": 1.0,
    }
    state, rows = trainer.fit(
        state, data, valid_data=data, results_dir=str(tmp_path),
        model_config=CONFIG, train_args=train_args, mean_offset=ds.get_masked_means(),
    )
    assert len(rows) == 12
    first, last = rows[0]["train_loss"], rows[-1]["train_loss"]
    assert last < first, f"Loss did not decrease: {first} -> {last}"

    # Artifacts: reference layout
    assert os.path.isfile(tmp_path / "training_args.json")
    assert os.path.isfile(tmp_path / "config.json")
    assert os.path.isfile(tmp_path / "training_mean_offset.npy")
    assert os.path.isfile(tmp_path / "logs" / "metrics.csv")
    ckpts = glob.glob(str(tmp_path / "models" / "best_by_valid" / "*.msgpack"))
    assert 1 <= len(ckpts) <= 5
    assert glob.glob(str(tmp_path / "models" / "best_by_train" / "*.msgpack"))

    # Reload + sample end to end -> PDB files
    model2, params2, constants2, args2 = model_io.from_dir(str(tmp_path))
    sched2 = DiffusionSchedule.create(args2["variance_schedule"], args2["timesteps"])
    empty = dsets.AnglesEmptyDataset.from_dir(str(tmp_path))
    sampled = samp.sample(
        model2, params2, constants2, sched2,
        is_angular=empty.feature_is_angular["angles"], pad=empty.pad,
        n=2, sweep_lengths=(30, 32), batch_size=4,
        mean_offset=empty.get_masked_means(), seed=0,
    )
    assert len(sampled) == 4

    from foldingdiff_tpu.geometry.featurize import create_new_chain_nerf
    import pandas as pd

    out_pdbs = []
    for i, s in enumerate(sampled):
        df = pd.DataFrame(s, columns=list(empty.feature_names["angles"]))
        out = create_new_chain_nerf(str(tmp_path / f"sample_{i}.pdb"), df)
        assert out
        out_pdbs.append(out)
    from foldingdiff_tpu.geometry.pdb import get_pdb_length

    assert get_pdb_length(out_pdbs[0]) == 30


def test_mesh_data_parallel_training_matches_single(train_setup):
    """Gradient math must be identical when the batch is sharded over the
    8-device mesh (XLA inserts the psum) vs single device."""
    import dataclasses

    from foldingdiff_tpu.parallel import make_mesh

    ds = train_setup
    data = ds.to_arrays()
    sched = DiffusionSchedule.create("linear", 25)
    tcfg = TrainConfig(lr=3e-4, batch_size=8, max_epochs=2, lr_scheduler=None, seed=0)
    model = BertForDiffusion(dataclasses.replace(CONFIG, matmul_precision="highest"))

    t_single = Trainer(model, sched, tcfg, steps_per_epoch=2)
    s_single = t_single.init_state(jax.random.PRNGKey(0), pad=48)
    s_single, rows_single = t_single.fit(s_single, data, valid_data=None)

    mesh = make_mesh()
    t_mesh = Trainer(model, sched, tcfg, steps_per_epoch=2, mesh=mesh)
    s_mesh = t_mesh.init_state(jax.random.PRNGKey(0), pad=48)
    s_mesh, rows_mesh = t_mesh.fit(s_mesh, data, valid_data=None)

    assert np.isclose(
        rows_single[-1]["train_loss"], rows_mesh[-1]["train_loss"], atol=1e-4
    ), (rows_single[-1]["train_loss"], rows_mesh[-1]["train_loss"])
    # Parameters end up numerically equal
    flat_s = jax.tree.leaves(jax.device_get(s_single.params))
    flat_m = jax.tree.leaves(jax.device_get(s_mesh.params))
    for a, b in zip(flat_s, flat_m):
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_pdist_loss_training_step(train_setup):
    """Training with the pairwise-distance auxiliary loss runs and is finite."""
    ds = train_setup
    data = ds.to_arrays()
    sched = DiffusionSchedule.create("cosine", 25)
    tcfg = TrainConfig(
        lr=1e-4, batch_size=8, max_epochs=1, lr_scheduler=None, use_pdist_loss=0.5, seed=0
    )
    model = BertForDiffusion(CONFIG)
    trainer = Trainer(model, sched, tcfg, steps_per_epoch=2)
    state = trainer.init_state(jax.random.PRNGKey(0), pad=48)
    state, rows = trainer.fit(state, data)
    assert np.isfinite(rows[0]["train_loss"])
    assert "train_loss_pairwise_dist_loss" in rows[0]


def test_lr_schedule_linear_warmup():
    from foldingdiff_tpu.training.trainer import make_lr_schedule

    cfg = TrainConfig(lr=1.0, max_epochs=100, lr_scheduler="LinearWarmup")
    sched = make_lr_schedule(cfg, steps_per_epoch=10)
    import jax.numpy as jnp

    # 10% warmup = 10 epochs; epoch 0 => 0, epoch 5 => 0.5, epoch 10 => full
    assert float(sched(jnp.asarray(0))) == 0.0
    assert np.isclose(float(sched(jnp.asarray(50))), 0.5)
    assert np.isclose(float(sched(jnp.asarray(100))), 1.0)
    # Linear decay to 0 at the end
    assert np.isclose(float(sched(jnp.asarray(55 * 10))), (100 - 55) / 90)
    assert np.isclose(float(sched(jnp.asarray(999))), (100 - 99) / 90)


def test_ragged_batch_pads_and_shards(train_setup):
    """A batch not divisible by the mesh size must be zero-padded and batch-
    sharded (NOT replicated), and the padded loss must equal the unpadded
    loss exactly (padded rows carry attn_mask=0 / length=0)."""
    import dataclasses

    from jax.sharding import PartitionSpec as P
    from foldingdiff_tpu.parallel import make_mesh
    from foldingdiff_tpu.parallel.mesh import shard_batch

    mesh = make_mesh()
    assert mesh.size == 8

    rng = np.random.default_rng(0)
    b, l, f = 65, 48, 6
    angles = rng.uniform(-np.pi, np.pi, size=(b, l, f)).astype(np.float32)
    lengths = rng.integers(20, l + 1, size=(b,)).astype(np.int32)
    attn_mask = (np.arange(l)[None, :] < lengths[:, None]).astype(np.float32)

    sa, sm, sl = shard_batch(mesh, angles, attn_mask, lengths)
    assert sa.shape == (72, l, f)  # padded to the next multiple of 8
    for arr in (sa, sm, sl):
        assert arr.sharding.spec == P("data"), arr.sharding
    np.testing.assert_array_equal(np.asarray(sa)[b:], 0.0)
    np.testing.assert_array_equal(np.asarray(sm)[b:], 0.0)
    np.testing.assert_array_equal(np.asarray(sl)[b:], 0)

    # Loss exactness: eval-step terms on the ragged batch == padded+sharded
    model = BertForDiffusion(dataclasses.replace(CONFIG, matmul_precision="highest"))
    sched = DiffusionSchedule.create("linear", 25)
    tcfg = TrainConfig(lr=1e-4, batch_size=b, max_epochs=1, lr_scheduler=None, seed=0)
    trainer = Trainer(model, sched, tcfg, steps_per_epoch=1)
    state = trainer.init_state(jax.random.PRNGKey(0), pad=l)

    key = jax.random.PRNGKey(7)
    plain = trainer._eval_step(
        state.params, state.constants,
        {"angles": angles, "attn_mask": attn_mask, "lengths": lengths}, key,
    )
    padded = {
        "angles": np.concatenate([angles, np.zeros((7, l, f), np.float32)]),
        "attn_mask": np.concatenate([attn_mask, np.zeros((7, l), np.float32)]),
        "lengths": np.concatenate([lengths, np.zeros(7, np.int32)]),
    }
    # NOTE: the on-device q-sample draws noise shaped by the (padded) batch,
    # so padded != plain bit-for-bit; fix t and noise externally instead.
    from foldingdiff_tpu.diffusion.noise import q_sample, sample_wrapped_noise
    from foldingdiff_tpu.training.trainer import _per_feature_losses

    t = jax.random.randint(key, (b,), 0, 25)
    noise = sample_wrapped_noise(jax.random.PRNGKey(8), angles.shape, [True] * f)

    def terms_for(x0, mask, t_, noise_):
        corrupted = q_sample(jax.numpy.asarray(x0), t_, noise_, sched, (True,) * f)
        pred = model.apply(
            {"params": state.params, "constants": state.constants},
            corrupted, t_, jax.numpy.asarray(mask), deterministic=True,
        )
        return _per_feature_losses(pred, noise_, jax.numpy.asarray(mask),
                                   (True,) * f, "smooth_l1", 0.0)

    plain_terms = np.asarray(terms_for(angles, attn_mask, t, noise))
    t_pad = jax.numpy.concatenate([t, jax.numpy.zeros(7, jax.numpy.int32)])
    noise_pad = jax.numpy.concatenate([noise, jax.numpy.zeros((7, l, f))])
    pad_terms = np.asarray(
        terms_for(padded["angles"], padded["attn_mask"], t_pad, noise_pad)
    )
    np.testing.assert_allclose(plain_terms, pad_terms, rtol=1e-6)
    assert np.all(np.isfinite(np.asarray(plain)))


def test_ragged_tail_training_under_mesh(train_setup):
    """fit() with a dataset size not divisible by batch*mesh must run the
    padded tail batch sharded and produce finite losses."""
    from foldingdiff_tpu.parallel import make_mesh

    ds = train_setup
    data = {k: v[:13] for k, v in ds.to_arrays().items()}  # 13 items, bs 8 -> tail 5
    sched = DiffusionSchedule.create("cosine", 25)
    tcfg = TrainConfig(lr=1e-4, batch_size=8, max_epochs=1, lr_scheduler=None, seed=0)
    model = BertForDiffusion(CONFIG)
    trainer = Trainer(model, sched, tcfg, steps_per_epoch=2, mesh=make_mesh())
    state = trainer.init_state(jax.random.PRNGKey(0), pad=48)
    state, rows = trainer.fit(state, data)
    assert np.isfinite(rows[0]["train_loss"])


def test_val_loss_weighted_by_mask_sum():
    """The ragged validation tail batch must be weighted by its
    unmasked-position count, not counted as a full batch (an unweighted
    per-batch mean biases val_loss and thus top-k checkpoint selection)."""
    import jax.numpy as jnp

    sched = DiffusionSchedule.create("cosine", 25)
    tcfg = TrainConfig(lr=1e-4, batch_size=4, max_epochs=1, lr_scheduler=None, seed=0)
    model = BertForDiffusion(CONFIG)
    trainer = Trainer(model, sched, tcfg, steps_per_epoch=1)
    rng = np.random.default_rng(0)
    data = {
        "angles": rng.uniform(-np.pi, np.pi, (6, 8, 6)).astype(np.float32),
        "attn_mask": np.ones((6, 8), np.float32),
        "lengths": np.full((6,), 8, np.int64),
    }
    # Stub the steps: train is a no-op; eval returns the batch size as every
    # feature loss, so the weighted mean is analytically checkable
    trainer._train_step = lambda state, batch, key: (
        state, jnp.asarray(0.0), jnp.zeros(6)
    )
    trainer._eval_step = lambda p, c, batch, k: jnp.full(
        (6,), float(batch["angles"].shape[0])
    )
    state = trainer.init_state(jax.random.PRNGKey(0), pad=8)
    _, rows = trainer.fit(state, data, valid_data=data)
    # Batches of 4 and 2 items (all positions unmasked): weights 32 and 16
    expected = (4.0 * 32 + 2.0 * 16) / 48
    assert abs(rows[0]["val_loss"] - expected) < 1e-6, rows[0]["val_loss"]
    # The old unweighted mean would give 3.0
    assert abs(rows[0]["val_loss"] - 3.0) > 0.2


def test_exhaustive_t_validation_flag_changes_behavior(train_setup):
    """fit(exhaustive_t_validation=True) must route validation through the
    stratified-t evaluator: deterministic across runs, different from the
    random-t path (reference bin/train.py:329,358)."""
    ds = train_setup
    data = {k: v[:8] for k, v in ds.to_arrays().items()}
    sched = DiffusionSchedule.create("cosine", 25)

    def run(exhaustive, seed=0):
        tcfg = TrainConfig(lr=1e-4, batch_size=8, max_epochs=1, lr_scheduler=None, seed=seed)
        model = BertForDiffusion(CONFIG)
        trainer = Trainer(model, sched, tcfg, steps_per_epoch=1)
        state = trainer.init_state(jax.random.PRNGKey(0), pad=48)
        _, rows = trainer.fit(
            state, data, valid_data=data, exhaustive_t_validation=exhaustive
        )
        return rows[0]["val_loss"]

    a = run(True)
    b = run(True)
    c = run(False)
    assert np.isfinite(a)
    assert a == b, "exhaustive-t validation must be deterministic"
    assert a != c, "flag must actually change the validation computation"


def test_exhaustive_t_points_key_changes_behavior(train_setup):
    """`validation_t_points` (train() config key -> fit(exhaustive_t_points))
    must change the measured validation: different grid sizes give different
    losses, and <=0 selects the FULL per-timestep sweep (reference
    datasets.py:812-825), identical to passing n_t = T explicitly."""
    ds = train_setup
    data = {k: v[:8] for k, v in ds.to_arrays().items()}
    T = 25
    sched = DiffusionSchedule.create("cosine", T)

    def run(n_points):
        tcfg = TrainConfig(lr=1e-4, batch_size=8, max_epochs=1, lr_scheduler=None, seed=0)
        model = BertForDiffusion(CONFIG)
        trainer = Trainer(model, sched, tcfg, steps_per_epoch=1)
        state = trainer.init_state(jax.random.PRNGKey(0), pad=48)
        _, rows = trainer.fit(
            state, data, valid_data=data,
            exhaustive_t_validation=True, exhaustive_t_points=n_points,
        )
        return rows[0]["val_loss"]

    grid4, grid16 = run(4), run(16)
    assert np.isfinite(grid4) and np.isfinite(grid16)
    assert grid4 != grid16, "grid size must change the measured validation"
    full, explicit_T = run(0), run(T)
    assert full == explicit_T, "<=0 must mean the full per-timestep sweep"
    assert full != grid16


def test_metrics_csv_append_mode(tmp_path):
    """metrics.csv is appended per epoch (one header, no O(epochs^2)
    rewrites), and a fresh run truncates a stale file."""
    sched = DiffusionSchedule.create("cosine", 25)
    tcfg = TrainConfig(lr=1e-4, batch_size=8, max_epochs=3, lr_scheduler=None)
    trainer = Trainer(BertForDiffusion(CONFIG), sched, tcfg, steps_per_epoch=1)

    rows = [{"epoch": 0, "train_loss": 1.0}]
    trainer._csv_rows_flushed = 0
    trainer._write_metrics_csv(str(tmp_path), rows)
    rows.append({"epoch": 1, "train_loss": 0.5})
    trainer._write_metrics_csv(str(tmp_path), rows)
    out = tmp_path / "logs" / "metrics.csv"
    lines = out.read_text().strip().splitlines()
    assert lines[0] == "epoch,train_loss"
    assert len(lines) == 3  # one header + 2 rows
    assert sum(1 for l in lines if l.startswith("epoch")) == 1
    # Idempotent: re-flushing with no new rows appends nothing
    trainer._write_metrics_csv(str(tmp_path), rows)
    assert len(out.read_text().strip().splitlines()) == 3


def test_swa_stays_on_device_and_saves(train_setup, tmp_path):
    """use_swa keeps the running average on device (no per-epoch host fetch)
    and saves a best_by_swa model dir at the end."""
    ds = train_setup
    data = {k: v[:8] for k, v in ds.to_arrays().items()}
    sched = DiffusionSchedule.create("cosine", 25)
    tcfg = TrainConfig(
        lr=3e-4, batch_size=8, max_epochs=5, lr_scheduler=None, use_swa=True, seed=0
    )
    model = BertForDiffusion(CONFIG)
    trainer = Trainer(model, sched, tcfg, steps_per_epoch=1)
    state = trainer.init_state(jax.random.PRNGKey(0), pad=48)
    train_args = {"timesteps": 25, "variance_schedule": "cosine"}
    state, rows = trainer.fit(
        state, data, results_dir=str(tmp_path), model_config=CONFIG,
        train_args=train_args,
    )
    swa_ckpts = glob.glob(str(tmp_path / "models" / "best_by_swa" / "*.msgpack"))
    assert len(swa_ckpts) == 1
    from flax import serialization

    with open(swa_ckpts[0], "rb") as f:
        blob = f.read()
    target = jax.device_get(state.params)
    restored = serialization.from_bytes({"params": target, "constants": {}}, blob)
    leaves = jax.tree.leaves(restored["params"])
    assert leaves and all(np.all(np.isfinite(p)) for p in leaves)


def test_zero_center_false_is_honored(tmp_path):
    """train(zero_center=False) must skip wrapped-mean centering: no mean
    offset artifact, angles unshifted (the key used to be accepted and
    silently ignored)."""
    from foldingdiff_tpu.training.orchestration import get_train_valid_test_sets, train

    pdb_dir = str(tmp_path / "pdbs")
    make_synthetic_pdb_dir(pdb_dir, n=16, seed=3, min_len=30)
    os.makedirs(tmp_path / "c1")
    os.makedirs(tmp_path / "c2")

    centered, _, _ = get_train_valid_test_sets(
        dataset_key=pdb_dir, angles_definitions="canonical-full-angles",
        max_seq_len=48, train_only=True, cache_dir=str(tmp_path / "c1"),
        n_workers=1, zero_center=True,
    )
    uncentered, _, _ = get_train_valid_test_sets(
        dataset_key=pdb_dir, angles_definitions="canonical-full-angles",
        max_seq_len=48, train_only=True, cache_dir=str(tmp_path / "c2"),
        n_workers=1, zero_center=False,
    )
    assert centered.get_masked_means() is not None
    assert uncentered.get_masked_means() is None
    a = centered[0]["angles"]
    b = uncentered[0]["angles"]
    assert not np.allclose(np.asarray(a), np.asarray(b))

    # End-to-end: train() with zero_center=False writes no mean-offset artifact
    out = tmp_path / "results_nocenter"
    train(
        results_dir=str(out), dataset_key=pdb_dir,
        angles_definitions="canonical-full-angles", max_seq_len=48,
        timesteps=5, num_hidden_layers=1, hidden_size=32, intermediate_size=64,
        num_heads=2, batch_size=8, max_epochs=1, lr_scheduler=None,
        dryrun=True, use_mesh=False, zero_center=False, multithread=False,
        save_state_every=0,
    )
    assert not os.path.isfile(out / "training_mean_offset.npy")


def test_fused_steps_matches_unfused(train_setup):
    """fused_steps=K (lax.scan over K stacked batches in one dispatch) must
    reproduce the unfused loop exactly: same key sequence, same losses, same
    final params."""
    import dataclasses

    import jax.numpy as jnp

    ds = train_setup
    data = {k: v[:14] for k, v in ds.to_arrays().items()}  # bs 4 -> 3 full + tail 2
    sched = DiffusionSchedule.create("cosine", 25)
    cfg_model = dataclasses.replace(CONFIG, matmul_precision="highest")

    def run(fused):
        tcfg = TrainConfig(
            lr=3e-4, batch_size=4, max_epochs=2, lr_scheduler=None, seed=0,
            fused_steps=fused,
        )
        trainer = Trainer(BertForDiffusion(cfg_model), sched, tcfg, steps_per_epoch=3)
        state = trainer.init_state(jax.random.PRNGKey(0), pad=48)
        state, rows = trainer.fit(state, data)
        return jax.device_get(state.params), rows

    p1, r1 = run(1)
    p2, r2 = run(2)
    for a, b in zip(r1, r2):
        np.testing.assert_allclose(a["train_loss"], b["train_loss"], atol=1e-6, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_fused_steps_under_mesh(train_setup):
    """Fused dispatch with the batch axis sharded over the 8-device mesh
    (scan axis replicated): finite losses, shapes intact, and equal to the
    meshless fused run."""
    import dataclasses

    from foldingdiff_tpu.parallel import make_mesh

    ds = train_setup
    data = {k: v[:16] for k, v in ds.to_arrays().items()}
    sched = DiffusionSchedule.create("cosine", 25)
    cfg_model = dataclasses.replace(CONFIG, matmul_precision="highest")

    def run(mesh):
        tcfg = TrainConfig(
            lr=3e-4, batch_size=8, max_epochs=1, lr_scheduler=None, seed=0,
            fused_steps=2,
        )
        trainer = Trainer(
            BertForDiffusion(cfg_model), sched, tcfg, steps_per_epoch=2, mesh=mesh
        )
        state = trainer.init_state(jax.random.PRNGKey(0), pad=48)
        _, rows = trainer.fit(state, data)
        return rows

    plain = run(None)
    meshed = run(make_mesh())
    np.testing.assert_allclose(
        plain[0]["train_loss"], meshed[0]["train_loss"], atol=1e-5, rtol=1e-5
    )
