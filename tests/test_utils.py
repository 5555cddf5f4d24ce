"""Port of reference tests/test_utils.py: wrap primitive + tolerant compare."""
import os

import numpy as np
import pytest

from foldingdiff_tpu import utils


class TestModuloWithWrappedRange:
    def test_scalar(self):
        assert utils.modulo_with_wrapped_range(3, -2, 2) == -1

    def test_identity_within_range(self):
        vals = np.array([-3.0, -1.5, 0.0, 1.0, 3.1])
        out = utils.modulo_with_wrapped_range(vals, -np.pi, np.pi)
        np.testing.assert_allclose(out, vals)

    def test_wraps_above(self):
        assert np.isclose(
            utils.modulo_with_wrapped_range(np.pi + 0.5, -np.pi, np.pi), -np.pi + 0.5
        )

    def test_wraps_below(self):
        assert np.isclose(
            utils.modulo_with_wrapped_range(-np.pi - 0.5, -np.pi, np.pi), np.pi - 0.5
        )

    def test_array(self):
        vals = np.array([2 * np.pi, -2 * np.pi, 3 * np.pi, 0.0])
        out = utils.modulo_with_wrapped_range(vals)
        np.testing.assert_allclose(out, [0.0, 0.0, -np.pi, 0.0], atol=1e-12)

    def test_multiple_wraps(self):
        for k in range(-3, 4):
            v = 0.7 + 2 * np.pi * k
            assert np.isclose(utils.modulo_with_wrapped_range(v), 0.7)

    def test_jax_array(self):
        import jax.numpy as jnp

        vals = jnp.array([4.0, -4.0])
        out = utils.modulo_with_wrapped_range(vals)
        np.testing.assert_allclose(
            np.asarray(out), [4.0 - 2 * np.pi, 2 * np.pi - 4.0], rtol=1e-6
        )


class TestTolerantComparison:
    def test_negative_pi_float32(self):
        # float32(-pi) is slightly below -pi in float64
        assert utils.tolerant_comparison_check(-3.1415927410125732, ">=", -np.pi)

    def test_ge_passes(self):
        assert utils.tolerant_comparison_check(np.array([0.0, 1.0]), ">=", -1.0)

    def test_ge_fails(self):
        assert not utils.tolerant_comparison_check(np.array([-2.0, 1.0]), ">=", -1.0)

    def test_le_passes(self):
        assert utils.tolerant_comparison_check(np.array([0.0, 1.0]), "<=", 1.0 + 1e-7)

    def test_le_fails(self):
        assert not utils.tolerant_comparison_check(np.array([0.0, 2.0]), "<=", 1.0)

    def test_bad_comparator(self):
        with pytest.raises(ValueError):
            utils.tolerant_comparison_check(np.array([0.0]), "==", 0.0)


class TestGroups:
    def test_num_to_groups(self):
        assert utils.num_to_groups(18, 16) == [16, 2]
        assert utils.num_to_groups(33, 8) == [8, 8, 8, 8, 1]
        assert utils.num_to_groups(8, 8) == [8]

    def test_seq_to_groups(self):
        assert utils.seq_to_groups([1, 2, 3, 4, 5], 2) == [[1, 2], [3, 4], [5]]


class TestUpdateDictNonnull:
    def test_merge(self):
        assert utils.update_dict_nonnull({"a": 1, "b": 2}, {"b": 3, "c": 4}) == {
            "a": 1,
            "b": 3,
            "c": 4,
        }

    def test_none_skipped(self):
        assert utils.update_dict_nonnull({"a": 1}, {"a": None}) == {"a": 1}


class TestWrappedMean:
    def test_simple(self):
        vals = np.array([0.1, -0.1])
        assert np.isclose(utils.wrapped_mean(vals), 0.0, atol=1e-8)

    def test_across_boundary(self):
        # Mean of pi-0.1 and -pi+0.1 should be +/-pi, not 0
        vals = np.array([np.pi - 0.1, -np.pi + 0.1])
        m = utils.wrapped_mean(vals)
        assert np.isclose(abs(m), np.pi, atol=1e-6)

    def test_nan_tolerant(self):
        vals = np.array([0.5, np.nan, 0.5])
        assert np.isclose(utils.wrapped_mean(vals), 0.5, atol=1e-8)


class TestTpuJobLock:
    """Advisory busy-host sentinel (utils_platform): long TPU jobs hold a
    pidfile lock; the contention-sensitive multihost e2e tests skip while it
    is held by a LIVE process (VERDICT r4 item 6 -- 'suite green' must not
    depend on remembering not to overlap TPU jobs)."""

    def test_lock_held_reports_busy_and_cleans_up(self, monkeypatch, tmp_path):
        from foldingdiff_tpu import utils_platform as up

        lock = str(tmp_path / "job.lock")
        monkeypatch.setattr(up, "TPU_JOB_LOCK", lock)
        with up.tpu_job_lock():
            reason = up.host_busy_reason()
            assert reason is not None and str(os.getpid()) in reason
        assert not os.path.exists(lock)

    def test_stale_lock_from_dead_pid_is_ignored(self, monkeypatch, tmp_path):
        from foldingdiff_tpu import utils_platform as up

        lock = str(tmp_path / "job.lock")
        monkeypatch.setattr(up, "TPU_JOB_LOCK", lock)
        # A pid that cannot be alive (kernel pid_max caps well below 2**22+spares)
        with open(lock, "w") as f:
            f.write("99999999")
        reason = up.host_busy_reason()
        assert reason is None or "lock" not in reason  # loadavg may still trip

    def test_cpu_platform_takes_no_lock(self, monkeypatch, tmp_path):
        from foldingdiff_tpu import utils_platform as up

        lock = str(tmp_path / "job.lock")
        monkeypatch.setattr(up, "TPU_JOB_LOCK", lock)
        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        with up.tpu_job_lock_if_tpu():
            assert not os.path.exists(lock)

    def test_non_cpu_platform_takes_lock(self, monkeypatch, tmp_path):
        from foldingdiff_tpu import utils_platform as up

        lock = str(tmp_path / "job.lock")
        monkeypatch.setattr(up, "TPU_JOB_LOCK", lock)
        monkeypatch.setenv("JAX_PLATFORMS", "axon")
        with up.tpu_job_lock_if_tpu():
            assert os.path.exists(lock)
        assert not os.path.exists(lock)
