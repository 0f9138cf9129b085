"""Training-loop and evaluation-harness tests on a tiny generated dataset."""

import json

import jax
import numpy as np
import pytest

from galaxy_deconv_tpu.data import GalaxyDataset, SimulationConfig, generate_dataset
from galaxy_deconv_tpu.eval import (
    median_ellipticity_error,
    run_psf_error_test,
    run_shear_test,
    run_time_test,
)
from galaxy_deconv_tpu.losses import MultiScaleLoss
from galaxy_deconv_tpu.models import UnrolledADMMGaussian
from galaxy_deconv_tpu.train import (
    create_train_state,
    fit,
    latest_epoch,
    restore_checkpoint,
    save_checkpoint,
)
from galaxy_deconv_tpu.train.state import default_optimizer

CFG = SimulationConfig(pupil_n=64, pupil_pad=128)


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    return generate_dataset(
        tmp_path_factory.mktemp("ds"),
        n_train=24,
        n_test=12,
        cfg=CFG,
        chunk=12,
        snrs=(20, 100),
        shear_errs=(0.02,),
        fwhm_errs=(0.02,),
        verbose=False,
    )


@pytest.fixture(scope="module")
def tiny_model():
    return UnrolledADMMGaussian(n_iters=2, features=(4, 8, 8, 8))


class TestFit:
    @pytest.mark.slow
    def test_two_epochs_and_checkpoint(self, root, tiny_model, tmp_path):
        ds = GalaxyDataset(root, "train")
        sample = ds.batch(np.arange(4))
        state, optimizer = create_train_state(
            tiny_model, jax.random.PRNGKey(0), sample, default_optimizer(1e-3)
        )
        state, hist = fit(
            tiny_model, state, optimizer, MultiScaleLoss(), ds,
            n_epochs=2, batch_size=8, eval_every=0,
            model_name="tiny_admm", save_path=tmp_path,
        )
        assert len(hist["train_loss"]) == 2
        assert np.isfinite(hist["train_loss"]).all()
        ep = latest_epoch(tmp_path, "tiny_admm")
        assert ep >= 1
        restored = restore_checkpoint(tmp_path, "tiny_admm", ep, template=state)
        a = jax.tree.leaves(state.params)[0]
        b = jax.tree.leaves(restored.params)[0]
        assert np.asarray(a).shape == np.asarray(b).shape

    def test_checkpoint_roundtrip_exact(self, root, tiny_model, tmp_path):
        ds = GalaxyDataset(root, "train")
        state, _ = create_train_state(tiny_model, jax.random.PRNGKey(1), ds.batch(np.arange(2)))
        save_checkpoint(tmp_path, "m", 3, state)
        back = restore_checkpoint(tmp_path, "m", 3, template=state)
        for x, y in zip(jax.tree.leaves(state.params), jax.tree.leaves(back.params)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestHarness:
    def test_shear_test_schema_and_metric(self, root, tmp_path):
        res_nd = run_shear_test("No_Deconv", root, tmp_path, snrs=(100,), n_gal=12, batch_size=8)
        res_rl = run_shear_test(
            "Richard-Lucy(10)", root, tmp_path, snrs=(100,), n_gal=12, batch_size=8
        )
        with open(tmp_path / "No_Deconv" / "results.json") as f:
            on_disk = json.load(f)
        assert "rec_shear" in on_disk["100"] and "gt_shear" in on_disk["100"]
        assert len(on_disk["100"]["rec_shear"]) == 12
        assert len(on_disk["100"]["rec_shear"][0]) == 3
        err_nd = median_ellipticity_error(res_nd, res_nd, 100)
        err_rl = median_ellipticity_error(res_rl, res_nd, 100)
        assert 0 <= err_rl <= 1 and 0 <= err_nd <= 1

    def test_fpfs_method(self, root, tmp_path):
        res = run_shear_test("FPFS", root, tmp_path, snrs=(100,), n_gal=8, batch_size=8)
        assert len(res["100"]["rec_shear"]) == 8

    def test_ragged_final_batch_padded(self, root, tmp_path):
        """n_gal not divisible by batch_size: padded device call, trimmed
        result, identical to the single-batch answer."""
        a = run_shear_test("Richard-Lucy(10)", root, tmp_path / "a", snrs=(100,), n_gal=10, batch_size=8)
        b = run_shear_test("Richard-Lucy(10)", root, tmp_path / "b", snrs=(100,), n_gal=10, batch_size=16)
        np.testing.assert_allclose(
            np.asarray(a["100"]["rec_shear"]), np.asarray(b["100"]["rec_shear"]), rtol=2e-4, atol=2e-4
        )

    def test_bulk_path_matches_per_batch_oracle(self, root):
        """The bulk-upload sweep (one transfer per field, on-device slicing,
        deferred sync) is bit-identical to a naive per-batch loop over
        GalaxyDataset.batch — the pre-round-5 harness semantics."""
        from galaxy_deconv_tpu.eval.harness import _rec_shear_bulk, make_apply_fn
        from galaxy_deconv_tpu.metrics import estimate_shear

        ds = GalaxyDataset(root, "test", obs_variant="obs_100")
        apply_fn = make_apply_fn("Richard-Lucy(10)")
        bulk = _rec_shear_bulk(apply_fn, ds, 10, 4, "Richard-Lucy(10)")
        oracle = []
        for s in range(0, 12, 4):
            idx = np.arange(s, min(s + 4, 10))
            take = idx.shape[0]
            if take < 4:
                idx = np.concatenate([idx, np.full(4 - take, idx[-1])])
            b = ds.batch(idx)
            rec = apply_fn(b["obs"], b["psf"], b["alpha"])
            oracle.append(np.asarray(estimate_shear(rec))[:take])
        np.testing.assert_array_equal(bulk, np.concatenate(oracle, axis=0))

    def test_mesh_sharded_sweep_matches_local(self, root, tmp_path):
        """The SPMD eval path (batch sharded over the 8-device mesh) produces
        the same measurements as the single-device path."""
        from galaxy_deconv_tpu.parallel import make_mesh

        local = run_shear_test("Richard-Lucy(10)", root, tmp_path / "local", snrs=(100,), n_gal=8, batch_size=8)
        sharded = run_shear_test(
            "Richard-Lucy(10)", root, tmp_path / "sharded", snrs=(100,), n_gal=8, batch_size=8,
            mesh=make_mesh(8),
        )
        np.testing.assert_allclose(
            np.asarray(local["100"]["rec_shear"]),
            np.asarray(sharded["100"]["rec_shear"]),
            rtol=2e-4, atol=2e-4,
        )

    def test_time_test(self, root, tmp_path):
        elapsed = run_time_test("No_Deconv", root, tmp_path, n_gal=12, batch_size=8, warmup=1)
        assert elapsed > 0
        with open(tmp_path / "No_Deconv" / "results.json") as f:
            res = json.load(f)
        # timing covers whole batches only (a padded ragged tail would
        # inflate time/gal), so 12 requested -> 8 timed at batch_size 8
        assert res["time"][1] == 8
        run_time_test("No_Deconv", root, tmp_path, n_gal=12, batch_size=4, warmup=1)
        with open(tmp_path / "No_Deconv" / "results.json") as f:
            assert json.load(f)["time"][1] == 12

    def test_psf_error_test(self, root, tmp_path):
        res = run_psf_error_test(
            "Richard-Lucy(10)", root, tmp_path, errs=(0.02,), kind="shear", n_gal=8, batch_size=8
        )
        assert "0.02" in res

    def test_psnr_test(self, root, tmp_path):
        from galaxy_deconv_tpu.eval import run_psnr_test

        res = run_psnr_test("Richard-Lucy(10)", root, tmp_path, snrs=(100,), n_gal=8, batch_size=8)
        assert "psnr_median" in res["100"]
        assert np.isfinite(res["100"]["psnr_median"])


class TestPersistentCompileCache:
    """utils/cache.py: the persistent XLA executable cache (DESIGN.md risk #11)."""

    def test_enable_sets_config_and_creates_dir(self, tmp_path):
        import jax

        from galaxy_deconv_tpu.utils.cache import enable_persistent_cache

        # snapshot process-global jax config: later compiles in this pytest
        # process must not keep persisting executables into the tmp dir
        prev_dir = jax.config.jax_compilation_cache_dir
        prev_secs = jax.config.jax_persistent_cache_min_compile_time_secs
        try:
            target = tmp_path / "xla_cache"
            out = enable_persistent_cache(target, min_compile_secs=0.0)
            assert out == target and target.is_dir()
            assert jax.config.jax_compilation_cache_dir == str(target)
            # a fresh compile must land an executable in the cache dir
            jax.jit(lambda x: (x * 3).sum())(jax.numpy.ones((4, 4))).block_until_ready()
            assert any(target.iterdir()), "no executable persisted to the cache dir"
        finally:
            jax.config.update("jax_compilation_cache_dir", prev_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_secs)

    def test_env_kill_switch(self, tmp_path, monkeypatch):
        from galaxy_deconv_tpu.utils.cache import enable_persistent_cache

        monkeypatch.setenv("GDT_NO_COMPILE_CACHE", "1")
        target = tmp_path / "never_created"
        # the kill-switch branch returns None — not a path that would
        # misrepresent an inactive cache as live
        assert enable_persistent_cache(target) is None
        assert not target.exists()
