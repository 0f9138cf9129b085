"""Online (fused-simulation) training and denoise-task tests."""

import jax
import numpy as np
import pytest

from galaxy_deconv_tpu.data.simulate import SimulationConfig, noise_sigma, simulate_batch_denoise
from galaxy_deconv_tpu.losses import MultiScaleLoss
from galaxy_deconv_tpu.models import ResUNetDenoiser, UnrolledADMMGaussian, build_model
from galaxy_deconv_tpu.train import create_train_state
from galaxy_deconv_tpu.train.online import make_online_eval_step, make_online_train_step
from galaxy_deconv_tpu.train.state import default_optimizer

CFG = SimulationConfig(pupil_n=64, pupil_pad=128)


class TestDenoiseTask:
    def test_simulate_denoise(self):
        out = jax.tree.map(np.asarray, simulate_batch_denoise(jax.random.PRNGKey(0), 4, CFG))
        assert out["obs"].shape == (4, 48, 48)
        # no PSF convolution: obs - gt is pure noise at sigma
        resid = out["obs"] - out["gt"]
        assert 0.8 * noise_sigma() < resid.std() < 1.2 * noise_sigma()

    def test_resunet_denoiser_contract(self):
        model = build_model("ResUNet", features=(4, 8, 8, 8))
        assert isinstance(model, ResUNetDenoiser)
        obs = jax.numpy.ones((2, 48, 48))
        v = model.init(jax.random.PRNGKey(0), obs, obs, jax.numpy.ones((2,)))
        rec = model.apply(v, obs, obs, jax.numpy.ones((2,)))
        assert rec.shape == (2, 48, 48)


class TestOnlineTraining:
    @pytest.mark.slow
    def test_fused_step_runs_and_learns(self):
        model = UnrolledADMMGaussian(n_iters=2, features=(4, 8, 8, 8))
        from galaxy_deconv_tpu.data.simulate import simulate_batch

        batch = jax.tree.map(np.asarray, simulate_batch(jax.random.PRNGKey(0), 2, CFG))
        batch["alpha"] = batch["obs"].mean(axis=(1, 2))
        state, opt = create_train_state(model, jax.random.PRNGKey(0), batch, default_optimizer(1e-3))
        step = make_online_train_step(model, MultiScaleLoss(), opt, batch_size=4, sim_cfg=CFG, donate=False)
        losses = []
        for i in range(6):
            state, loss = step(state, jax.random.fold_in(jax.random.PRNGKey(1), i))
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert int(state.step) == 6

    @pytest.mark.slow
    def test_scan_matches_sequential_steps(self):
        """k fused (lax.scan) steps == k one-step calls: same params, same losses."""
        from galaxy_deconv_tpu.data.simulate import simulate_batch
        from galaxy_deconv_tpu.train.online import make_online_train_scan

        import optax

        model = UnrolledADMMGaussian(n_iters=2, features=(4, 8, 8, 8))
        batch = jax.tree.map(np.asarray, simulate_batch(jax.random.PRNGKey(0), 2, CFG))
        batch["alpha"] = batch["obs"].mean(axis=(1, 2))
        # SGD, not Adam: Adam's 1/sqrt(v) chaotically amplifies the float
        # noise from scan-vs-sequential fusion differences, making a param
        # comparison meaningless; under SGD params stay float-noise close.
        state0, opt = create_train_state(model, jax.random.PRNGKey(0), batch, optax.sgd(1e-5))

        keys = [jax.random.fold_in(jax.random.PRNGKey(2), i) for i in range(4)]
        step = make_online_train_step(model, MultiScaleLoss(), opt, batch_size=4, sim_cfg=CFG, donate=False)
        seq_state, seq_losses = state0, []
        for kk in keys:
            seq_state, loss = step(seq_state, kk)
            seq_losses.append(float(loss))

        scan = make_online_train_scan(model, MultiScaleLoss(), opt, batch_size=4,
                                      steps_per_call=4, sim_cfg=CFG)
        scan_state, scan_losses = scan(state0, jax.numpy.stack(keys))
        np.testing.assert_allclose(np.asarray(scan_losses), seq_losses, rtol=1e-3)
        # param tolerance is loose on purpose: scan-vs-sequential compile to
        # different fusions whose float noise is chaotically amplified by the
        # SubNet BatchNorm statistics of a 4-sample batch (observed worst
        # leaf: a BN bias off by ~2e-5 absolute after 4 steps — the order of
        # the cumulative update itself).  A key-threading or step-count bug
        # would show up as O(1) divergence and still fails this.
        jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-3, atol=5e-5),
                     seq_state.params, scan_state.params)
        assert int(scan_state.step) == 4

    @pytest.mark.slow
    def test_fit_online_steps_per_call(self, tmp_path):
        from galaxy_deconv_tpu.train.online import fit_online

        model = UnrolledADMMGaussian(n_iters=2, features=(4, 8, 8, 8))
        from galaxy_deconv_tpu.data.simulate import simulate_batch

        batch = jax.tree.map(np.asarray, simulate_batch(jax.random.PRNGKey(0), 2, CFG))
        batch["alpha"] = batch["obs"].mean(axis=(1, 2))
        state, opt = create_train_state(model, jax.random.PRNGKey(0), batch, default_optimizer(1e-3))
        state, hist = fit_online(model, state, opt, MultiScaleLoss(), n_steps=8, batch_size=4,
                                 sim_cfg=CFG, log_every=4, val_every=4, val_batches=1,
                                 model_name="m", save_path=str(tmp_path), steps_per_call=4)
        assert int(state.step) == 8
        assert len(hist["val_loss"]) == 2 and np.isfinite(hist["val_loss"]).all()
        assert hist["galaxies_per_sec"] > 0

    def test_eval_step_deterministic(self):
        model = UnrolledADMMGaussian(n_iters=2, features=(4, 8, 8, 8))
        from galaxy_deconv_tpu.data.simulate import simulate_batch

        batch = jax.tree.map(np.asarray, simulate_batch(jax.random.PRNGKey(0), 2, CFG))
        batch["alpha"] = batch["obs"].mean(axis=(1, 2))
        state, _ = create_train_state(model, jax.random.PRNGKey(0), batch, default_optimizer())
        ev = make_online_eval_step(model, MultiScaleLoss(), batch_size=4, sim_cfg=CFG)
        k = jax.random.PRNGKey(7)
        assert float(ev(state, k)) == float(ev(state, k))


class TestFailureContainment:
    pytestmark = pytest.mark.slow

    def test_nonfinite_loss_skips_update(self):
        """A batch that produces a NaN loss must leave params untouched."""
        import jax.numpy as jnp

        from galaxy_deconv_tpu.models import UnrolledADMMGaussian
        from galaxy_deconv_tpu.train.loop import make_train_step

        model = UnrolledADMMGaussian(n_iters=2, features=(4, 8, 8, 8))
        batch = {
            "obs": np.ones((2, 48, 48), np.float32),
            "psf": np.ones((2, 48, 48), np.float32) / 100,
            "alpha": np.ones((2,), np.float32),
            "gt": np.full((2, 48, 48), np.nan, np.float32),  # poisons the loss
        }
        state, opt = create_train_state(model, jax.random.PRNGKey(0), batch, default_optimizer(1e-3))
        step = make_train_step(model, MultiScaleLoss(), opt, donate=False)
        before = jax.tree.leaves(state.params)[0].copy()
        new_state, loss = step(state, {k: jnp.asarray(v) for k, v in batch.items()})
        assert not np.isfinite(float(loss))
        np.testing.assert_array_equal(np.asarray(jax.tree.leaves(new_state.params)[0]), np.asarray(before))

    def test_finite_loss_nonfinite_grads_skips_update(self):
        """A FINITE loss whose gradients are NaN (sqrt at 0) must also
        leave params untouched — checking only isfinite(loss) let exactly
        this poison a Poisson-ADMM run (train.state.update_is_good)."""
        import jax.numpy as jnp

        from galaxy_deconv_tpu.models import UnrolledADMMGaussian
        from galaxy_deconv_tpu.train.loop import make_train_step

        def poisoned_loss(gt, rec):
            # forward value 0 (finite); d/drec sqrt(rec*0) at 0 -> nan
            return jnp.sum(jnp.sqrt(rec * 0.0))

        model = UnrolledADMMGaussian(n_iters=2, features=(4, 8, 8, 8))
        batch = {
            "obs": np.ones((2, 48, 48), np.float32),
            "psf": np.ones((2, 48, 48), np.float32) / 100,
            "alpha": np.ones((2,), np.float32),
            "gt": np.ones((2, 48, 48), np.float32),
        }
        state, opt = create_train_state(model, jax.random.PRNGKey(0), batch, default_optimizer(1e-3))
        step = make_train_step(model, poisoned_loss, opt, donate=False)
        before = jax.tree.leaves(state.params)[0].copy()
        new_state, loss = step(state, {k: jnp.asarray(v) for k, v in batch.items()})
        assert np.isfinite(float(loss))  # the loss itself is fine
        np.testing.assert_array_equal(np.asarray(jax.tree.leaves(new_state.params)[0]), np.asarray(before))


class TestDeviceResident:
    pytestmark = pytest.mark.slow

    def test_fit_device_resident(self, tmp_path):
        from galaxy_deconv_tpu.data import generate_dataset, GalaxyDataset
        from galaxy_deconv_tpu.train.device_resident import fit_device_resident

        root = generate_dataset(tmp_path / "ds", n_train=16, n_test=4, cfg=CFG, chunk=8,
                                snrs=(), shear_errs=(), fwhm_errs=(), verbose=False)
        ds = GalaxyDataset(root, "train")
        model = UnrolledADMMGaussian(n_iters=2, features=(4, 8, 8, 8))
        b = ds.batch(np.arange(4))
        state, opt = create_train_state(model, jax.random.PRNGKey(0), b, default_optimizer(1e-3))
        state, hist = fit_device_resident(model, state, opt, MultiScaleLoss(), ds,
                                          n_epochs=2, batch_size=4)
        assert len(hist["train_loss"]) == 2
        assert np.isfinite(hist["train_loss"]).all()

    def test_bad_step_reverts_opt_state_too(self, tmp_path):
        """A NaN-grad step must leave Adam's moments (not just params)
        untouched — a poisoned opt_state silently stalls all later steps."""
        import jax.numpy as jnp

        from galaxy_deconv_tpu.data import GalaxyDataset, generate_dataset
        from galaxy_deconv_tpu.train.device_resident import make_indexed_train_step, upload_split

        root = generate_dataset(tmp_path / "ds", n_train=8, n_test=4, cfg=CFG, chunk=8,
                                snrs=(), shear_errs=(), fwhm_errs=(), verbose=False)
        ds = GalaxyDataset(root, "train")
        model = UnrolledADMMGaussian(n_iters=2, features=(4, 8, 8, 8))
        b = ds.batch(np.arange(4))
        state, opt = create_train_state(model, jax.random.PRNGKey(0), b, default_optimizer(1e-3))

        def poisoned_loss(gt, rec):
            return jnp.sum(jnp.sqrt(rec * 0.0))  # finite value, nan grads

        data = upload_split(ds)
        step = make_indexed_train_step(model, poisoned_loss, opt, data, donate=False)
        before = [np.asarray(x).copy() for x in jax.tree.leaves(state.opt_state)]
        new_state, loss = step(state, jnp.arange(4))
        assert np.isfinite(float(loss))
        for a, b_ in zip(jax.tree.leaves(new_state.opt_state), before):
            np.testing.assert_array_equal(np.asarray(a), b_)


class TestStallWatchdog:
    """Failure detection for wedged device RPCs (utils.watchdog)."""

    def test_fires_once_after_timeout_without_beats(self):
        import time

        from galaxy_deconv_tpu.utils import StallWatchdog

        fired = []
        dog = StallWatchdog(timeout_s=0.2, name="t", poll_s=0.05,
                            on_stall=lambda name, el: fired.append((name, el)))
        with dog:
            time.sleep(0.6)
        assert len(fired) == 1
        assert fired[0][0] == "t" and fired[0][1] > 0.2

    def test_beats_keep_it_quiet_and_stop_joins(self):
        import time

        from galaxy_deconv_tpu.utils import StallWatchdog

        fired = []
        with StallWatchdog(timeout_s=0.3, poll_s=0.05,
                           on_stall=lambda *a: fired.append(a)) as dog:
            for _ in range(10):
                time.sleep(0.05)
                dog.beat()
        assert fired == []

    def test_disabled_when_timeout_none(self):
        from galaxy_deconv_tpu.utils import StallWatchdog

        with StallWatchdog(timeout_s=None) as dog:
            assert dog._thread is None
            dog.beat()

    @pytest.mark.slow
    def test_fit_online_runs_with_watchdog(self, tmp_path):
        """Integration: the default-on watchdog wraps a real tiny run and
        does not misfire on normal progress (incl. compile time)."""
        from galaxy_deconv_tpu.train.online import fit_online

        model = UnrolledADMMGaussian(n_iters=2, features=(4, 8, 8, 8))
        from galaxy_deconv_tpu.data.simulate import simulate_batch

        sample = jax.tree.map(np.asarray, simulate_batch(jax.random.PRNGKey(0), 2, CFG))
        sample["alpha"] = sample["obs"].mean(axis=(1, 2))
        opt = default_optimizer(1e-3)
        state, opt = create_train_state(model, jax.random.PRNGKey(0), sample, opt)
        state, hist = fit_online(model, state, opt, MultiScaleLoss(), n_steps=4, batch_size=2,
                                 sim_cfg=CFG, log_every=0, val_every=0, save_path=None,
                                 stall_timeout_s=600.0)
        assert hist["galaxies_per_sec"] > 0
