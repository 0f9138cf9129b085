"""Solver zoo tests: golden parity with the reference on real stamps,
closed-form identities, shapes, gradients, and the analysis trace mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from galaxy_deconv_tpu.models import (
    ADMMNet,
    NoDeconv,
    RichardsonLucy,
    Tikhonet,
    UnrolledADMM,
    UnrolledADMMGaussian,
    Wiener,
    build_model,
)


@pytest.fixture(scope="module")
def stamps(fixtures_dir):
    d = np.load(fixtures_dir / "solver_goldens.npz")
    return {k: d[k] for k in d.files}


def batchify(a):
    return jnp.asarray(a)[None]


class TestWiener:
    def test_golden_parity(self, stamps):
        model = Wiener()
        v = model.init(jax.random.PRNGKey(0), batchify(stamps["obs"]), batchify(stamps["psf"]), jnp.asarray([stamps["alpha"]]))
        rec = np.asarray(model.apply(v, batchify(stamps["obs"]), batchify(stamps["psf"]), jnp.asarray([stamps["alpha"]])))[0]
        scale = np.abs(stamps["wiener"]).max()
        np.testing.assert_allclose(rec, stamps["wiener"], atol=2e-4 * scale)

    def test_delta_psf_closed_form(self, rng):
        obs = jnp.asarray(rng.standard_normal((2, 48, 48)).astype(np.float32))
        psf = np.zeros((2, 48, 48), np.float32)
        psf[:, 24, 24] = 1.0
        alpha = jnp.asarray([2.0, 5.0])
        model = Wiener()
        v = model.init(jax.random.PRNGKey(0), obs, jnp.asarray(psf), alpha)
        rec = np.asarray(model.apply(v, obs, jnp.asarray(psf), alpha))
        want = np.asarray(obs) * (np.array([2.0, 5.0]) / (np.array([2.0, 5.0]) + 350.0))[:, None, None]
        np.testing.assert_allclose(rec, want, rtol=1e-4, atol=1e-5)


class TestRichardsonLucy:
    @pytest.mark.parametrize("n_iters,key", [(10, "rl10"), (30, "rl30")])
    def test_golden_parity(self, stamps, n_iters, key):
        model = RichardsonLucy(n_iters=n_iters)
        v = model.init(jax.random.PRNGKey(0), batchify(stamps["obs"]), batchify(stamps["psf"]))
        rec = np.asarray(model.apply(v, batchify(stamps["obs"]), batchify(stamps["psf"])))[0]
        scale = np.abs(stamps[key]).max()
        np.testing.assert_allclose(rec, stamps[key], atol=5e-4 * scale)

    def test_delta_psf_is_identity(self, rng):
        obs = jnp.asarray(np.abs(rng.standard_normal((1, 48, 48))).astype(np.float32))
        psf = np.zeros((1, 48, 48), np.float32)
        psf[:, 24, 24] = 1.0
        model = RichardsonLucy(n_iters=5)
        v = model.init(jax.random.PRNGKey(0), obs, jnp.asarray(psf))
        rec = np.asarray(model.apply(v, obs, jnp.asarray(psf)))
        np.testing.assert_allclose(rec, np.asarray(obs), rtol=1e-3, atol=1e-4)


class TestUnrolledADMMGaussian:
    @pytest.fixture(scope="class")
    def small_model(self):
        return UnrolledADMMGaussian(n_iters=2, features=(8, 16, 32, 64))

    @pytest.fixture(scope="class")
    def vars_(self, small_model, stamps):
        return small_model.init(
            jax.random.PRNGKey(0), batchify(stamps["obs"]), batchify(stamps["psf"]), jnp.asarray([stamps["alpha"]])
        )

    def test_forward_shape_finite(self, small_model, vars_, stamps):
        rec = small_model.apply(vars_, batchify(stamps["obs"]), batchify(stamps["psf"]), jnp.asarray([stamps["alpha"]]))
        assert rec.shape == (1, 48, 48)
        assert np.isfinite(np.asarray(rec)).all()

    def test_has_batch_stats_from_subnet(self, vars_):
        assert "batch_stats" in vars_

    def test_analysis_traces(self, vars_, stamps):
        model = UnrolledADMMGaussian(n_iters=2, features=(8, 16, 32, 64), analysis=True)
        out = model.apply(vars_, batchify(stamps["obs"]), batchify(stamps["psf"]), jnp.asarray([stamps["alpha"]]))
        assert set(out) == {"x", "z", "u", "rho"}
        assert out["x"].shape == (1, 2, 48, 48)
        assert out["rho"].shape == (1, 2, 1, 1)

    def test_bounded_rho_variant(self, stamps):
        """rho_bounds squashes the SubNet schedule into [lo, hi] so every
        unrolled iteration stays active (anti-degeneracy training variant)."""
        model = UnrolledADMMGaussian(
            n_iters=2, features=(8, 16, 32, 64), rho_bounds=(0.1, 10.0), analysis=True
        )
        v = model.init(
            jax.random.PRNGKey(0), batchify(stamps["obs"]), batchify(stamps["psf"]), jnp.asarray([stamps["alpha"]])
        )
        out = model.apply(v, batchify(stamps["obs"]), batchify(stamps["psf"]), jnp.asarray([stamps["alpha"]]))
        rho = np.asarray(out["rho"])
        assert (rho >= 0.1).all() and (rho <= 10.0).all()

    def test_no_subnet_variant(self, stamps):
        model = UnrolledADMMGaussian(n_iters=2, features=(8, 16, 32, 64), subnet=False)
        v = model.init(jax.random.PRNGKey(0), batchify(stamps["obs"]), batchify(stamps["psf"]), jnp.asarray([stamps["alpha"]]))
        assert v["params"]["rho_iters"].shape == (2,)
        rec = model.apply(v, batchify(stamps["obs"]), batchify(stamps["psf"]), jnp.asarray([stamps["alpha"]]))
        assert np.isfinite(np.asarray(rec)).all()

    @pytest.mark.slow
    def test_gradients_flow(self, small_model, vars_, stamps):
        obs = batchify(stamps["obs"])
        psf = batchify(stamps["psf"])
        alpha = jnp.asarray([stamps["alpha"]])
        gt = batchify(stamps["gt"])

        def loss(params):
            rec = small_model.apply({"params": params, "batch_stats": vars_["batch_stats"]}, obs, psf, alpha)
            return jnp.mean((rec - gt) ** 2)

        g = jax.grad(loss)(vars_["params"])
        norms = [float(jnp.linalg.norm(x)) for x in jax.tree.leaves(g)]
        assert all(np.isfinite(norms))
        assert max(norms) > 0


class TestUnrolledADMMPoisson:
    @pytest.mark.parametrize("llh", ["Poisson", "Gaussian"])
    def test_forward(self, stamps, llh):
        model = UnrolledADMM(n_iters=2, llh=llh, features=(8, 16, 32, 64))
        obs = batchify(stamps["obs"])
        psf = batchify(stamps["psf"])
        alpha = jnp.asarray([stamps["alpha"]])
        v = model.init(jax.random.PRNGKey(0), obs, psf, alpha)
        rec = model.apply(v, obs, psf, alpha)
        assert rec.shape == (1, 48, 48)
        assert np.isfinite(np.asarray(rec)).all()

    def test_soft_threshold_variant(self, stamps):
        model = UnrolledADMM(n_iters=2, pnp=False, subnet=False)
        obs = batchify(stamps["obs"])
        psf = batchify(stamps["psf"])
        alpha = jnp.asarray([stamps["alpha"]])
        v = model.init(jax.random.PRNGKey(0), obs, psf, alpha)
        rec = model.apply(v, obs, psf, alpha)
        assert np.isfinite(np.asarray(rec)).all()


class TestOtherSolvers:
    def test_admmnet(self, stamps):
        model = ADMMNet(n_iters=2, features=(8, 16, 32, 64))
        obs = batchify(stamps["obs"])
        psf = batchify(stamps["psf"])
        alpha = jnp.asarray([stamps["alpha"]])
        v = model.init(jax.random.PRNGKey(0), obs, psf, alpha)
        rec = model.apply(v, obs, psf, alpha)
        assert rec.shape == (1, 48, 48) and np.isfinite(np.asarray(rec)).all()

    def test_admmnet_scaled_variant(self, stamps):
        """denoiser_scale='adu' feeds the frozen denoiser training-scale
        inputs: identical to the reference path at alpha=1, different (and
        finite) at real alpha (see models/admmnet.py docstring)."""
        from galaxy_deconv_tpu.models import build_model

        obs = batchify(stamps["obs"])
        psf = batchify(stamps["psf"])
        ref = ADMMNet(n_iters=2, features=(8, 16, 32, 64))
        scaled = build_model("ADMMNet_scaled", n_iters=2, features=(8, 16, 32, 64))
        assert scaled.denoiser_scale == "adu"
        v = ref.init(jax.random.PRNGKey(0), obs, psf, jnp.asarray([1.0]))

        one = jnp.asarray([1.0])
        np.testing.assert_allclose(
            np.asarray(ref.apply(v, obs, psf, one)),
            np.asarray(scaled.apply(v, obs, psf, one)),
            rtol=1e-6, atol=1e-6,
        )
        a = jnp.asarray([stamps["alpha"]])
        r1 = np.asarray(ref.apply(v, obs, psf, a))
        r2 = np.asarray(scaled.apply(v, obs, psf, a))
        assert np.isfinite(r2).all()
        assert not np.allclose(r1, r2)

    def test_poisson_prox_stationarity(self):
        """v_update_poisson_exact solves rho*(v - v_tilde) + alpha - y/v = 0
        (the true Poisson-NLL prox); the reference's v_update_poisson does
        not — it takes the wrong quadratic root, returning ~alpha/rho at
        realistic scales (the constant plane documented in RESULTS.md)."""
        from galaxy_deconv_tpu.models.unrolled_admm import (
            v_update_poisson,
            v_update_poisson_exact,
        )

        rng = np.random.default_rng(0)
        v_tilde = jnp.asarray(rng.uniform(0.0, 1.0, (16,)))
        y = jnp.asarray(rng.uniform(0.0, 100.0, (16,)))
        rho, alpha = 0.5, 50.0
        v = np.asarray(v_update_poisson_exact(v_tilde, y, rho, alpha))
        resid = rho * (v - np.asarray(v_tilde)) + alpha - np.asarray(y) / v
        np.testing.assert_allclose(resid, 0.0, atol=1e-4 * alpha)  # fp32 roundoff on O(alpha) terms
        v_ref = np.asarray(v_update_poisson(v_tilde, y, rho, alpha))
        # the reference root sits near alpha/rho regardless of y — the
        # origin of ADMMNet's alpha-scaled pedestal
        assert np.all(v_ref > 0.9 * alpha / rho)

    def test_poisson_prox_exact_background_precision(self):
        """The conjugate-root form keeps full relative precision on
        background pixels (y << alpha, v_tilde ~ 0), where the direct root
        t1 + sqrt(t1^2 + 4 y rho) cancels catastrophically in fp32: the
        exact answer there is ~y/alpha, and y = 0 must give exactly 0."""
        from galaxy_deconv_tpu.models.unrolled_admm import v_update_poisson_exact

        rho, alpha = jnp.asarray(1e-3), jnp.asarray(50.0)
        y = jnp.asarray([0.0, 1e-4, 1e-2, 1.0])
        v = np.asarray(v_update_poisson_exact(jnp.zeros_like(y), y, rho, alpha))
        expect = np.asarray(y) / 50.0  # v ~ y/alpha when rho*v_tilde << alpha
        np.testing.assert_allclose(v, expect, rtol=1e-5)
        assert v[0] == 0.0

    def test_admmnet_fixed_kills_pedestal(self, stamps):
        """With the exact prox, ADMMNet's empty-sky border stays near zero;
        with the reference v-update it sits at an O(alpha)-scaled offset."""
        from galaxy_deconv_tpu.models import build_model

        obs = batchify(stamps["obs"])
        psf = batchify(stamps["psf"])
        a = jnp.asarray([stamps["alpha"]])
        ref = ADMMNet(n_iters=2, features=(8, 16, 32, 64))
        fixed = build_model("ADMMNet_fixed", n_iters=2, features=(8, 16, 32, 64))
        v = ref.init(jax.random.PRNGKey(0), obs, psf, a)
        border = lambda r: float(np.abs(np.asarray(r)[0, :3, :] / np.asarray(a)).mean())
        b_ref = border(ref.apply(v, obs, psf, a))
        b_fix = border(fixed.apply(v, obs, psf, a))
        assert b_fix < 0.2 * b_ref, (b_fix, b_ref)

    def test_tikhonet(self, stamps):
        model = Tikhonet(filter="Laplacian")
        obs = batchify(stamps["obs"])
        psf = batchify(stamps["psf"])
        alpha = jnp.asarray([stamps["alpha"]])
        v = model.init(jax.random.PRNGKey(0), obs, psf, alpha)
        rec = model.apply(v, obs, psf, alpha)
        assert rec.shape == (1, 48, 48) and np.isfinite(np.asarray(rec)).all()

    def test_no_deconv(self, stamps):
        model = NoDeconv()
        obs = batchify(stamps["obs"])
        v = model.init(jax.random.PRNGKey(0), obs, obs, jnp.ones((1,)))
        np.testing.assert_array_equal(np.asarray(model.apply(v, obs, obs, jnp.ones((1,)))), np.asarray(obs))


class TestRegistry:
    def test_suffix_parsing(self):
        m = build_model("Richard-Lucy(30)")
        assert isinstance(m, RichardsonLucy) and m.n_iters == 30
        m = build_model("Unrolled_ADMM_Gaussian(8)", features=(8, 16, 32, 64))
        assert isinstance(m, UnrolledADMMGaussian) and m.n_iters == 8

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            build_model("NotAModel")

    def test_poisson_and_shapenet_names(self):
        """The benchmark-matrix names build the right solvers: Unrolled_ADMM(n)
        is the two-dual Poisson variant with the reference's denoiser widths
        (models/Unrolled_ADMM.py:131-139); ShapeNet is a Laplacian Tikhonet."""
        from galaxy_deconv_tpu.models import Tikhonet, UnrolledADMM

        m = build_model("Unrolled_ADMM(8)")
        assert isinstance(m, UnrolledADMM)
        assert m.llh == "Poisson" and m.n_iters == 8 and tuple(m.features) == (64, 128, 256, 512)
        s = build_model("ShapeNet")
        assert isinstance(s, Tikhonet) and s.filter == "Laplacian"
        t = build_model("Tikhonet")
        assert isinstance(t, Tikhonet) and t.filter == "Identity"


class TestBf16Path:
    def test_bf16_compute_returns_fp32_finite(self, stamps):
        import jax.numpy as jnp2

        model = UnrolledADMMGaussian(n_iters=2, features=(8, 16, 32, 64), dtype=jnp2.bfloat16)
        obs = batchify(stamps["obs"])
        psf = batchify(stamps["psf"])
        alpha = jnp.asarray([stamps["alpha"]])
        v = model.init(jax.random.PRNGKey(0), obs, psf, alpha)
        rec = model.apply(v, obs, psf, alpha)
        assert rec.dtype == jnp2.float32
        assert np.isfinite(np.asarray(rec)).all()
