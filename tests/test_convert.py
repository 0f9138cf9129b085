"""Weight-transplant parity: reference torch checkpoints forwarded through
this framework must reproduce the reference's outputs.

These tests run the *reference implementation itself* (read-only, via
torch CPU) as the oracle, so they require /root/reference; they skip
cleanly elsewhere.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref_path():
    import pathlib

    if not pathlib.Path(REFERENCE).exists():
        pytest.skip("reference repo not available")
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    return REFERENCE


@pytest.fixture(scope="module")
def stamp(ref_path):
    obs = torch.load(f"{ref_path}/tutorials/obs.pth")
    psf = torch.load(f"{ref_path}/tutorials/psf.pth")
    return obs.numpy(), psf.numpy(), float(obs.mean())


class TestConvTransposeLayout:
    def test_matches_torch(self, rng):
        """flax ConvTranspose(k2 s2) with the converted kernel == torch ConvTranspose2d."""
        import jax
        import jax.numpy as jnp

        from galaxy_deconv_tpu.nets.blocks import UpConvTranspose
        from galaxy_deconv_tpu.utils.convert_torch import conv_transpose_kernel

        x = rng.standard_normal((1, 3, 6, 6)).astype(np.float32)
        tconv = torch.nn.ConvTranspose2d(3, 5, 2, stride=2, bias=False)
        with torch.no_grad():
            want = tconv(torch.from_numpy(x)).numpy()

        mod = UpConvTranspose(5)
        v = {"params": {"ConvTranspose_0": {"kernel": conv_transpose_kernel(tconv.weight)}}}
        got = np.asarray(mod.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-5)


class TestTikhonetTransplant:
    pytestmark = pytest.mark.slow

    def test_shipped_weights_forward_parity(self, ref_path, stamp):
        """The shipped Tikhonet_Laplacian checkpoint must produce the same
        reconstruction through both frameworks (eval-mode BN)."""
        import jax.numpy as jnp

        from models.Tikhonet import Tikhonet as TorchTikhonet  # reference

        from galaxy_deconv_tpu.models import Tikhonet
        from galaxy_deconv_tpu.utils import load_reference_tikhonet

        obs, psf, alpha = stamp
        pth = f"{ref_path}/saved_models/Tikhonet_Laplacian_50epochs.pth"

        tmodel = TorchTikhonet(filter="Laplacian")
        tmodel.load_state_dict(torch.load(pth, map_location="cpu"))
        tmodel.eval()
        with torch.no_grad():
            want = (
                tmodel(
                    torch.from_numpy(obs).view(1, 1, 48, 48),
                    torch.from_numpy(psf).view(1, 1, 48, 48),
                    torch.tensor(alpha).view(1, 1, 1, 1),
                )
                .squeeze()
                .numpy()
            )

        variables = load_reference_tikhonet(pth)
        jmodel = Tikhonet(filter="Laplacian")
        got = np.asarray(
            jmodel.apply(variables, jnp.asarray(obs[None]), jnp.asarray(psf[None]), jnp.asarray([alpha]))
        )[0]

        scale = np.abs(want).max()
        np.testing.assert_allclose(got, want, atol=2e-3 * scale)


# ---------------------------------------------------------------------------
# Seeded whole-model transplants (VERDICT r1 items 2-3): fill the *reference*
# torch model with deterministic weights, convert its state_dict, and assert
# the JAX forward reproduces the torch forward on real tutorial stamps.
# ---------------------------------------------------------------------------


def _fill_torch_params(module, seed: int, gain: float = 0.2):
    """Deterministically fill a torch module's params/buffers from numpy.

    Conv/Linear weights get damped kaiming-scale normals (``gain`` < 1):
    full kaiming scale makes the 16-ResBlock denoisers amplify inputs by
    ~2^16, at which point fp32 conv-order differences between XLA and torch
    swamp the layout-parity signal this test is after.  BN running stats get
    realistic (non-identity) values so eval-mode BN is actually exercised.
    """
    rng = np.random.default_rng(seed)
    sd = module.state_dict()
    new = {}
    for k, t in sd.items():
        if k.endswith("num_batches_tracked"):
            new[k] = t
            continue
        shape = tuple(t.shape)
        if k.endswith("running_var"):
            arr = rng.uniform(0.5, 1.5, shape)
        elif k.endswith("running_mean"):
            arr = rng.normal(0.0, 0.1, shape)
        elif k.endswith(".bias") or len(shape) <= 1:
            arr = rng.normal(0.0, 0.05, shape)
        else:
            fan_in = int(np.prod(shape[1:]))
            arr = rng.normal(0.0, gain * np.sqrt(2.0 / max(fan_in, 1)), shape)
        new[k] = torch.from_numpy(arr.astype(np.float32))
    module.load_state_dict(new)
    module.eval()
    return module


@pytest.fixture(scope="module")
def stamp_batch(stamp):
    """(2, 48, 48) batch: the tutorial stamp and a flipped variant."""
    obs, psf, alpha = stamp
    obs2 = np.stack([obs, obs[::-1, ::-1].copy()])
    psf2 = np.stack([psf, psf[::-1, ::-1].copy()])
    alpha2 = obs2.mean(axis=(1, 2))
    return obs2.astype(np.float32), psf2.astype(np.float32), alpha2.astype(np.float32)


def _torch_forward(tmodel, obs, psf, alpha):
    with torch.no_grad():
        out = tmodel(
            torch.from_numpy(obs).unsqueeze(1),
            torch.from_numpy(psf).unsqueeze(1),
            torch.from_numpy(alpha).view(-1, 1, 1, 1),
        )
    return out.squeeze(1).numpy()


class TestSubNetTransplant:
    def test_seeded_forward_parity(self, ref_path, stamp_batch):
        """Reference SubNet (PSF power spectrum -> CNN -> MLP -> rho schedule)
        vs nets.SubNet with converted weights, incl. the CHW->HWC column
        permutation of the first Linear (reference unrolled_admm_gaussian.py:43-71)."""
        import jax.numpy as jnp

        from models.unrolled_admm_gaussian import SubNet as TorchSubNet  # reference

        from galaxy_deconv_tpu.nets import SubNet
        from galaxy_deconv_tpu.utils.convert_torch import convert_subnet_state_dict

        obs, psf, alpha = stamp_batch
        tnet = _fill_torch_params(TorchSubNet(8), seed=7)
        with torch.no_grad():
            want = tnet(torch.from_numpy(psf).unsqueeze(1), torch.from_numpy(alpha).view(-1, 1, 1, 1))
        want = want.view(want.shape[0], -1).numpy()

        params, stats = convert_subnet_state_dict(tnet.state_dict())
        got = np.asarray(
            SubNet(n_outputs=8).apply(
                {"params": params, "batch_stats": stats}, jnp.asarray(psf), jnp.asarray(alpha)
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


class TestFlagshipTransplant:
    pytestmark = pytest.mark.slow

    def test_seeded_forward_parity(self, ref_path, stamp_batch):
        """Whole UnrolledADMMGaussian(8): reference forward vs converted JAX
        forward on tutorial stamps (reference unrolled_admm_gaussian.py:117-152)."""
        import jax.numpy as jnp

        from models.unrolled_admm_gaussian import UnrolledADMMGaussian as TorchADMM  # reference

        from galaxy_deconv_tpu.models import UnrolledADMMGaussian
        from galaxy_deconv_tpu.utils.convert_torch import convert_unrolled_admm_gaussian_state_dict

        obs, psf, alpha = stamp_batch
        tmodel = _fill_torch_params(TorchADMM(n_iters=8), seed=11)
        want = _torch_forward(tmodel, obs, psf, alpha)

        variables = convert_unrolled_admm_gaussian_state_dict(tmodel.state_dict())
        jmodel = UnrolledADMMGaussian(n_iters=8, features=(32, 64, 128, 256))
        got = np.asarray(
            jmodel.apply(variables, jnp.asarray(obs), jnp.asarray(psf), jnp.asarray(alpha))
        )
        scale = np.abs(want).max()
        np.testing.assert_allclose(got, want, atol=2e-3 * scale)


class TestPoissonTransplant:
    pytestmark = pytest.mark.slow

    @pytest.mark.parametrize("llh", ["Poisson", "Gaussian"])
    def test_seeded_forward_parity(self, ref_path, stamp_batch, llh):
        """Two-dual Unrolled_ADMM (reference models/Unrolled_ADMM.py:153-216)
        with converted SubNet(2n) + ResUNet(64..512) weights."""
        import jax.numpy as jnp

        from models.Unrolled_ADMM import Unrolled_ADMM as TorchADMM  # reference

        from galaxy_deconv_tpu.models import UnrolledADMM
        from galaxy_deconv_tpu.utils.convert_torch import convert_unrolled_admm_state_dict

        obs, psf, alpha = stamp_batch
        tmodel = _fill_torch_params(TorchADMM(n_iters=4, llh=llh), seed=13)
        want = _torch_forward(tmodel, obs, psf, alpha)

        variables = convert_unrolled_admm_state_dict(tmodel.state_dict())
        jmodel = UnrolledADMM(n_iters=4, llh=llh)
        got = np.asarray(
            jmodel.apply(variables, jnp.asarray(obs), jnp.asarray(psf), jnp.asarray(alpha))
        )
        scale = np.abs(want).max()
        np.testing.assert_allclose(got, want, atol=2e-3 * scale)


class TestADMMNetTransplant:
    pytestmark = pytest.mark.slow

    def test_seeded_forward_parity(self, ref_path, stamp_batch, tmp_path):
        """ADMMNet (fixed rho=0.5, frozen denoiser; reference models/ADMMNet.py:78-129)
        with a seeded frozen ResUNet supplied via the reference's model_file path."""
        import jax.numpy as jnp

        from models.ADMMNet import ADMMNet as TorchADMMNet  # reference
        from models.ResUNet import ResUNet as TorchResUNet  # reference

        from galaxy_deconv_tpu.models import ADMMNet
        from galaxy_deconv_tpu.utils.convert_torch import convert_admmnet_state_dict

        obs, psf, alpha = stamp_batch
        den = _fill_torch_params(TorchResUNet(), seed=17)
        pth = tmp_path / "denoiser.pth"
        torch.save(den.state_dict(), pth)

        tmodel = TorchADMMNet(n_iters=4, llh="Poisson", model_file=str(pth))
        tmodel.eval()
        want = _torch_forward(tmodel, obs, psf, alpha)

        variables = convert_admmnet_state_dict(tmodel.state_dict())
        jmodel = ADMMNet(n_iters=4, llh="Poisson")
        got = np.asarray(
            jmodel.apply(variables, jnp.asarray(obs), jnp.asarray(psf), jnp.asarray(alpha))
        )
        scale = np.abs(want).max()
        np.testing.assert_allclose(got, want, atol=2e-3 * scale)
