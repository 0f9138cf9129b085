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
