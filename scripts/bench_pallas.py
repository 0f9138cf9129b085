"""Microbenchmark: XLA vs Pallas x-update path, and fp32 vs bf16 denoiser.

Run on the TPU:  python scripts/bench_pallas.py [--batch 1024]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def timeit(fn, *args, repeats=20):
    out = fn(*args)
    import jax

    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(repeats):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / repeats


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=1024)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from galaxy_deconv_tpu.models import UnrolledADMMGaussian
    from galaxy_deconv_tpu.models.unrolled_admm_gaussian import gaussian_spectra, x_update
    from galaxy_deconv_tpu.ops.pallas_kernels import x_update_batch_last

    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    B = args.batch
    y = jnp.asarray(np.abs(rng.standard_normal((B, 48, 48))).astype(np.float32))
    psf = jnp.asarray(np.abs(rng.standard_normal((B, 48, 48))).astype(np.float32) / 100)
    z = y * 0.5
    u = jnp.zeros_like(y)
    rho = jnp.ones((B, 1, 1))

    Y, Ht, HtH = gaussian_spectra(y, psf)
    f_xla = jax.jit(lambda *a: x_update(*a, (48, 48), "xla"))
    f_pls = jax.jit(lambda *a: x_update_batch_last(*a, (96, 96)))
    t_xla = timeit(f_xla, Y, Ht, HtH, z, u, rho)
    t_pls = timeit(f_pls, Y, Ht, HtH, z, u, rho)
    print(f"x-update  XLA: {t_xla*1e3:.3f} ms   Pallas: {t_pls*1e3:.3f} ms   ({t_xla/t_pls:.2f}x)")

    alpha = jnp.full((B,), 50.0)
    for dtype in (jnp.float32, jnp.bfloat16):
        model = UnrolledADMMGaussian(n_iters=8, features=(32, 64, 128, 256), dtype=dtype)
        v = model.init(jax.random.PRNGKey(0), y[:1], psf[:1], alpha[:1])
        fwd = jax.jit(lambda o, p, a: model.apply(v, o, p, a))
        t = timeit(fwd, y, psf, alpha, repeats=10)
        print(f"ADMM8 forward {dtype.__name__}: {t*1e3:.1f} ms/batch = {B/t:.0f} gal/s")


if __name__ == "__main__":
    main()
