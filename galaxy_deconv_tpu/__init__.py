"""galaxy_deconv_tpu — a TPU-native galaxy image deconvolution framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
Galaxy-Deconv reference (unrolled Plug-and-Play ADMM deconvolution for weak
gravitational lensing; Li & Alexander, MNRAS 522, 2023):

- ``ops``      — Fourier-optics kernels (OTFs, FFT convolution, padded solves),
                 built on batched rfft2/irfft2 and fused by XLA / Pallas.
- ``nets``     — denoiser networks (ResUNet, XDenseUNet) and the SubNet
                 hyperparameter network as flax.linen modules (NHWC).
- ``models``   — the solver zoo: unrolled PnP-ADMM (Gaussian + Poisson),
                 ADMMNet, Tikhonet, Richardson–Lucy, Wiener, passthroughs.
- ``losses``   — MultiScale, MSE, ShapeConstraint, BestEllipse, MomentBased.
- ``metrics``  — PSNR and batched shear estimation (FPFS-style moments in JAX).
- ``data``     — dataset formats, loaders, and an LSST-like simulation
                 pipeline that runs natively in JAX (GalSim optional).
- ``parallel`` — device-mesh / sharding utilities (pjit + shard_map data
                 parallelism over ICI/DCN, multi-host feeding).
- ``train``    — jitted train step, optax optimization, orbax checkpointing.
- ``eval``     — fully batched shear / timing / PSF-robustness harness with
                 the reference results.json schema.

Everything on the compute path is pure-functional and jit-compatible with
static shapes; iteration counts are static and unrolled via ``lax.scan``.
"""

__version__ = "0.1.0"
