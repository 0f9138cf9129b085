"""Data pipeline (L2): simulation, dataset formats, loaders.

- :mod:`simulate` — LSST-like galaxy/PSF simulation natively in JAX
  (capability parity with reference ``generate_data.py``; GalSim stays an
  optional offline path via :mod:`generate_galsim`).
- :mod:`dataset` — packed-shard dataset, info.json-compatible splits,
  reference ``.pth``-folder reader, batched loaders with per-host sharding.
"""

from galaxy_deconv_tpu.data.dataset import (
    GalaxyDataset,
    generate_dataset,
    generate_dataset_denoise,
    iterate_batches,
    load_reference_pth_dataset,
)
from galaxy_deconv_tpu.data.simulate import (
    CCD,
    SimulationConfig,
    noise_sigma,
    simulate_batch,
)

__all__ = [
    "CCD",
    "GalaxyDataset",
    "SimulationConfig",
    "generate_dataset",
    "generate_dataset_denoise",
    "iterate_batches",
    "load_reference_pth_dataset",
    "noise_sigma",
    "simulate_batch",
]
