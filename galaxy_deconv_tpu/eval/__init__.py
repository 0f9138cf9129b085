"""Evaluation harness (L5): batched shear / timing / PSF-robustness sweeps.

Capability parity with reference ``test.py`` and ``test_psf.py``, with the
single biggest TPU win by design: the reference loops galaxies at batch
size 1 through the GPU and then the CPU FPFS library
(``test.py:58-87``); here each (method x SNR) cell is a few large batched
device calls — model forward and shear measurement both on-device — and
results are merged into the same ``results.json`` schema
(``{"<snr>": {"rec_shear": [[g1,g2,g],...], "gt_shear": ...}, "time": [secs, n]}``)
so the reference's figure notebooks can consume them unchanged.
"""

from galaxy_deconv_tpu.eval.harness import (
    DEFAULT_PSF_ERRS,
    median_ellipticity_error,
    run_psf_error_test,
    run_psnr_test,
    run_shear_test,
    run_time_test,
)

__all__ = [
    "DEFAULT_PSF_ERRS",
    "median_ellipticity_error",
    "run_psf_error_test",
    "run_psnr_test",
    "run_shear_test",
    "run_time_test",
]
