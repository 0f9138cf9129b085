"""Analysis & reporting (L6).

Capability parity with reference ``utils/utils_plot.py`` and the
``figures/*.ipynb`` notebooks: method color/label conventions, loss
curves, error-vs-SNR and error-vs-PSF-error figures, and the summary
tables the paper reports — all driven from the same ``results.json``
schema the evaluation harness writes.
"""

from galaxy_deconv_tpu.analysis.report import (
    error_table,
    load_method_results,
    plot_error_vs_snr,
    plot_error_vs_time,
    plot_loss,
    plot_psf_error,
    plot_reconstruction_grid,
    plot_admm_trace,
    plot_batch_with_ellipses,
    psf_error_table,
    summarize_cis,
    summarize_psf_results,
    summarize_psnr_results,
    summarize_results,
)

__all__ = [
    "error_table",
    "load_method_results",
    "plot_error_vs_snr",
    "plot_error_vs_time",
    "plot_loss",
    "plot_psf_error",
    "plot_reconstruction_grid",
    "plot_admm_trace",
    "plot_batch_with_ellipses",
    "psf_error_table",
    "summarize_cis",
    "summarize_psf_results",
    "summarize_psnr_results",
    "summarize_results",
]
