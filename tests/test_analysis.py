"""Analysis/reporting layer tests on synthetic results.json files."""

import json

import numpy as np
import pytest

from galaxy_deconv_tpu.analysis import (
    error_table,
    plot_error_vs_snr,
    plot_error_vs_time,
    plot_loss,
    summarize_results,
)


@pytest.fixture(scope="module")
def results_dir(tmp_path_factory, rng):
    root = tmp_path_factory.mktemp("results")
    gt = rng.normal(0.1, 0.05, (50, 3)).round(4)
    for method, noise in [("No_Deconv", 0.05), ("Richard-Lucy(30)", 0.02)]:
        d = root / method
        d.mkdir()
        res = {}
        for snr in (20, 100):
            rec = gt + rng.normal(0, noise, gt.shape)
            res[str(snr)] = {"rec_shear": rec.tolist()}
            if method == "No_Deconv":
                res[str(snr)]["gt_shear"] = gt.tolist()
        res["time"] = [2.0, 50]
        with open(d / "results.json", "w") as f:
            json.dump(res, f)
    return root


class TestReport:
    def test_error_table(self, results_dir):
        t = error_table(results_dir, ["No_Deconv", "Richard-Lucy(30)"], snrs=(20, 100))
        assert t["Richard-Lucy(30)"][100] < t["No_Deconv"][100]
        assert t["No_Deconv"]["time_per_gal"] == pytest.approx(0.04)

    def test_summarize_markdown(self, results_dir):
        md = summarize_results(results_dir, ["No_Deconv", "Richard-Lucy(30)"], snrs=(20, 100))
        assert md.startswith("| Method |")
        assert "Richard-Lucy(30)" in md

    def test_figures_render(self, results_dir, tmp_path):
        plot_error_vs_snr(results_dir, ["No_Deconv", "Richard-Lucy(30)"], snrs=(20, 100),
                          save_to=tmp_path / "a.png")
        plot_error_vs_time(results_dir, ["No_Deconv", "Richard-Lucy(30)"], snr=100,
                           save_to=tmp_path / "b.png")
        out = plot_loss([3, 2, 1], [3, 2.5, 2], 2, tmp_path, "m")
        assert (tmp_path / "a.png").exists() and (tmp_path / "b.png").exists() and out.exists()
