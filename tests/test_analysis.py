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
        if method == "Richard-Lucy(30)":
            # PSF-robustness sweep: error grows with the PSF perturbation
            psf_res = {str(e): {"rec_shear": (gt + rng.normal(0, e, gt.shape)).tolist()}
                       for e in (0.01, 0.2)}
            with open(d / "results_psf_shear_err.json", "w") as f:
                json.dump(psf_res, f)
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

    def test_psf_error_table(self, results_dir):
        from galaxy_deconv_tpu.analysis import psf_error_table, summarize_psf_results

        t = psf_error_table(results_dir, ["Richard-Lucy(30)", "No_Deconv"], errs=(0.01, 0.2),
                            kind="shear", gt_snr=100)
        # No_Deconv has no PSF sweep file -> silently omitted
        assert list(t) == ["Richard-Lucy(30)"]
        assert t["Richard-Lucy(30)"][0.01] < t["Richard-Lucy(30)"][0.2]
        md = summarize_psf_results(results_dir, ["Richard-Lucy(30)"], errs=(0.01, 0.2))
        assert md.startswith("| Method |") and "0.2" in md.splitlines()[0]

    def test_figures_render(self, results_dir, tmp_path):
        plot_error_vs_snr(results_dir, ["No_Deconv", "Richard-Lucy(30)"], snrs=(20, 100),
                          save_to=tmp_path / "a.png")
        plot_error_vs_time(results_dir, ["No_Deconv", "Richard-Lucy(30)"], snr=100,
                           save_to=tmp_path / "b.png")
        out = plot_loss([3, 2, 1], [3, 2.5, 2], 2, tmp_path, "m")
        assert (tmp_path / "a.png").exists() and (tmp_path / "b.png").exists() and out.exists()


class TestGalleryAndTrace:
    def test_reconstruction_grid(self, rng, tmp_path):
        from galaxy_deconv_tpu.analysis import plot_reconstruction_grid

        obs = rng.standard_normal((3, 48, 48)).astype(np.float32)
        out = tmp_path / "grid.jpg"
        plot_reconstruction_grid({"observed": obs, "gt": obs * 0.5}, save_to=str(out))
        assert out.exists() and out.stat().st_size > 0

    @pytest.mark.slow
    def test_admm_trace_figure(self, rng, tmp_path):
        """End to end: run the flagship in analysis mode, plot its trace."""
        import jax
        import jax.numpy as jnp

        from galaxy_deconv_tpu.analysis import plot_admm_trace
        from galaxy_deconv_tpu.models import UnrolledADMMGaussian

        obs = jnp.abs(jnp.asarray(rng.standard_normal((2, 48, 48)).astype(np.float32))) * 20
        psf = jnp.abs(jnp.asarray(rng.standard_normal((2, 48, 48)).astype(np.float32)))
        psf = psf / psf.sum(axis=(1, 2), keepdims=True)
        alpha = jnp.full((2,), 50.0)
        model = UnrolledADMMGaussian(n_iters=2, features=(4, 8, 8, 8), analysis=True)
        variables = model.init(jax.random.PRNGKey(0), obs, psf, alpha)
        traces = model.apply(variables, obs, psf, alpha)
        assert traces["x"].shape == (2, 2, 48, 48)
        out = tmp_path / "trace.jpg"
        plot_admm_trace(traces, save_to=str(out))
        assert out.exists() and out.stat().st_size > 0

    def test_batch_with_ellipses_figure(self, tmp_path):
        """Ellipse-overlay gallery (reference plot_batch_with_ellipses):
        fitted overlay written, and the auto-fit orientation follows the
        galaxy's major axis."""
        from galaxy_deconv_tpu.analysis import plot_batch_with_ellipses

        yy, xx = np.mgrid[0:48, 0:48]
        imgs = np.stack(
            [
                np.exp(-(((xx - 24) / 8.0) ** 2 + ((yy - 24) / 3.0) ** 2)),
                np.exp(-(((xx - 24) / 3.0) ** 2 + ((yy - 24) / 8.0) ** 2)),
            ]
        ).astype(np.float32)
        out = tmp_path / "ellipses.png"
        plot_batch_with_ellipses(imgs, save_to=str(out))
        assert out.exists() and out.stat().st_size > 0

        import jax.numpy as jnp

        from galaxy_deconv_tpu.losses.best_ellipse import ellipse_params, min_max_normalize

        p = np.asarray(ellipse_params(min_max_normalize(jnp.asarray(imgs)), 0.5))

        def major_axis_dir(cy, cx, theta, a, b):
            # a-axis rotates from row toward col by theta
            d = np.array([np.cos(theta), np.sin(theta)]) if a >= b else np.array(
                [-np.sin(theta), np.cos(theta)]
            )
            return np.abs(d)  # (|row|, |col|) components

        d0 = major_axis_dir(*p[0])
        d1 = major_axis_dir(*p[1])
        assert d0[1] > 0.9  # first galaxy: major axis along columns
        assert d1[0] > 0.9  # second: along rows


class TestBootstrapCI:
    def test_ci_brackets_point_and_tightens(self, tmp_path):
        import json

        from galaxy_deconv_tpu.analysis import summarize_cis
        from galaxy_deconv_tpu.analysis.report import bootstrap_ci

        rng = np.random.default_rng(0)
        gt = np.zeros((400, 3)); gt[:, 2] = 0.3
        rec = gt + rng.normal(0, 0.05, gt.shape)
        p, lo, hi = bootstrap_ci(rec, gt, n_boot=500)
        assert lo <= p <= hi and 0.01 < p < 0.1
        # 4x the sample -> narrower interval
        gt4 = np.tile(gt, (4, 1)); rec4 = gt4 + rng.normal(0, 0.05, gt4.shape)
        _, lo4, hi4 = bootstrap_ci(rec4, gt4, n_boot=500)
        assert (hi4 - lo4) < (hi - lo)

        # markdown summary over a results dir
        for m in ("No_Deconv", "M"):
            d = tmp_path / m; d.mkdir()
            payload = {"20": {"rec_shear": rec.tolist(), "gt_shear": gt.tolist()}}
            (d / "results.json").write_text(json.dumps(payload))
        table = summarize_cis(tmp_path, ["M", "missing_method"], snrs=(20, 100))
        assert "| M |" in table and "[" in table and "missing_method" not in table


class TestProvenanceGuards:
    """Dataset-provenance stamping: per-entry stamps, stale-row dropping on
    dataset change (advisor round-3 medium finding), per-cell report guards."""

    def _write(self, d, payload):
        import json

        d.mkdir(parents=True, exist_ok=True)
        (d / "results.json").write_text(json.dumps(payload))

    def test_merge_drops_stale_entries_on_dataset_change(self, tmp_path):
        from galaxy_deconv_tpu.eval.harness import _load_results, _merge_write

        path = tmp_path / "M" / "results.json"
        _merge_write(path, {"20": {"rec_shear": [[0, 0, 0.1]], "data_root": "dsA"},
                            "meta": {"data_root": "dsA"}}, data_root="dsA")
        # a re-sweep over a new dataset killed mid-method: the first leg of
        # the new sweep must purge the old dataset's rows, not co-exist with
        # them under the refreshed file-level stamp
        _merge_write(path, {"40": {"rec_shear": [[0, 0, 0.2]], "data_root": "dsB"},
                            "meta": {"data_root": "dsB"}}, data_root="dsB")
        res = _load_results(path)
        assert "20" not in res  # stale dsA row dropped
        assert res["40"]["data_root"] == "dsB"
        assert res["meta"]["data_root"] == "dsB"

    def test_merge_keeps_entries_stamped_with_incoming_root(self, tmp_path):
        from galaxy_deconv_tpu.eval.harness import _load_results, _merge_write

        path = tmp_path / "M" / "results.json"
        _merge_write(path, {"20": {"rec_shear": [[0, 0, 0.1]], "data_root": "dsB"},
                            "meta": {"data_root": "dsB"}}, data_root="dsB")
        # simulate a file whose meta still says dsA (e.g. a stale time stamp)
        import json

        res = _load_results(path)
        res["meta"]["data_root"] = "dsA"
        path.write_text(json.dumps(res))
        _merge_write(path, {"40": {"rec_shear": [[0, 0, 0.2]], "data_root": "dsB"},
                            "meta": {"data_root": "dsB"}}, data_root="dsB")
        res = _load_results(path)
        assert "20" in res  # already stamped dsB: survives the dsA->dsB flip

    def test_report_guards_are_per_cell(self, tmp_path):
        from galaxy_deconv_tpu.analysis.report import error_table

        shear = [[0.0, 0.0, 0.3]] * 4
        self._write(tmp_path / "No_Deconv",
                    {"20": {"rec_shear": shear, "gt_shear": shear, "data_root": "dsB"},
                     "40": {"rec_shear": shear, "gt_shear": shear, "data_root": "dsB"},
                     "meta": {"data_root": "dsB"}})
        # method row: snr 20 swept on dsB, snr 40 stale from dsA
        self._write(tmp_path / "M",
                    {"20": {"rec_shear": shear, "data_root": "dsB"},
                     "40": {"rec_shear": shear, "data_root": "dsA"},
                     "meta": {"data_root": "dsB"}})
        table = error_table(tmp_path, ["M"], snrs=(20, 40))
        assert 20 in table["M"] and 40 not in table["M"]

    def test_error_table_degrades_without_gt_method(self, tmp_path):
        from galaxy_deconv_tpu.analysis.report import error_table, psf_error_table

        assert error_table(tmp_path, ["M"], snrs=(20,)) == {}
        assert psf_error_table(tmp_path, ["M"], errs=(0.01,)) == {}
