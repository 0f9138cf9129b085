"""Back-fill dataset-provenance stamps into legacy results files.

Round-3 sweeps written before the stamping harness (eval/harness.py)
carry no ``meta.data_root`` / per-entry ``data_root`` keys, so the
cross-dataset refusal guards in analysis/report.py cannot protect them.
Their provenance is established out of band: every row was produced by
the round-3 staged pipeline (scripts/round3_eval*.sh) against the 10k
benchmark (main results.json) and the 1k PSF companion (results_psf_*),
and each leg is verified here by its row count before stamping —
an entry whose rec_shear length doesn't match the expected dataset
size is refused, not stamped.

Usage: python scripts/restamp_provenance.py [--results results_tpu]
"""

import argparse
import json
import pathlib

MAIN_ROOT = "datasets/LSST_23.5_deconv_tpu_10k"
PSF_ROOT = "datasets/LSST_23.5_deconv_tpu_1k_psf"


def stamp_file(path: pathlib.Path, data_root: str, expect_rows: int) -> str:
    with open(path) as f:
        results = json.load(f)
    changed = False
    for key, entry in results.items():
        if not isinstance(entry, dict) or key == "meta" or "rec_shear" not in entry:
            continue
        n = len(entry["rec_shear"])
        if n != expect_rows:
            return f"REFUSED {path}: entry {key} has {n} rows, expected {expect_rows}"
        if entry.get("data_root") != data_root:
            entry["data_root"] = data_root
            changed = True
    meta = results.setdefault("meta", {})
    if meta.get("data_root") != data_root:
        meta["data_root"] = data_root
        changed = True
    if not changed:
        return f"ok       {path} (already stamped)"
    tmp = path.with_suffix(".json.tmp")
    with open(tmp, "w") as f:
        json.dump(results, f)
    tmp.replace(path)
    return f"stamped  {path} -> {data_root}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default="results_tpu")
    ap.add_argument("--main_root", default=MAIN_ROOT)
    ap.add_argument("--psf_root", default=PSF_ROOT)
    ap.add_argument("--main_rows", type=int, default=10000)
    ap.add_argument("--psf_rows", type=int, default=1000)
    args = ap.parse_args()

    for method_dir in sorted(pathlib.Path(args.results).iterdir()):
        if not method_dir.is_dir():
            continue
        for name, root, rows in (
            ("results.json", args.main_root, args.main_rows),
            ("results_psf_shear_err.json", args.psf_root, args.psf_rows),
            ("results_psf_fwhm_err.json", args.psf_root, args.psf_rows),
        ):
            path = method_dir / name
            if path.exists():
                print(stamp_file(path, root, rows))


if __name__ == "__main__":
    main()
