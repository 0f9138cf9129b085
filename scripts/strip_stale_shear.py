"""Strip shear measurements from results files after a metric change.

Round 4 replaced the shear estimator's power-function moments with the
fpfs 3.0.2 linear algorithm (scripts/diagnose_rl.py); every committed
rec_shear/gt_shear array was measured with the old estimator and is not
comparable with re-swept rows.  The dataset-provenance stamps cannot
catch this (same data_root, different metric), so before the round-4
re-sweep this removes all shear arrays — PSNR entries (metric-
independent) and provenance stamps are preserved; timing is re-measured
by the sweep anyway.  The PSF-robustness results files are shear-only
and are deleted outright.

Usage: python scripts/strip_stale_shear.py [--results results_tpu]
"""

import argparse
import json
import pathlib


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default="results_tpu")
    args = ap.parse_args()

    for method_dir in sorted(pathlib.Path(args.results).iterdir()):
        if not method_dir.is_dir():
            continue
        for psf_file in method_dir.glob("results_psf_*_err.json"):
            psf_file.unlink()
            print(f"deleted  {psf_file}")
        path = method_dir / "results.json"
        if not path.exists():
            continue
        with open(path) as f:
            results = json.load(f)
        changed = False
        for key in list(results):
            entry = results[key]
            if not isinstance(entry, dict):
                continue
            for k in ("rec_shear", "gt_shear"):
                if k in entry:
                    del entry[k]
                    changed = True
            # an entry left with only its provenance stamp carries no data
            if set(entry) <= {"data_root"}:
                del results[key]
        if changed:
            tmp = path.with_suffix(".json.tmp")
            with open(tmp, "w") as f:
                json.dump(results, f)
            tmp.replace(path)
            print(f"stripped {path}")
        else:
            print(f"ok       {path} (no shear arrays)")


if __name__ == "__main__":
    main()
