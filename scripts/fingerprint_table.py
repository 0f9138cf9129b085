"""Per-method x per-SNR fingerprint comparison against the reference.

Emits the RESULTS.md FINGERPRINT TABLE: this framework's benchmark
median ellipticity error next to the reference's committed value
(``/root/reference/results_200/<method>/results.json``, the real-fpfs
outputs on the real COSMOS benchmark) for every method the reference
ships, at the key SNRs.  This is the sharpest available check of the
whole pipeline (simulated population + solvers + linear-FPFS metric):
round 3's statistics-level fingerprint tests passed while the per-cell
errors diverged 4x at low SNR, so the per-cell table is what's reported.

Cells show ``ours (ref)``.  Learned rows depend on training as well as
the metric, so the classical rows (No_Deconv, FPFS, Richardson-Lucy) are
the metric/population fingerprint proper; the learned rows contextualize.

Usage: python scripts/fingerprint_table.py [--write]  (pure numpy; safe
to run while the TPU is busy)
"""

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REF = pathlib.Path("/root/reference/results_200")
METHODS = [
    "No_Deconv",
    "FPFS",
    "Richard-Lucy(10)",
    "Richard-Lucy(20)",
    "Richard-Lucy(30)",
    "Richard-Lucy(50)",
    "Richard-Lucy(100)",
    "Tikhonet_Laplacian",
    "ShapeNet",
    "Unrolled_ADMM_Gaussian(8)",
    "Unrolled_ADMM_Gaussian(4)",
    "Unrolled_ADMM_Gaussian(2)",
]
SNRS = (20, 40, 100, 200)


def median_err(res: dict, gt: dict, snr: int) -> float:
    rec = np.asarray(res[str(snr)]["rec_shear"])
    g = np.asarray(gt[str(snr)]["gt_shear"])
    n = min(len(rec), len(g))
    return float(np.median(np.minimum(np.abs(rec[:n] - g[:n]), 1)[:, 2]))


def load(root: pathlib.Path, method: str):
    try:
        with open(root / method / "results.json") as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default="results_tpu")
    ap.add_argument("--write", action="store_true", help="patch the table into RESULTS.md")
    args = ap.parse_args()

    ours_root = pathlib.Path(args.results)
    gt_ours = load(ours_root, "No_Deconv")
    gt_ref = load(REF, "No_Deconv")

    lines = ["| Method | " + " | ".join(f"SNR {s}: ours (ref)" for s in SNRS) + " |",
             "|---" * (len(SNRS) + 1) + "|"]
    for m in METHODS:
        res_o, res_r = load(ours_root, m), load(REF, m)
        cells = []
        for s in SNRS:
            o = (median_err(res_o, gt_ours, s)
                 if res_o and str(s) in res_o and "rec_shear" in res_o[str(s)] else None)
            r = median_err(res_r, gt_ref, s) if res_r and str(s) in res_r else None
            cells.append(f"{o:.4f} ({r:.4f})" if o is not None and r is not None
                         else "—" if o is None else f"{o:.4f} (—)")
        lines.append(f"| {m} | " + " | ".join(cells) + " |")
    table = "\n".join(lines)
    print(table)

    if args.write:
        out = pathlib.Path("RESULTS.md")
        text = out.read_text()
        start, end = "<!-- FINGERPRINT TABLE START -->", "<!-- FINGERPRINT TABLE END -->"
        pre, rest = text.split(start, 1)
        _, post = rest.split(end, 1)
        out.write_text(pre + f"{start}\n{table}\n{end}" + post)
        print("patched RESULTS.md")


if __name__ == "__main__":
    main()
