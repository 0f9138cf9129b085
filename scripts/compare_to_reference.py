"""Side-by-side comparison: reference results_200 vs this framework.

Reads the reference's committed result JSONs (reference ``results_200/``,
the paper's shipped numbers) and this framework's ``results_tpu/`` sweep,
computes the canonical metric for both — median over galaxies of
min(|g_rec - g_gt|, 1) on the |g| component, exactly the formula of the
reference's ``figures/error_snr.ipynb`` cell 3 — and prints a combined
markdown table plus the timing comparison.

Caveat printed with the table: the two columns are NOT the same galaxies.
The reference evaluates real COSMOS galaxies (GalSim, 500-galaxy subset
with shipped gt_shear); this framework evaluates its own JAX-simulated
Sersic benchmark (1000 galaxies).  Within each column the ordering of
methods is the comparable signal; across columns only the broad regime is.

Usage: python scripts/compare_to_reference.py [--ref /root/reference/results_200]
         [--ours results_tpu] [--snrs 20 100 200]
"""

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# our result dir name -> reference result dir name
METHOD_MAP = {
    "No_Deconv": "No_Deconv",
    "FPFS": "FPFS",
    "Richard-Lucy(30)": "Richard-Lucy(30)",
    "Tikhonet_Laplacian": "Tikhonet_Laplacian",
    "ShapeNet": "ShapeNet",
    "Unrolled_ADMM_Gaussian(2)": "Unrolled_ADMM_Gaussian(2)",
    "Unrolled_ADMM_Gaussian(4)": "Unrolled_ADMM_Gaussian(4)",
    "Unrolled_ADMM_Gaussian(8)": "Unrolled_ADMM_Gaussian(8)",
}


def median_errs(root: pathlib.Path, method: str, gt_method: str, snrs) -> dict:
    """Median |Δg| per SNR, following the reference notebook's formula.

    gt_shear is read per SNR from the method's own results when present,
    falling back to ``gt_method``'s entry for the same SNR (the notebook
    sources it from No_Deconv's file; it differs slightly across SNRs).
    """
    res = json.load(open(root / method / "results.json"))
    gt_res = json.load(open(root / gt_method / "results.json"))
    out = {}
    for snr in snrs:
        rec = np.array(res[str(snr)]["rec_shear"])
        gt = np.array(res[str(snr)].get("gt_shear") or gt_res[str(snr)]["gt_shear"])
        n = min(len(rec), len(gt))
        out[snr] = float(np.median(np.minimum(np.abs(rec[:n] - gt[:n]), 1)[:, 2]))
    t = res.get("time")
    out["time"] = t[0] / t[1] if t else None
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ref", default="/root/reference/results_200")
    parser.add_argument("--ours", default="results_tpu")
    parser.add_argument("--snrs", type=int, nargs="*", default=[20, 100, 200])
    args = parser.parse_args()

    ref_root, our_root = pathlib.Path(args.ref), pathlib.Path(args.ours)
    snrs = args.snrs

    print("Median ellipticity error |Δg| (canonical formula, figures/error_snr.ipynb):")
    print("reference = COSMOS/GalSim benchmark (authors' GPU); "
          "this framework = JAX-simulated benchmark (1 TPU chip).  Different galaxies —")
    print("compare method orderings within a column, not absolute values across columns.\n")

    head = "| Method | " + " | ".join(
        f"ref SNR {s} | tpu SNR {s}" for s in snrs) + " | ref s/gal | tpu s/gal |"
    sep = "|---" * (2 * len(snrs) + 3) + "|"
    print(head)
    print(sep)
    for ours_name, ref_name in METHOD_MAP.items():
        try:
            r = median_errs(ref_root, ref_name, "No_Deconv", snrs)
        except FileNotFoundError:
            r = None
        try:
            o = median_errs(our_root, ours_name, "No_Deconv", snrs)
        except FileNotFoundError:
            o = None
        if r is None and o is None:
            continue
        cells = []
        for s in snrs:
            cells.append(f"{r[s]:.4f}" if r else "—")
            cells.append(f"{o[s]:.4f}" if o else "—")
        cells.append(f"{r['time']:.4f}" if r and r["time"] else "—")
        cells.append(f"{o['time']:.1e}" if o and o["time"] else "—")
        print(f"| {ours_name} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
