"""Generate golden test fixtures by *running* the reference implementation.

This script imports the reference repo (read-only, at /root/reference) and
records its outputs on the shipped tutorial stamps as .npz goldens used by
tests/test_solvers.py.  No reference code is copied; it is executed once
here, offline, to capture behavior.

Run: python scripts/make_goldens.py
"""

import pathlib
import sys

import numpy as np
import torch

REFERENCE = "/root/reference"
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "goldens"
OUT.mkdir(parents=True, exist_ok=True)

sys.path.insert(0, REFERENCE)

from models.Richard_Lucy import Richard_Lucy  # noqa: E402
from models.Wiener import Wiener  # noqa: E402


def main():
    obs = torch.load(f"{REFERENCE}/tutorials/obs.pth")
    psf = torch.load(f"{REFERENCE}/tutorials/psf.pth")
    gt = torch.load(f"{REFERENCE}/tutorials/gt.pth")
    alpha = obs.ravel().mean()

    obs4 = obs.view(1, 1, 48, 48)
    psf4 = psf.view(1, 1, 48, 48)
    alpha4 = alpha.view(1, 1, 1, 1)

    with torch.no_grad():
        wiener = Wiener()(obs4, psf4, alpha4).squeeze().numpy()
        rl10 = Richard_Lucy(10)(obs4, psf4).squeeze().numpy()
        rl30 = Richard_Lucy(30)(obs4, psf4).squeeze().numpy()

    np.savez_compressed(
        OUT / "solver_goldens.npz",
        obs=obs.numpy(),
        psf=psf.numpy(),
        gt=gt.numpy(),
        alpha=np.float32(alpha.item()),
        wiener=wiener,
        rl10=rl10,
        rl30=rl30,
    )
    print("wrote", OUT / "solver_goldens.npz")
    for name, arr in [("wiener", wiener), ("rl10", rl10), ("rl30", rl30)]:
        print(name, arr.shape, "rms %.4f" % arr.std())


if __name__ == "__main__":
    main()
