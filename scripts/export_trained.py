"""Export best checkpoints into the committed ``trained/`` zoo.

Copies the best-validation checkpoint for each run (recorded by
fit_online's history file; latest when no history exists) from the
scratch checkpoint directory into
``trained/``, dropping the optimizer state so the committed artifacts stay
small (params + BN stats are all that inference needs).

Usage: python scripts/export_trained.py [--src saved_models_online] [--dst trained]
"""

import argparse
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", default="saved_models_online")
    parser.add_argument("--dst", default="trained")
    parser.add_argument("--runs", nargs="*", default=None, help="default: every run found in --src")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import orbax.checkpoint as ocp

    from galaxy_deconv_tpu.train.checkpoint import best_epoch, restore_checkpoint, unpack_variables

    src = pathlib.Path(args.src)
    pat = re.compile(r"^(?P<name>.+)_(?P<epoch>\d+)epochs$")
    runs = args.runs
    if runs is None:
        runs = sorted({m.group("name") for p in src.iterdir() if (m := pat.match(p.name))})

    dst = pathlib.Path(args.dst).resolve()
    dst.mkdir(exist_ok=True)
    for name in runs:
        ep = best_epoch(src, name)
        if not ep:
            print(f"skip {name}: no checkpoints")
            continue
        st = restore_checkpoint(src, name, ep)
        v = unpack_variables(st)
        slim = {"params": jax.tree.map(np.asarray, v["params"]),
                "batch_stats": jax.tree.map(np.asarray, v.get("batch_stats", {}))}
        out = dst / f"{name}_{ep}epochs"
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(out, slim, force=True)
        n = sum(x.size for x in jax.tree.leaves(slim["params"]))
        print(f"exported {name} step {ep} -> {out} ({n:,} params)")


if __name__ == "__main__":
    main()
