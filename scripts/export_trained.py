"""Export best checkpoints into the committed ``trained/`` zoo.

Copies the latest (= best-val, since fit_online saves on new-best) orbax
checkpoint for each run from the scratch checkpoint directory into
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

    from galaxy_deconv_tpu.train.checkpoint import latest_epoch, restore_checkpoint

    src = pathlib.Path(args.src)
    pat = re.compile(r"^(?P<name>.+)_(?P<epoch>\d+)epochs$")
    runs = args.runs
    if runs is None:
        runs = sorted({m.group("name") for p in src.iterdir() if (m := pat.match(p.name))})

    dst = pathlib.Path(args.dst).resolve()
    dst.mkdir(exist_ok=True)
    for name in runs:
        ep = latest_epoch(src, name)
        if not ep:
            print(f"skip {name}: no checkpoints")
            continue
        st = restore_checkpoint(src, name, ep)
        params = st["params"] if isinstance(st, dict) else st.params
        stats = st["batch_stats"] if isinstance(st, dict) else st.batch_stats
        slim = {"params": jax.tree.map(np.asarray, params),
                "batch_stats": jax.tree.map(np.asarray, stats) if stats else {}}
        out = dst / f"{name}_{ep}epochs"
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(out, slim, force=True)
        n = sum(x.size for x in jax.tree.leaves(slim["params"]))
        print(f"exported {name} step {ep} -> {out} ({n:,} params)")


if __name__ == "__main__":
    main()
