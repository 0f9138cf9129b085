"""Extract loss curves from training logs / history files to CSV.

Capability parity: reference ``extract_loss.bash`` (grep/awk over
train_output_*.txt).  Two sources:

  * ``*_history.json`` files written by fit_online (preferred — exact), or
  * raw log files containing the trainer's INFO lines
    (``step N: train=X (R gal/s)`` / ``step N: val=Y``).

Usage: python scripts/extract_loss.py saved_models_online/ShapeNet_Laplacian_history.json
       python scripts/extract_loss.py /tmp/train_zoo.log --out losses.csv
"""

import argparse
import csv
import json
import pathlib
import re
import sys

_TRAIN = re.compile(r"step (\d+): train=([-\d.e+]+)")
_VAL = re.compile(r"step (\d+): val=([-\d.e+]+)")


def from_history(path: pathlib.Path):
    h = json.loads(path.read_text())
    return [
        {"step": s, "train_loss": t, "val_loss": v}
        for s, t, v in zip(h["step"], h["train_loss"], h["val_loss"])
    ]


def from_log(path: pathlib.Path):
    train, val = {}, {}
    for line in path.read_text().splitlines():
        if m := _TRAIN.search(line):
            train[int(m.group(1))] = float(m.group(2))
        elif m := _VAL.search(line):
            val[int(m.group(1))] = float(m.group(2))
    return [
        {"step": s, "train_loss": train.get(s, ""), "val_loss": val.get(s, "")}
        for s in sorted(set(train) | set(val))
    ]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("source", type=pathlib.Path)
    parser.add_argument("--out", type=pathlib.Path, default=None, help="default: stdout")
    args = parser.parse_args()

    rows = from_history(args.source) if args.source.suffix == ".json" else from_log(args.source)
    if not rows:
        raise SystemExit(f"no loss records found in {args.source}")
    f = open(args.out, "w", newline="") if args.out else sys.stdout
    w = csv.DictWriter(f, fieldnames=["step", "train_loss", "val_loss"])
    w.writeheader()
    w.writerows(rows)
    if args.out:
        f.close()
        print(f"{len(rows)} rows -> {args.out}")


if __name__ == "__main__":
    main()
