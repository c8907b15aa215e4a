"""Build engine.zip for spark-submit --py-files.

    python tools/package.py [--out dist/engine.zip]
    spark-submit --py-files dist/engine.zip engine/spark/job.py --input ... \
        --output ... --run-id ...

The zip carries the pure-Python package (engine/ + tools/) plus the
committed model tables (data/bpe/merges.txt, data/qc_weights.tsv) for
reference; note the DRIVER reads those tables from the submitted
checkout with plain open() — executors receive them as broadcast
literals, never as file reads (engine/datawork/{tokenize,quality}.py).
"""

from __future__ import annotations

import argparse
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def build(out: Path) -> int:
    out.parent.mkdir(parents=True, exist_ok=True)
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for base in ("engine", "tools"):
            for py in sorted((REPO / base).rglob("*.py")):
                zf.write(py, py.relative_to(REPO))
                n += 1
        for rel in ("data/bpe/merges.txt", "data/qc_weights.tsv"):
            if (REPO / rel).exists():
                zf.write(REPO / rel, rel)
                n += 1
    return n


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(REPO / "dist" / "engine.zip"))
    args = ap.parse_args()
    n = build(Path(args.out))
    print(f"packaged {n} modules → {args.out}")
