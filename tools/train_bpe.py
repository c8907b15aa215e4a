"""Train the frozen BPE merges table on the committed synthetic corpus.

    python tools/train_bpe.py [--tag sf0.01] [--merges 512]
                              [--out data/bpe/merges.txt]

Run once; the merges file is committed (like the golden vectors) and every
consumer — tools/build_expected.py's expected_bpe.parquet, the Spark UDF in
engine/datawork/tokenize.py, the pytest oracle — loads the same frozen
table. Retraining (new corpus or merge count) requires regenerating
expected_bpe.parquet and committing both together (CLAUDE.md invariant 5).
"""

from __future__ import annotations

import argparse
import sys
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from engine.core.bpe import save_merges, train_merges  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="sf0.01")
    ap.add_argument("--merges", type=int, default=512)
    ap.add_argument("--out", default=str(REPO / "data" / "bpe" / "merges.txt"))
    args = ap.parse_args()

    import pyarrow.parquet as pq
    tx = pq.read_table(
        str(REPO / "data" / "synth" / args.tag / "transcripts.parquet"),
        columns=["text"])
    freqs: Counter = Counter()
    for text in tx.column("text").to_pylist():
        if text:
            freqs.update(text.strip().lower().split())
    merges = train_merges(dict(freqs), args.merges)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    save_merges(merges, str(out))
    print(f"trained {len(merges)} merges from {sum(freqs.values())} words "
          f"({len(freqs)} distinct) -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
