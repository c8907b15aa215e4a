"""One-off parity harness: engine.core vs the reference's deterministic modules.

Runs the reference implementations (md_cleaner / md_to_json_engine /
figure_filter — imported from the read-only snapshot, which has no heavy
deps) side by side with engine.core over a corpus of synthetic payloads and
asserts byte equality of cleaned text and extraction records. Used during
development and to produce the frozen golden vectors in tests/golden/; the
committed pytest suite never imports the reference.

Usage: python tools/parity_check.py [--n 300] [--ref /root/reference]
"""

from __future__ import annotations

import argparse
import logging
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from engine.core import cleaner as my_cleaner  # noqa: E402
from engine.core import extract as my_extract  # noqa: E402
from engine.core import figures as my_figures  # noqa: E402
from tools import synth  # noqa: E402

logging.disable(logging.CRITICAL)


def load_reference(ref_path: str):
    sys.path.insert(0, ref_path)
    import figure_filter as ref_ff
    import md_cleaner as ref_mc
    import md_to_json_engine as ref_engine
    return ref_mc.MarkdownCleaner(), ref_engine.MarkdownToJsonEngine(), ref_ff


def compare_md(payload: str, ref_cleaner, ref_engine, ref_ff) -> list[str]:
    errs = []

    ref_cleaned, ref_stats = ref_cleaner.clean(payload)
    my_cleaned, my_stats, _spans = my_cleaner.clean_markdown(payload)
    if ref_cleaned != my_cleaned:
        errs.append("cleaned_text mismatch")
    if len(ref_stats["removed_sections"]) != my_stats["removed_sections"]:
        errs.append("removed_sections count mismatch")
    if ref_stats["removed_paragraphs"] != my_stats["removed_paragraphs"]:
        errs.append("removed_paragraphs mismatch")

    # reference stage-B: figure filter on RAW markdown; fabricate figure paths
    # from the refs present so the name-set logic is exercised
    fig_names = [m.group(2).rsplit("/", 1)[-1] for m in
                 __import__("re").finditer(r"!\[([^\]]*)\]\(([^)]+)\)", payload)]
    ref_kept, ref_dropped = ref_ff.filter_figures(payload, [f"/abs/{n}" for n in fig_names])
    _my_kept, my_dropped, _ = my_figures.filter_figures(payload)
    if sorted(ref_dropped) != my_dropped:
        errs.append(f"figure drops mismatch: {ref_dropped} vs {my_dropped}")

    ref_doc = ref_engine.convert(ref_cleaned, "doc.pdf")
    rec = my_extract.extract_turn(payload, "ocr.markdown", "doc.pdf")

    if [p["passage_id"] for p in ref_doc["passages"]] != [p["passage_id"] for p in rec["passages"]]:
        errs.append("passage ids mismatch")
    if [p["text"] for p in ref_doc["passages"]] != [p["text"] for p in rec["passages"]]:
        errs.append("passage texts mismatch")

    ref_tables = ref_doc["data"]["tables"]
    if [(t["table_id"], t["columns"], t["rows"]) for t in ref_tables] != \
       [(t["table_id"], t["columns"], t["rows"]) for t in rec["tables"]]:
        errs.append("tables mismatch")

    ref_nums = ref_doc["data"]["numerical_data"]
    # NOTE: reference caps numerics per PAGE at 50 (md_to_json_engine.py:257)
    if [(n["num_id"], n["value"], n["unit"], n["context"]) for n in ref_nums] != \
       [(n["num_id"], n["value"], n["unit"], n["context"]) for n in rec["numerics"]]:
        errs.append("numerics mismatch")

    if [e["entity_id"] for e in ref_doc["entities"]] != [e["entity_id"] for e in rec["entities"]]:
        errs.append("entities mismatch")

    if ref_doc["doc"]["title"] != rec["title"]:
        errs.append(f"title mismatch: {ref_doc['doc']['title']!r} vs {rec['title']!r}")

    meta = ref_doc["doc"]["extraction_run"]["processing_metadata"]
    if (meta.get("date") or None) != rec["date"]:
        errs.append("date mismatch")
    if set(meta.get("authors") or []) != set(rec["authors"]):
        errs.append("authors mismatch")
    return errs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=300)
    ap.add_argument("--ref", default="/root/reference")
    args = ap.parse_args()

    ref_cleaner, ref_engine, ref_ff = load_reference(args.ref)

    fails = 0
    for i in range(args.n):
        rng = random.Random(f"parity:{i}")
        payload = synth.gen_md_clean(rng)
        errs = compare_md(payload, ref_cleaner, ref_engine, ref_ff)
        if errs:
            fails += 1
            print(f"[{i}] FAIL: {errs}")
            if fails <= 3:
                Path(f"/tmp/parity_fail_{i}.md").write_text(payload)
    print(f"parity: {args.n - fails}/{args.n} payloads byte-identical")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
