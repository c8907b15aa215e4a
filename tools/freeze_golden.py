"""Freeze golden vectors: (payload, tool) → full extraction record.

Run once (and re-run only on a deliberate contract change):
    python tools/freeze_golden.py

Vectors were validated against the live reference modules via
tools/parity_check.py before freezing; pytest then compares engine.core
output to these frozen files without touching /root/reference.
"""

from __future__ import annotations

import json
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from engine.core.extract import extract_turn  # noqa: E402
from tools import synth  # noqa: E402

OUT = Path(__file__).resolve().parents[1] / "tests" / "golden" / "vectors.json"

# hand-written probes in the style of the reference's inline fixtures
# (md_cleaner.py:371-407, md_to_json_engine.py:398-413) — written fresh
HANDMADE = [
    ("md-disclosure-doc", "ocr.markdown", """# Quarterly Market Note

## Executive Summary

Demand stayed firm through the quarter and Globex Inc raised guidance by 4.5% on revenue of $12.3B.

## Analyst Certification

I, the author, certify that the views expressed herein are accurate.

## Important Disclosures

The firm has received compensation for services.

## United Kingdom

Distributed in the UK by the authorised entity.

Bloomberg® is a trademark and service mark of Bloomberg Finance L.P.

© Copyright 2025 Example Partners. All rights reserved.

--- Page 1 ---

## Financial Analysis

Revenue increased by 15% YoY while margins held at 32.5%.

| Metric | 2023 | 2024 |
|--------|------|------|
| Revenue | $100M | $120M |
| Profit | 15% | 18% |

## Disclaimer

Not intended for retail distribution.
"""),
    ("md-ragged-table", "ocr.markdown", """# Table Edge Cases

| A | B | C |
|---|---|---|
| 1 | 2 | 3 |
| 4 | 5 |
| 6 | 7 | 8 |
"""),
    ("grounded-two-page", "ocr.grounded",
     "<|ref|>title<|/ref|><|det|>[[72, 163, 548, 201]]<|/det|>\n# Take profit note\n\n"
     "<|ref|>text<|/ref|><|det|>[[70, 203, 652, 319]]<|/det|>\n"
     "We take profit on the position at 5.5450, locking in a gain of around 1.4% after fees and costs.\n"
     "\n<--- Page Split --->\n"
     "<|ref|>image<|/ref|><|det|>[[85, 103, 499, 305]]<|/det|>\n"
     "<|ref|>image_caption<|/ref|><|det|>[[86, 76, 388, 88]]<|/det|>\n"
     "<center>FIGURE 1. Corporates stepped up dollar supply </center>\n"
     "<｜end of sentence｜>"),
    ("grounded-malformed-det", "ocr.grounded",
     "<|ref|>text<|/ref|><|det|>[[12, 34, oops]]<|/det|>\nBody text that survives the bad det payload anyway.\n"
     "<|ref|>text<|/ref|><|det|>[[1, 2, 3, 4], [5, 6, 7, 8]]<|/det|>\nMulti-box block with \\coloneqq rewrite \\eqqcolon here."),
    ("html-article", "web.html", """<html><head><title>A Real Page</title></head><body>
<nav><a href="/">Home</a><a href="/a">About</a></nav>
<article><h1>The headline of the piece</h1>
<p>This is the first real paragraph of the article and it carries enough prose, with common function words, to be kept by any density scorer.</p>
<p>The second paragraph is also long enough to be retained and it talks about revenue of $5.2B and growth of 7.5% in the quarter.</p>
<table><tr><th>k</th><th>v</th></tr><tr><td>1</td><td>one</td></tr></table>
</article>
<div><a href="/x">x</a> <a href="/y">y</a> <a href="/z">z</a></div>
<footer>© 2025 Site. <a href="/t">Terms</a></footer>
<script>var x = 1;</script>
</body></html>"""),
    ("plain-eos", "chat.plain", "Short agent reply that is long enough to form a passage.<｜end of sentence｜>"),
    ("pdf-two-pages", "doc.pdf", __import__("engine.core.pdftext", fromlist=["make_fake_pdf"]).make_fake_pdf([
        "# PDF Report\n\nOpening page with revenue of $4.2B and growth of 3.1% to extract.",
        "Second page body that is definitely long enough to become a passage.",
    ])),
    ("pdf-no-parser", "doc.pdf", __import__("base64").b64encode(b"%PDF-1.4 realpdf").decode()),
    ("plain-tiny", "chat.plain", "ok"),
    ("empty", None, ""),
]


def main() -> None:
    vectors = []
    for name, tool, payload in HANDMADE:
        vectors.append({"name": name, "tool": tool, "payload": payload,
                        "expected": extract_turn(payload, tool, name)})
    for kind, gen in (("md_clean", synth.gen_md_clean),
                      ("md_grounded", synth.gen_md_grounded),
                      ("html_fragment", synth.gen_html_fragment),
                      ("plain", synth.gen_plain)):
        for i in range(4):
            rng = random.Random(f"golden:{kind}:{i}")
            payload = gen(rng)
            name = f"synth-{kind}-{i}"
            vectors.append({"name": name, "tool": synth.TOOLS[kind],
                            "payload": payload,
                            "expected": extract_turn(payload, synth.TOOLS[kind], name)})
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps(vectors, indent=1, ensure_ascii=False))
    print(f"froze {len(vectors)} vectors → {OUT}")


if __name__ == "__main__":
    main()
