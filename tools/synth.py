"""Deterministic synthetic transcript generator (FIXTURES.md §1–§2).

Produces the authoritative input table
``(conv_id string, turn_idx int32, role string, text string, tool string,
ts timestamp)`` with four payload kinds per FIXTURES.md §2, fully seeded
(every turn's payload depends only on (conv_id, turn_idx)) and time-free —
identical calls produce identical bytes.

Conversation-length skew (80% short / 19% medium / 1% very long) deliberately
exercises the salted repartitioning path. Rows are emitted shuffled so the
pipeline must re-impose (conv_id, turn_idx) ordering.

Usage:
    python tools/synth.py --turns 50000 --out /tmp/transcripts.parquet
"""

from __future__ import annotations

import argparse
import random
from datetime import datetime, timedelta
from typing import Dict, Iterator, List

BASE_TS = datetime(2025, 9, 1, 0, 0, 0)

ROLES = ["user", "assistant", "tool"]
KINDS = ["md_clean", "md_grounded", "html_fragment", "plain"]
TOOLS = {"md_clean": "ocr.markdown", "md_grounded": "ocr.grounded",
         "html_fragment": "web.html", "plain": "chat.plain"}

_COMPANIES = ["Acme Corp", "Globex Inc", "Initech Ltd", "Umbrella Group",
              "Stark Industries", "Wayne Enterprises", "Hooli Inc", "Vandelay Co"]
_TICKERS = ["ACME", "GLBX", "INIT", "UMBR", "STRK", "WAYN", "HOOL", "VAND"]
_WORDS = ("revenue growth outlook margin quarter guidance demand supply market "
          "pricing volume capital expense forecast momentum earnings upside "
          "inventory segment channel export tariff subsidy rate inflation").split()

_SECTION_HEADERS_BAD = ["Analyst Certification", "Important Disclosures",
                        "Risk Disclosures", "Disclaimer", "United Kingdom",
                        "Americas", "Japan", "Hong Kong", "Singapore",
                        "Distribution of Ratings"]
_SECTION_HEADERS_GOOD = ["Executive Summary", "Financial Analysis", "Outlook",
                         "Valuation", "Key Takeaways", "Market Review"]

_BOILERPLATE_PARAS = [
    "Bloomberg® is a trademark and service mark of Bloomberg Finance L.P.",
    "© Copyright 2025 Example Research Partners. All rights reserved.",
    "Email: research.desk@example.com Tel: +1 (212) 555-0100",
]


_GLUE = "the of and in for with on a is as".split()


def _sentence(rng: random.Random, n: int = 12) -> str:
    words = []
    for i in range(n):
        words.append(rng.choice(_WORDS))
        if i < n - 1 and rng.random() < 0.45:
            words.append(rng.choice(_GLUE))
    return " ".join(words).capitalize() + "."


def _paragraph(rng: random.Random) -> str:
    parts = [_sentence(rng, rng.randint(8, 16)) for _ in range(rng.randint(2, 4))]
    # salt in extractable facts
    if rng.random() < 0.5:
        parts.append(f"{rng.choice(_COMPANIES)} reported revenue of "
                     f"${rng.randint(1, 900)}.{rng.randint(0, 9)}B, "
                     f"up {rng.randint(1, 40)}.{rng.randint(0, 9)}% YoY.")
    if rng.random() < 0.2:
        parts.append(f"Tickers: {', '.join(rng.sample(_TICKERS, rng.randint(1, 3)))}")
    return " ".join(parts)


def _pipe_table(rng: random.Random) -> str:
    ncols = rng.randint(2, 5)
    cols = [f"Col{c}" for c in range(ncols)]
    lines = ["| " + " | ".join(cols) + " |",
             "|" + "---|" * ncols]
    for _ in range(rng.randint(1, 6)):
        lines.append("| " + " | ".join(str(rng.randint(0, 999)) for _ in cols) + " |")
    if rng.random() < 0.4:  # ragged row — must be dropped (md_to_json_engine.py:115-118)
        lines.append("| " + " | ".join(str(rng.randint(0, 99)) for _ in cols[:-1]) + " |")
    return "\n".join(lines) + "\n"


def _figure_block(rng: random.Random, page: int, idx: int) -> str:
    ref = f"![Figure {page}-{idx}](images/{page}_{idx}.jpg)\n"
    fig_no = rng.randint(1, 9)
    cap = f"<center>FIGURE {fig_no}. {_sentence(rng, 5)[:-1]}</center>\n"
    src = f"<center>Source: {rng.choice(['Company data', 'Haver', 'Exchange filings'])}</center>\n"
    ctx = ""
    roll = rng.random()
    if roll < 0.25:  # price-chart context → dropped by P6
        ctx = "12-month price performance relative to the S&P and NASDAQ since Jan 2024.\n"
    elif roll < 0.4:  # disclosure context → dropped by P6
        ctx = "See the important disclosure section for rating definitions.\n"
    return ref + cap + src + ctx


def _md_page(rng: random.Random, page: int) -> str:
    blocks: List[str] = []
    if rng.random() < 0.8:
        blocks.append(f"{'#' * rng.randint(1, 3)} {rng.choice(_SECTION_HEADERS_GOOD)}")
    for _ in range(rng.randint(1, 4)):
        blocks.append(_paragraph(rng))
    if rng.random() < 0.35:
        blocks.append(_pipe_table(rng))
    if rng.random() < 0.3:
        blocks.append(_figure_block(rng, page, rng.randint(0, 2)))
    if rng.random() < 0.4:  # boilerplate section to be removed
        blocks.append(f"## {rng.choice(_SECTION_HEADERS_BAD)}")
        blocks.append(_sentence(rng, 20))
    if rng.random() < 0.3:  # boilerplate paragraph to be removed
        blocks.append(rng.choice(_BOILERPLATE_PARAS))
    if rng.random() < 0.1:
        blocks.append("Partial output<｜end of sentence｜>")
    return "\n\n".join(blocks)


def gen_md_clean(rng: random.Random) -> str:
    n_pages = rng.randint(1, 4)
    parts = [_md_page(rng, 0)]
    for p in range(1, n_pages + 1):
        parts.append(f"\n\n--- Page {p} ---\n\n" + _md_page(rng, p))
    return "".join(parts)


def gen_md_grounded(rng: random.Random) -> str:
    pages = []
    for _ in range(rng.randint(1, 3)):
        blocks = []
        for _ in range(rng.randint(2, 6)):
            label = rng.choice(["text", "title", "text", "table", "image"])
            x1, y1 = rng.randint(0, 500), rng.randint(0, 500)
            det = f"[[{x1}, {y1}, {x1 + rng.randint(50, 400)}, {y1 + rng.randint(20, 300)}]]"
            if rng.random() < 0.1:  # multi-box
                det = det[:-1] + f", [{rng.randint(0, 99)}, 5, 900, 90]]"
            if rng.random() < 0.05:  # malformed det — must not crash (ref :482-491)
                det = "[[12, 34, oops]]"
            tag = f"<|ref|>{label}<|/ref|><|det|>{det}<|/det|>"
            if label == "image":
                blocks.append(tag)
            elif label == "title":
                blocks.append(f"{tag}\n# {_sentence(rng, 4)[:-1]}")
            else:
                body = _paragraph(rng)
                if rng.random() < 0.1:
                    body += " \\coloneqq limit \\eqqcolon"
                blocks.append(f"{tag}\n{body}")
        pages.append("\n\n".join(blocks))
    payload = "\n<--- Page Split --->\n".join(pages)
    if rng.random() < 0.3:
        payload += "<｜end of sentence｜>"
    return payload


def gen_html_fragment(rng: random.Random) -> str:
    main_paras = "\n".join(
        f"    <p>{_paragraph(rng)}</p>" for _ in range(rng.randint(2, 5)))
    links = "".join(f'<a href="/l{i}">{rng.choice(_WORDS)}</a> '
                    for i in range(rng.randint(5, 12)))
    table_rows = "\n".join(
        "      <tr><td>{}</td><td>{}</td></tr>".format(rng.randint(1, 99), rng.choice(_WORDS))
        for _ in range(rng.randint(1, 4)))
    return f"""<html><head><title>{_sentence(rng, 4)[:-1]}</title>
<style>body {{ color: red }}</style></head>
<body>
  <nav><a href="/">Home</a> <a href="/news">News</a> <a href="/contact">Contact</a></nav>
  <article>
    <h1>{_sentence(rng, 5)[:-1]}</h1>
{main_paras}
    <table>
      <tr><th>Qty</th><th>Item</th></tr>
{table_rows}
    </table>
  </article>
  <div class="linkfarm">{links}</div>
  <footer>© 2025 Example Media. <a href="/terms">Terms</a> <a href="/privacy">Privacy</a></footer>
  <script>trackPageView();</script>
</body></html>"""


def gen_plain(rng: random.Random) -> str:
    text = _paragraph(rng)
    if rng.random() < 0.2:
        text += "<｜end of sentence｜>"
    if rng.random() < 0.1:
        text = rng.choice(["ok", "done", ""])  # sub-threshold payloads
    return text


_GEN = {"md_clean": gen_md_clean, "md_grounded": gen_md_grounded,
        "html_fragment": gen_html_fragment, "plain": gen_plain}


def conv_length(conv_index: int, rng: random.Random) -> int:
    """80% 2–8 turns, 19% 20–60, 1% 500–2000 (FIXTURES.md §1)."""
    roll = rng.random()
    if roll < 0.80:
        return rng.randint(2, 8)
    if roll < 0.99:
        return rng.randint(20, 60)
    return rng.randint(500, 2000)


def make_turn(conv_id: str, conv_index: int, turn_idx: int) -> Dict:
    rng = random.Random(f"{conv_id}:{turn_idx}")
    kind = KINDS[(conv_index + turn_idx) % len(KINDS)]
    return {
        "conv_id": conv_id,
        "turn_idx": turn_idx,
        "role": ROLES[turn_idx % len(ROLES)],
        "text": _GEN[kind](rng),
        "tool": TOOLS[kind],
        "ts": BASE_TS + timedelta(seconds=conv_index * 60 + turn_idx),
    }


def iter_rows(n_turns: int, seed: int = 42) -> Iterator[Dict]:
    """Yield ~n_turns rows (whole conversations; stops at the first
    conversation boundary ≥ n_turns)."""
    emitted = 0
    conv_index = 0
    while emitted < n_turns:
        conv_id = f"conv-{conv_index:06d}"
        length = conv_length(conv_index, random.Random(f"len:{seed}:{conv_index}"))
        for turn_idx in range(length):
            yield make_turn(conv_id, conv_index, turn_idx)
            emitted += 1
        conv_index += 1


def build_rows(n_turns: int, seed: int = 42, shuffled: bool = True) -> List[Dict]:
    rows = list(iter_rows(n_turns, seed))
    if shuffled:
        random.Random(seed).shuffle(rows)
    return rows


def write_parquet(path: str, n_turns: int, seed: int = 42) -> int:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = build_rows(n_turns, seed)
    table = pa.Table.from_pylist(rows, schema=pa.schema([
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]))
    # bounded row groups: Spark parallelizes a parquet file by row group — a
    # single-group file is one unsplittable task (and OOMs small heaps)
    pq.write_table(table, path, row_group_size=20_000)
    return table.num_rows


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    n = write_parquet(args.out, args.turns, args.seed)
    print(f"wrote {n} rows to {args.out}")
