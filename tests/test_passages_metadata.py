import hashlib

from engine.core.metadata import (detect_language, extract_authors,
                                  extract_companies, extract_date,
                                  extract_tickers, extract_title)
from engine.core.passages import extract_headings, extract_passages


def test_passage_filtering_and_index_semantics():
    page = ("# Heading ignored\n\nshort\n\n"
            "This paragraph is definitely long enough to become a passage.\n\n"
            "![Figure 0-0](images/0_0.jpg)\n\n"
            "<b>Tagged paragraph stripped of tags but still long enough.</b>")
    out = extract_passages(page, 2)
    texts = [p["text"] for p in out]
    assert texts == [
        "This paragraph is definitely long enough to become a passage.",
        "Tagged paragraph stripped of tags but still long enough.",
    ]
    # idx counts ALL split parts (md_to_json_engine.py:77-84): the kept
    # passages sit at split indices 2 and 4
    assert out[0]["passage_id"] == hashlib.md5(
        f"2_2_{texts[0][:50]}".encode()).hexdigest()[:16]
    assert out[1]["passage_id"] == hashlib.md5(
        f"2_4_{texts[1][:50]}".encode()).hexdigest()[:16]


def test_headings():
    assert extract_headings("# A\n\n### B c\nplain") == [
        {"level": 1, "title": "A"}, {"level": 3, "title": "B c"}]


def test_title_fallbacks():
    assert extract_title("# The Title\nbody") == "The Title"
    assert extract_title("**Bold Opening Line Here**\nrest") == "Bold Opening Line Here"
    assert extract_title("tiny\n#x") == "Untitled Document"


def test_date_formats():
    assert extract_date("as of 2025-09-03 close") == "2025-09-03"
    assert extract_date("on 3 September 2025 we") == "3 September 2025"
    assert extract_date("dated 9/3/2025 ok") == "9/3/2025"
    assert extract_date("no date") is None


def test_companies_filters_and_cap():
    md = "Acme Corp and Globex Inc with IBM CORP and Two Words appear."
    got = extract_companies(md)
    assert "Acme Corp" in got and "Globex Inc" in got
    assert all(not c.isupper() for c in got)
    assert got == sorted(got) and len(got) <= 20


def test_authors_near_email():
    md = "John Smith +1 (212) 555-0100 john.smith@example.com"
    assert extract_authors(md) == ["John Smith"]


def test_language_and_tickers():
    assert detect_language("hello world") == "en"
    assert detect_language("这是中文文档内容测试 ok") == "zh"
    assert extract_tickers("Tickers: AAPL, MSFT; also 股票代码：BABA") == [
        "AAPL", "BABA", "MSFT"]
    assert extract_tickers("Ticker: TOOLONGNAME") == []


def test_extract_companies_windowed_scan_matches_direct_findall():
    """The hint-windowed suffix scan must be byte-identical to the direct
    two-pattern findall it replaced (P15 parity contract)."""
    import random

    from engine.core import metadata

    def direct(markdown):
        markdown = markdown[:metadata.METADATA_SCAN_LIMIT]
        companies = set()
        for rx in metadata._COMPANY_PATTERNS:
            for raw in rx.findall(markdown):
                name = raw.strip()
                if 3 < len(name) < 50 and not name.isupper():
                    companies.add(name)
        return sorted(companies)[:20]

    rng = random.Random(7)
    toks = ["Acme", "Inc", "Inc.", "Co", "Co.", "Corp", "Corporation",
            "Ltd", "Limited", "Group", "Company", "BIG", "&", "x3",
            "3Acme", "_X", "は", "a", ".", ",", "9", "_", "\n", "\t",
            "  ", "Foo Bar", "Co.x", "Inc.9", "IncX", "XCo",
            "Acme Co.Boston Co", ""]
    for _ in range(4000):
        t = "".join(rng.choice(toks) for _ in range(rng.randint(1, 30)))
        assert metadata.extract_companies(t) == direct(t), repr(t)
