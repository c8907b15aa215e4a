import base64

from engine.core.extract import extract_turn
from engine.core.pdftext import (make_fake_pdf, pdf_payload_to_markdown,
                                 pdf_to_pages)


def test_fakepdf_roundtrip_through_md_path():
    payload = make_fake_pdf([
        "# PDF Title\n\nFirst page body long enough to become a passage with 4.5% growth.",
        "Second page with a figure caption and revenue of $2.1B to extract here.",
    ])
    rec = extract_turn(payload, "doc.pdf", "pdf:0")
    assert rec["error"] is None
    assert rec["payload_kind"] == "pdf_bytes"
    assert rec["title"] == "PDF Title"
    # trailing-separator convention: first page is the unmarked "cover"
    # (page 0), so N pages leave N-1 markers after empty-page cleanup
    assert rec["page_count"] == 1
    assert rec["summary"]["passages_count"] == 2
    values = {n["value"] for n in rec["numerics"]}
    assert 0.045 in values and 2.1e9 in values


def test_real_pdf_without_parser_reports_error():
    payload = base64.b64encode(b"%PDF-1.7 not really parseable").decode()
    rec = extract_turn(payload, "doc.pdf", "pdf:1")
    assert rec["error"] == "no PDF parser available in this environment"
    assert rec["cleaned_text"] == ""


def test_garbage_payloads_never_throw():
    for bad in ["!!!not-base64!!!",
                base64.b64encode(b"plain bytes, no header").decode(), ""]:
        rec = extract_turn(bad, "doc.pdf", "pdf:x")
        assert rec["error"] is not None


def test_page_split_levels():
    pages, err = pdf_to_pages(b"%FAKEPDF-1\nonly page")
    assert err is None and pages == ["only page"]
    md, err = pdf_payload_to_markdown(make_fake_pdf(["a", "b"]))
    assert err is None
    assert md == "a\n\n--- Page 1 ---\n\nb\n\n--- Page 2 ---\n\n"
