"""PDF byte-stream payloads: text + layout extraction (S3's text-side
analogue — the reference renders pixels for a GPU OCR model,
batch_pdf_processor.py:255-327; in this engine the PDF surface is text/layout
extraction, no pixels, per SURVEY §2.1 S3).

A PDF turn carries base64 bytes in the ``text`` column with tool
``doc.pdf``. Extraction order:

1. a real parser when available (``pypdf`` / ``pdfminer.six`` — NOT in this
   container, so the import is gated; drop-in when deployed),
2. the deterministic FAKEPDF test format (``%FAKEPDF-1\\n`` header, pages
   separated by ``\\x0c`` form-feed — what tools/synth.py emits), so the
   Spark plumbing (base64 decode, page split, markdown re-assembly, error
   channel) is real and tested without any codec,
3. otherwise an explicit error string (never an exception).
"""

from __future__ import annotations

import base64
import binascii
from typing import List, Optional, Tuple

FAKEPDF_HEADER = b"%FAKEPDF-1\n"
PAGE_FEED = b"\x0c"


def _real_parser_pages(data: bytes) -> Optional[List[str]]:
    """pypdf path, import-gated (absent in this sandbox)."""
    try:
        import io

        from pypdf import PdfReader  # type: ignore
    except ImportError:
        return None
    reader = PdfReader(io.BytesIO(data))
    return [(page.extract_text() or "") for page in reader.pages]


def pdf_to_pages(data: bytes) -> Tuple[Optional[List[str]], Optional[str]]:
    """bytes → (page texts, error). Exactly one of the two is None."""
    if data.startswith(FAKEPDF_HEADER):
        body = data[len(FAKEPDF_HEADER):]
        return [p.decode("utf-8", errors="replace")
                for p in body.split(PAGE_FEED)], None
    if data.startswith(b"%PDF"):
        try:
            pages = _real_parser_pages(data)
        except Exception as exc:
            return None, f"pdf parse failed: {type(exc).__name__}: {exc}"
        if pages is None:
            return None, "no PDF parser available in this environment"
        return pages, None
    return None, "not a PDF payload (missing %PDF / %FAKEPDF header)"


def decode_pdf_payload(text: str) -> Tuple[Optional[bytes], Optional[str]]:
    """The text column carries base64 for binary payload kinds. Whitespace
    is stripped first — JVM-side base64() chunks at 76 chars (RFC 2045)."""
    try:
        compact = "".join(text.split())
        return base64.b64decode(compact, validate=True), None
    except (binascii.Error, ValueError) as exc:
        return None, f"base64 decode failed: {exc}"


def pdf_payload_to_markdown(text: str) -> Tuple[str, Optional[str]]:
    """base64 PDF → page-split markdown in the Stage-A trailing-separator
    convention (batch_pdf_processor.py:388-391), ready for the standard
    cleaning/extraction path. Returns ("", error) on failure."""
    data, err = decode_pdf_payload(text)
    if err:
        return "", err
    pages, err = pdf_to_pages(data)
    if err:
        return "", err
    return "".join(content + f"\n\n--- Page {i + 1} ---\n\n"
                   for i, content in enumerate(pages)), None


def make_fake_pdf(pages: List[str]) -> str:
    """Deterministic test payload: pages → base64 FAKEPDF bytes."""
    body = PAGE_FEED.join(p.encode("utf-8") for p in pages)
    return base64.b64encode(FAKEPDF_HEADER + body).decode("ascii")
