"""PDF branch of the fetch/extract dispatch (S2 in SURVEY.md §2.1).

The reference routes responses whose body starts with ``%PDF-`` through
pdftotext + PyPDF4 metadata (network.py:77-88; article.py:204-210:
text, author, ``D:YYYYMMDD`` creation date, workflow jumps straight to
PARSED). Neither library ships in this container, so:

- ``is_pdf``: the content sniff (same ``%PDF-`` prefix test);
- ``extract_pdf``: tries ``pypdf`` if present; otherwise falls back to a
  minimal scan that handles *uncompressed* PDFs only (literal strings in
  BT/ET text blocks via Tj/TJ operators) plus the Info-dict Author /
  CreationDate; compressed streams yield ``status="pdf_unsupported"``.
  The dispatch, schema and workflow semantics are real and tested with
  tiny uncompressed PDFs generated in the test suite.
"""

from __future__ import annotations

import re

_TJ_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)\s*Tj")
_TJ_ARRAY_RE = re.compile(rb"\[((?:[^\[\]])*)\]\s*TJ")
_STR_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)")
_AUTHOR_RE = re.compile(rb"/Author\s*\(((?:[^()\\]|\\.)*)\)")
_CREATION_RE = re.compile(rb"/CreationDate\s*\(D:(\d{8})")
_ESCAPES = {b"\\n": b"\n", b"\\r": b"\r", b"\\t": b"\t",
            b"\\(": b"(", b"\\)": b")", b"\\\\": b"\\"}


def is_pdf(payload: bytes | None) -> bool:
    """network.py:77: response content starting '%PDF-'."""
    return bool(payload) and payload[:5] == b"%PDF-"


def _unescape(raw: bytes) -> str:
    for k, v in _ESCAPES.items():
        raw = raw.replace(k, v)
    return raw.decode("latin-1", errors="replace")


def _fallback_extract(payload: bytes) -> tuple[str, str, str, str]:
    texts = []
    for m in _TJ_RE.finditer(payload):
        s = _STR_RE.match(m.group(0))
        if s:
            texts.append(_unescape(s.group(0)[1:-1]))
    for m in _TJ_ARRAY_RE.finditer(payload):
        parts = [_unescape(x[1:-1]) for x in _STR_RE.findall(m.group(1))]
        if parts:
            texts.append("".join(parts))
    author_m = _AUTHOR_RE.search(payload)
    author = _unescape(author_m.group(1)) if author_m else ""
    creation_m = _CREATION_RE.search(payload)
    creation = ""
    if creation_m:
        d = creation_m.group(1).decode()
        creation = f"{d[0:4]}-{d[4:6]}-{d[6:8]}"
    status = "ok" if texts else "pdf_unsupported"
    return "\n".join(texts), author, creation, status


def extract_pdf(payload: bytes) -> dict:
    """→ {text, authors, publish_date, status, workflow} mirroring the
    reference PDF path (article.py:204-210: set_text(strip), author,
    CreationDate[0:8] parsed, PARSED without HTML parse)."""
    try:
        import io

        from pypdf import PdfReader  # not in this container; real path

        reader = PdfReader(io.BytesIO(payload))
        text = "\n".join((p.extract_text() or "") for p in reader.pages)
        meta = reader.metadata or {}
        author = str(meta.get("/Author") or "")
        creation = str(meta.get("/CreationDate") or "").replace("D:", "")[:8]
        pub = (f"{creation[0:4]}-{creation[4:6]}-{creation[6:8]}"
               if len(creation) == 8 else "")
        status = "ok"
    except ImportError:
        text, author, pub, status = _fallback_extract(payload)
    return {
        "text": text.strip(),
        "authors": [author] if author else [],
        "publish_date": pub,
        "status": status,
        "workflow": ["INIT", "DOWNLOADED", "PARSED"],
    }


def make_minimal_pdf(text_lines: list[str], author: str = "",
                     creation: str = "") -> bytes:
    """Tiny deterministic *uncompressed* PDF generator for tests."""
    content = b"BT /F1 12 Tf 72 720 Td " + b" T* ".join(
        b"(" + line.encode("latin-1", "replace")
        .replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
        + b") Tj" for line in text_lines) + b" ET"
    info = b""
    if author:
        info += b"/Author (" + author.encode() + b")"
    if creation:
        info += b"/CreationDate (D:" + creation.encode() + b"000000Z)"
    return (b"%PDF-1.4\n1 0 obj<</Type/Catalog/Pages 2 0 R>>endobj\n"
            b"2 0 obj<</Type/Pages/Kids[3 0 R]/Count 1>>endobj\n"
            b"3 0 obj<</Type/Page/Parent 2 0 R/Contents 4 0 R>>endobj\n"
            b"4 0 obj<</Length " + str(len(content)).encode() + b">>stream\n"
            + content + b"\nendstream endobj\n"
            b"5 0 obj<<" + info + b">>endobj\n"
            b"trailer<</Root 1 0 R/Info 5 0 R>>\n%%EOF")
