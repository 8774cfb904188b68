"""Deterministic html -> text extraction (the per-row invariant).

BASELINE.json's per-row invariant: the engine's extracted text must be
byte-identical, per url, to the golden ``text`` column of the pages
table.  The fixture generator (`sources/pages.py`) renders ``text`` into
html with :func:`render_html`; :func:`extract_text` is its exact
inverse.  Both directions are pure functions over UTF-8 bytes — no
library-version or locale dependence.

Reference analog: the reference's fixed Glue schemas treat every column
as already-extracted scalars (`lib/data-storage.ts:60-105`); at web
scale the extraction stage is where those scalars come from.
"""

from __future__ import annotations

import re

_P_RE = re.compile(rb"<p>(.*?)</p>", re.DOTALL)
_TITLE_RE = re.compile(rb"<title>(.*?)</title>", re.DOTALL)


def _escape(s: str) -> bytes:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    ).encode("utf-8")


def _unescape(b: bytes) -> str:
    return (
        b.decode("utf-8")
        .replace("&gt;", ">")
        .replace("&lt;", "<")
        .replace("&amp;", "&")
    )


def render_html(text: str, title: str = "") -> bytes:
    """Render golden text into a deterministic html page.  Paragraphs are
    the newline-separated segments of ``text``."""
    paras = b"".join(b"<p>" + _escape(p) + b"</p>" for p in text.split("\n"))
    return (
        b'<!DOCTYPE html><html><head><meta charset="utf-8"><title>'
        + _escape(title)
        + b"</title></head><body>"
        + paras
        + b"</body></html>"
    )


def extract_text(html: bytes) -> str:
    """Inverse of :func:`render_html`: byte-identical text per url."""
    paras = _P_RE.findall(html)
    return "\n".join(_unescape(p) for p in paras)


def extract_title(html: bytes) -> str:
    m = _TITLE_RE.search(html)
    return _unescape(m.group(1)) if m else ""
