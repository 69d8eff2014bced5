"""Scalar text utilities + regex extractors (SURVEY.md §2.8, M31/M33).

Ports: split_words (utils.py:316-323), innerTrim (utils.py:307-313 — also
exported from dom), domain_to_filename (utils.py:101-109), get_email /
get_mobile_number / get_voltage (patterns.py:44-69)."""

from __future__ import annotations

import re

from .dom import inner_trim  # noqa: F401  (re-export: the innerTrim port)

_NONWORD = re.compile(r"[^\w ]")

# patterns.py:50-56 — NANP-style phone matcher (behavioural data)
_PHONE_RE = re.compile(
    r"(?:(?:\+?([1-9]|[0-9][0-9]|[0-9][0-9][0-9])\s*(?:[.-]\s*)?)?"
    r"(?:\(\s*([2-9]1[02-9]|[2-9][02-8]1|[2-9][02-8][02-9])\s*\)|"
    r"([0-9][1-9]|[0-9]1[02-9]|[2-9][02-8]1|[2-9][02-8][02-9]))\s*"
    r"(?:[.-]\s*)?)?([2-9]1[02-9]|[2-9][02-9]1|[2-9][02-9]{2})\s*"
    r"(?:[.-]\s*)?([0-9]{4})"
    r"(?:\s*(?:#|x\.?|ext\.?|extension)\s*(\d+))?")

_EMAIL_RE = re.compile(r"([^@|\s]+@[^@]+\.[^@|\s]+)")


def split_words(text) -> list[str]:
    """utils.py:316-323: strip non-word chars, lower, split, strip dots."""
    if not isinstance(text, str):
        return []
    text = _NONWORD.sub("", text)
    return [x.strip(".").lower() for x in text.split()]


def domain_to_filename(domain: str) -> str:
    """utils.py:101-109."""
    filename = domain.replace("/", "-")
    if filename.endswith("-"):
        filename = filename[:-1]
    return filename + ".txt"


def get_email(text: str) -> str | None:
    """patterns.py:63-69."""
    emails = _EMAIL_RE.findall(text or "")
    if emails:
        try:
            return emails[0].split()[0].strip(";")
        except IndexError:
            return None
    return None


def get_mobile_number(text: str) -> str | None:
    """patterns.py:49-61."""
    phones = _PHONE_RE.findall(text or "")
    if phones:
        number = "".join(phones[0])
        return "+" + number if len(number) > 10 else number
    return None


def get_voltage(sentence):
    """patterns.py:44-45 — an intentional stub in the reference too."""
    return None


def is_media_news(url: str) -> bool:
    """article.py:577-586: media-gallery page predicate."""
    safe_urls = ["/video", "/slide", "/gallery", "/powerpoint",
                 "/fashion", "/glamour", "/cloth"]
    return any(s in (url or "") for s in safe_urls)
