"""URL algebra: canonicalization, validity, hashing.

Pure functions (no Ray). Semantics match the reference module
/root/reference/scraper/urls.py — prepare_url (urls.py:82-103),
redirect_back (urls.py:59-79), remove_args (urls.py:42-56),
valid_url (urls.py:106-241), url_to_filetype (urls.py:244-263),
get_domain/get_scheme/get_path (urls.py:266-289),
extract_domain (urls.py:292-296, tldextract replaced by a bundled
public-suffix heuristic), is_url (urls.py:299-308) and the
STRICT_DATE_REGEX / DATE_REGEX pair (urls.py:24-26).

Plus the engine's own ``canon_hash64`` — the 64-bit hash of the canonical
URL form that keys the distributed seen-set (north rule: "canonicalized +
64-bit hashed URLs"). blake2b(digest_size=8) is deterministic across
processes and machines (unlike Python ``hash``), which the resumable
checkpoint format requires.
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import parse_qs, urljoin, urlparse, urlsplit, urlunsplit

# --- constants (behavioural data, same values as urls.py:22-39) -------------

DATE_REGEX = (
    r"([\./\-_]{0,1}(19|20)\d{2})[\./\-_]{0,1}"
    r"(([0-3]{0,1}[0-9][\./\-_])|(\w{3,5}[\./\-_]))"
    r"([0-3]{0,1}[0-9][\./\-]{0,1})?"
)
STRICT_DATE_REGEX = r"(?<=\W)" + DATE_REGEX

ALLOWED_TYPES = frozenset(
    ["html", "htm", "md", "rst", "aspx", "jsp", "rhtml", "cgi",
     "xhtml", "jhtml", "asp", "shtml"]
)
GOOD_PATHS = frozenset(
    ["story", "article", "feature", "featured", "slides", "slideshow",
     "gallery", "news", "video", "media", "v", "radio", "press"]
)
BAD_CHUNKS = frozenset(
    ["careers", "contact", "about", "faq", "terms", "privacy", "advert",
     "preferences", "feedback", "info", "browse", "howto", "account",
     "subscribe", "donate", "shop", "admin"]
)
BAD_DOMAINS = frozenset(["amazon", "doubleclick", "twitter"])

_DATE_RE = re.compile(DATE_REGEX)
_STRICT_DATE_RE = re.compile(STRICT_DATE_REGEX)

_IS_URL_RE = re.compile(
    r"^(?:http|ftp)s?://"
    r"(?:(?:[A-Z0-9](?:[A-Z0-9-]{0,61}[A-Z0-9])?\.)+(?:[A-Z]{2,6}\.?|[A-Z0-9-]{2,}\.?)|"
    r"localhost|"
    r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3})"
    r"(?::\d+)?"
    r"(?:/?|[/?]\S+)$",
    re.IGNORECASE,
)

# Minimal public-suffix table standing in for tldextract (urls.py:292-296).
# Covers the two-label suffixes common in news URLs; anything else is treated
# as a one-label TLD. The reference only uses (domain, subdomain) for
# BAD_DOMAINS/BAD_CHUNKS checks, so this fidelity level matches its tests.
_TWO_LABEL_SUFFIXES = frozenset(
    ["co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
     "com.au", "net.au", "org.au", "gov.au", "edu.au",
     "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
     "com.br", "org.br", "gov.br", "net.br",
     "co.in", "net.in", "org.in", "gov.in", "ac.in",
     "com.cn", "net.cn", "org.cn", "gov.cn",
     "com.mx", "org.mx", "gob.mx",
     "co.za", "org.za", "gov.za",
     "com.sg", "com.hk", "com.tw", "com.my", "com.ph",
     "co.kr", "or.kr", "go.kr",
     "com.ar", "com.co", "com.pe", "com.ve", "com.uy",
     "co.nz", "org.nz", "net.nz", "govt.nz",
     "co.il", "org.il", "gov.il",
     "com.tr", "gov.tr", "org.tr",
     "com.pk", "com.bd", "com.np", "com.kh", "com.vn",
     "co.th", "or.th", "go.th", "in.th", "ac.th"]
)


def remove_args(url: str, keep_params: tuple = (), frags: bool = False) -> str:
    """Strip query args (keeping ``keep_params``) and optionally fragments.

    Reference: urls.py:42-56. Note the reference keeps this *disabled* inside
    prepare_url (urls.py:92-94 commented out) — we preserve that default.
    """
    parts = urlsplit(url)
    query = "&".join(q for q in parts.query.split("&") if q.startswith(keep_params))
    fragment = parts.fragment if frags else ""
    return urlunsplit((parts.scheme, parts.netloc, parts.path, query, fragment))


def redirect_back(url: str, source_domain: str) -> str:
    """Unwrap tracking redirects that stash the target in a ``url=`` query
    param (Pinterest-style). Reference: urls.py:59-79."""
    parsed = urlparse(url)
    if source_domain in parsed.netloc or parsed.netloc in source_domain:
        return url
    target = parse_qs(parsed.query).get("url")
    if target:
        return target[0]
    return url


from functools import lru_cache


@lru_cache(maxsize=1 << 15)
def _netloc_of(url: str) -> str:
    return urlparse(url).netloc


@lru_cache(maxsize=1 << 16)
def _prepare_absolute(url: str, source_netloc: str) -> str:
    """prepare_url fast path for already-absolute hrefs: urljoin(source,
    absolute) == absolute, so the result depends only on (url,
    source_netloc) — cacheable across pages (site-template nav links
    repeat on every page of a host)."""
    try:
        proper = redirect_back(url, source_netloc)
        if proper.endswith("/"):
            proper = proper[:-1]
        if proper.endswith("\n"):
            proper = proper[:-1]
    except ValueError:
        proper = ""
    return proper


def prepare_url(url: str, source_url: str | None = None) -> str:
    """Canonicalize a URL: join relative against source, unwrap redirects,
    strip a single trailing '/' or newline. '' on parse failure.
    Reference: urls.py:82-103."""
    try:
        if source_url is not None:
            # the fast path requires a non-empty netloc: 'http:///path'
            # must fall through to urljoin, which resolves it against the
            # source host like the reference's urls.py:90 does
            if url.startswith(("http://", "https://")) and not (
                    url.startswith("http:///") or url.startswith("https:///")):
                return _prepare_absolute(url, _netloc_of(source_url))
            proper = urljoin(source_url, url)
            proper = redirect_back(proper, _netloc_of(source_url))
        else:
            proper = url
        if proper.endswith("/"):
            proper = proper[:-1]
        if proper.endswith("\n"):
            proper = proper[:-1]
    except ValueError:
        proper = ""
    return proper


def url_to_filetype(abs_url: str) -> str | None:
    """Extension of the file named by the url, lowercased; None if none.
    Reference: urls.py:244-263."""
    path = urlparse(abs_url).path
    if path.endswith("/"):
        path = path[:-1]
    chunks = [c for c in path.split("/") if c]
    if not chunks:
        return None
    last = chunks[-1].split(".")
    if len(last) < 2:
        return None
    ftype = last[-1]
    if len(ftype) <= 5 or ftype.lower() in ALLOWED_TYPES:
        return ftype.lower()
    return None


def extract_domain(url: str) -> tuple[str, str]:
    """(tld-level domain, subdomain) via the bundled suffix table.
    Reference: urls.py:292-296 (tldextract)."""
    host = urlparse(url).netloc.lower().split(":")[0].strip(".")
    if not host:
        return "", ""
    labels = host.split(".")
    if len(labels) < 2:
        return labels[0], ""
    n_suffix = 2 if ".".join(labels[-2:]) in _TWO_LABEL_SUFFIXES and len(labels) >= 3 else 1
    domain_idx = len(labels) - n_suffix - 1
    if domain_idx < 0:
        return labels[0], ""
    return labels[domain_idx], ".".join(labels[:domain_idx])


def valid_url(url: str | None, test: bool = False) -> bool:
    """News-article URL predicate. Reference: urls.py:106-241 (rule-for-rule:
    length>=11, scheme check, path shape, filetype whitelist, 'index' strip,
    BAD_DOMAINS tld, slug dash/underscore>4, >=2 subpaths, BAD_CHUNKS in
    path or subdomain, DATE_REGEX, GOOD_PATHS)."""
    if test:
        url = prepare_url(url)
    if url is None or len(url) < 11:
        return False
    if "mailto:" in url or ("http://" not in url and "https://" not in url):
        return False

    path = urlparse(url).path
    if not path.startswith("/"):
        return False
    if path.endswith("/"):
        path = path[:-1]
    chunks = [c for c in path.split("/") if c]

    if chunks:
        ftype = url_to_filetype(url)
        if ftype and ftype not in ALLOWED_TYPES:
            return False
        last = chunks[-1].split(".")
        if len(last) > 1:
            chunks[-1] = last[-2]

    if "index" in chunks:
        chunks.remove("index")

    tld, subd = extract_domain(url)
    slug = chunks[-1] if chunks else ""

    if tld in BAD_DOMAINS:
        return False

    dashes = slug.count("-") if chunks else 0
    unders = slug.count("_") if chunks else 0

    if slug and (dashes > 4 or unders > 4):
        if dashes >= unders and tld not in [x.lower() for x in slug.split("-")]:
            return True
        if unders > dashes and tld not in [x.lower() for x in slug.split("_")]:
            return True

    if len(chunks) <= 1:
        return False

    for bad in BAD_CHUNKS:
        if bad in chunks or bad == subd:
            return False

    if _DATE_RE.search(url) is not None:
        return True

    lowered = [c.lower() for c in chunks]
    for good in GOOD_PATHS:
        if good in lowered:
            return True
    return False


def get_domain(abs_url: str | None, **kwargs) -> str | None:
    """netloc projection; reference urls.py:266-273."""
    return None if abs_url is None else urlparse(abs_url, **kwargs).netloc


def get_scheme(abs_url: str | None, **kwargs) -> str | None:
    return None if abs_url is None else urlparse(abs_url, **kwargs).scheme


def get_path(abs_url: str | None, **kwargs) -> str | None:
    return None if abs_url is None else urlparse(abs_url, **kwargs).path


def is_url(url: str) -> bool:
    """Regex URL validity; reference urls.py:299-308."""
    return _IS_URL_RE.match(url) is not None


def url_has_date(url: str) -> bool:
    """STRICT_DATE_REGEX presence; pubdate strategy 1 input
    (content_extractor.py:201-206)."""
    return _STRICT_DATE_RE.search(url) is not None


def canon_hash64(url: str) -> int:
    """Deterministic 64-bit hash of a canonicalized URL — the seen-set key.

    New design (no reference equivalent; replaces the per-domain memo text
    files of utils.py:134-181). Unsigned 64-bit for pa.uint64 columns.
    """
    return int.from_bytes(
        hashlib.blake2b(url.encode("utf-8", "replace"), digest_size=8).digest(),
        "big",
    )


def shebang_unwrap(url: str) -> str:
    """'#!' → '?_escaped_fragment_=' (URLHelper, utils.py:48-55)."""
    return url.replace("#!", "?_escaped_fragment_=") if "#!" in url else url
