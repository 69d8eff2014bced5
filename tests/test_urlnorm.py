"""URL-algebra conformance against the reference's own fixture files
(/root/reference/tests/fixtures/url/*; harness modeled on
/root/reference/tests/units/url_test.py)."""

import os
import re

import pytest

from stimson_web_scraper_ray.functions import urlnorm
from tests.conftest import ref_fixture


def _labeled(path):
    with open(path) as f:
        return [tuple(line.strip().split(" ")) for line in f if line.strip()]


def test_valid_url_labels():
    # url/test_list.txt: "<1|0> <url>" — reference url_test.py:16-34
    cases = _labeled(ref_fixture("url/test_list.txt"))
    assert len(cases) == 40
    for label, url in cases:
        assert urlnorm.valid_url(url, test=True) == bool(int(label)), url


def test_pubdate_regex_labels():
    cases = _labeled(ref_fixture("url/test_pubdate.txt"))
    for label, url in cases:
        got = re.search(urlnorm.STRICT_DATE_REGEX, url) is not None
        assert got == bool(int(label)), url


def test_prepare_url_triples():
    # url/test_prepare.txt: "<golden> <input> <source>" per line
    with open(ref_fixture("url/test_prepare.txt")) as f:
        for line in f:
            if not line.strip():
                continue
            golden, raw, source = line.strip().split(" ")
            # reference asserts prefix, not equality (url_test.py:75-76)
            assert golden.startswith(urlnorm.prepare_url(raw, source))


def test_prepare_url_edges():
    assert urlnorm.prepare_url("http://x.co/a/") == "http://x.co/a"
    assert urlnorm.prepare_url("http://x.co/a\n") == "http://x.co/a"
    assert urlnorm.prepare_url("http://t.co/?url=http://real.com/a", "http://p.co") == "http://real.com/a"
    # same-domain urls are not unwrapped (urls.py:69-72)
    assert (
        urlnorm.prepare_url("http://p.co/?url=http://real.com/a", "http://p.co")
        == "http://p.co/?url=http://real.com/a"
    )


def test_remove_args():
    assert urlnorm.remove_args("http://x.co/a?b=1&c=2#f") == "http://x.co/a"
    assert urlnorm.remove_args("http://x.co/a?b=1&c=2", keep_params=("b",)) == "http://x.co/a?b=1"
    assert urlnorm.remove_args("http://x.co/a?b=1#f", frags=True) == "http://x.co/a#f"


def test_extract_domain():
    assert urlnorm.extract_domain("http://www.cnn.com/x") == ("cnn", "www")
    assert urlnorm.extract_domain("http://money.cnn.com/x") == ("cnn", "money")
    assert urlnorm.extract_domain("http://news.bbc.co.uk/x") == ("bbc", "news")
    assert urlnorm.extract_domain("http://techcrunch.com/x") == ("techcrunch", "")


def test_filetype():
    assert urlnorm.url_to_filetype("http://a.com/images/car.jpg") == "jpg"
    assert urlnorm.url_to_filetype("http://yahoo.com") is None
    assert urlnorm.url_to_filetype("http://a.com/x/index.html") == "html"


def test_is_url():
    assert urlnorm.is_url("http://www.cnn.com/a")
    assert urlnorm.is_url("https://localhost/a")
    assert not urlnorm.is_url("javascript:void(0)")
    assert not urlnorm.is_url("mailto:x@y.com")


def test_canon_hash64_deterministic_and_u64():
    h = urlnorm.canon_hash64("http://www.cnn.com/a")
    assert h == urlnorm.canon_hash64("http://www.cnn.com/a")
    assert 0 <= h < 2**64
    assert h != urlnorm.canon_hash64("http://www.cnn.com/b")


def test_shebang_unwrap():
    assert urlnorm.shebang_unwrap("http://x.co/#!/a") == "http://x.co/?_escaped_fragment_=/a"


def test_prepare_url_empty_netloc_resolves_against_source():
    """'http:///path' (scheme but empty netloc) must resolve against the
    source host via urljoin like the reference slow path, not be returned
    unchanged by the absolute-href fast path (advisor finding)."""
    from urllib.parse import urljoin

    from stimson_web_scraper_ray.functions.urlnorm import prepare_url

    src = "http://sourcehost/page"
    assert prepare_url("http:///path", src) == "http://sourcehost/path"
    # cross-scheme empty netloc: parity with the reference's urljoin result
    assert prepare_url("https:///a/b", src) == urljoin(src, "https:///a/b")
