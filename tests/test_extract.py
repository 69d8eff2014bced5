"""Extraction-kernel conformance.

Strategy mirrors the reference test suite (SURVEY.md §5): unit checks on
synthetic HTML plus golden-file comparison over the reference's own fixture
corpus (/root/reference/tests/fixtures/html/*.html ↔ text/*.txt), with a
failure budget like exhaustive_test.py:98-99 (the reference itself tolerates
≤38 fulltext mismatches of 145)."""

import glob
import os

import pytest

from stimson_web_scraper_ray.functions import dom, metadata
from stimson_web_scraper_ray.functions.extract import (
    _normalize_text,
    extract_article,
    fulltext,
    parse_tables,
)

HTML_DIR = "/root/reference/tests/fixtures/html"
TEXT_DIR = "/root/reference/tests/fixtures/text"

ARTICLE_HTML = """
<html lang="en"><head><title>Big Story - CNN</title>
<meta property="og:title" content="Big Story"/>
<meta name="author" content="Jane Doe"/>
<meta property="article:published_time" content="2014-02-10T08:00:00Z"/>
<meta name="description" content="A description here"/>
<meta property="og:site_name" content="CNN"/>
<meta name="keywords" content="a, b, c"/>
<link rel="canonical" href="http://www.cnn.com/2014/02/10/world/big-story"/>
</head><body>
<div class="navbar"><a href="/a">Home</a><a href="/b">World</a></div>
<h1>Big Story</h1>
<div id="content">
<p>The quick brown fox jumped over the lazy dog and then it ran away to the
forest with all of the other animals that were there.</p>
<p>It was a very good day for all of the animals because they could be
together in the sun and they had much to eat and drink.</p>
<p>After some time they went back to their homes and they were happy about
the day that they had spent together in the forest.</p>
</div>
<div class="footer"><p>Contact us</p></div>
</body></html>
"""


def test_extract_article_fields():
    art = extract_article(
        ARTICLE_HTML.encode(),
        url="http://www.cnn.com/2014/02/10/world/big-story/index.html",
    )
    assert art["status"] == "ok"
    assert art["title"] == "Big Story"
    assert art["authors"] == ["Jane Doe"]
    assert art["publish_date"] == "2014-02-10"
    assert art["meta_lang"] == "en"
    assert art["meta_site_name"] == "CNN"
    assert art["meta_keywords"] == ["a", "b", "c"]
    assert art["canonical_link"] == "http://www.cnn.com/2014/02/10/world/big-story"
    assert art["text"].startswith("The quick brown fox")
    assert "Contact us" not in art["text"]  # footer killed by cleaner regex
    assert "Home" not in art["text"]        # navbar killed
    assert art["workflow"] == ["INIT", "DOWNLOADED", "PARSED"]


def test_extract_article_error_row():
    art = extract_article(None, url="http://x.co/abc")
    assert art["url"] == "http://x.co/abc"   # never raises


def test_title_pipe_split():
    html = "<html><head><title>Short | The Actually Much Longer Part Here</title></head><body><p>x</p></body></html>"
    doc = dom.fromstring(html)
    assert metadata.get_title(doc) == "The Actually Much Longer Part Here"


def test_meta_data_nesting():
    html = (
        '<html><head><meta property="og:image:width" content="120">'
        '<meta property="og:title" content="T"><meta name="plain" content="5">'
        "</head><body></body></html>"
    )
    md = metadata.get_meta_data(dom.fromstring(html))
    assert md["plain"] == 5
    assert md["og"]["image"]["width"] == 120
    assert md["og"]["title"] == "T"


def test_meta_refresh():
    html = '<html><head><meta http-equiv="refresh" content="0;URL=\'http://x.co/a\'"></head></html>'
    assert metadata.extract_meta_refresh(html) == "http://x.co/a"
    assert metadata.extract_meta_refresh('<html><meta http-equiv="refresh" content="600"></html>') is None


def test_videos():
    html = (
        "<div><iframe src='http://youtube.com/embed/x' width='5'></iframe>"
        "<iframe src='http://nota.provider.com/y'></iframe>"
        "<video src='http://youtube.com/v/z'></video></div>"
    )
    doc = dom.fromstring(html)
    assert metadata.get_videos(doc) == ["http://youtube.com/embed/x"]


def test_parse_tables_colspan():
    html = """
    <table class="wikitable"><caption>Cap</caption>
    <tr><th colspan="2">AB</th></tr>
    <tr><td>a</td><td>b</td></tr>
    </table>"""
    tables = parse_tables(html)
    assert tables[0]["name"] == "Cap"
    assert tables[0]["rows"][0] == ["AB", "AB"]
    assert tables[0]["rows"][1] == ["a", "b"]


def test_br_literal_newline_semantics():
    # output_formatter.py:76,87: <br> markers become literal \n then split
    html = ("<html><body><div><p>First part of it all goes here with many "
            "of the words that we know and like<br>and after the break more "
            "of the text that we have all seen before it ends</p>"
            "<p>Second paragraph also has to have enough stopwords to be "
            "counted as a real one by the scorer of all the nodes</p>"
            "<p>Third paragraph also has to have enough stopwords to be "
            "counted as a real one by the scorer of all the nodes</p>"
            "</div></body></html>")
    text = fulltext(html)
    assert "and after the break more" in text
    assert "\\n" not in text


@pytest.mark.slow
def test_reference_fixture_corpus_budget():
    """Golden-file sweep with an explicit budget (reference allows 38
    failures of 145, exhaustive_test.py:98-99; the engine currently passes
    120/145 byte-exact with the stdlib parser — well above the reference's
    own exhaustive budget (145-38=107). Uses the full extract_article path
    (meta-lang-aware stopword scoring, like the reference's exhaustive run
    with use_meta_language) rather than fulltext(lang="en"). Ratchet this
    up, never down."""
    pairs = []
    for tf in sorted(glob.glob(TEXT_DIR + "/*.txt")):
        hf = os.path.join(HTML_DIR, os.path.basename(tf)[:-4] + ".html")
        if os.path.exists(hf):
            pairs.append((hf, tf))
    assert len(pairs) == 145
    # the 25 accepted misses (forensics in CONFORMANCE.md: 20 sentinel
    # goldens + 5 golden-era-artifact cases). A NEW name in the miss set
    # is a regression even if the count still clears 120.
    known_misses = {
        "apartmenttherapy.com1", "apartmenttherapy.com2", "backstage.com1",
        "bhg.com1", "bostonherald.com1", "cricket.com.au2",
        "dailystar.co.uk1", "dailystar.co.uk2", "newyorker.com1",
        "pixable.com1", "pixable.com2", "pixelmonkey.org1",
        "pixelmonkey.org2", "readwrite.com1", "recipe.com1", "slate.com1",
        "theatlantic.com1", "thedebrief.co.uk1", "thedebrief.co.uk2",
        "thekitchn.com1", "thekitchn.com2", "thenextweb.com1",
        "theroot.com1", "wetpaint.com1", "wetpaint.com2",
    }
    misses = []
    for hf, tf in pairs:
        with open(hf, "rb") as f:
            html = f.read()
        with open(tf, encoding="utf-8", errors="replace") as f:
            golden = f.read()
        try:
            got = extract_article(
                html, url="http://" + os.path.basename(hf)[:-5] + "/x")["text"]
        except Exception:
            got = ""
        if got.strip() != golden.strip():
            misses.append(os.path.basename(hf)[:-5])
    exact = len(pairs) - len(misses)
    assert exact >= 120, f"fixture regression: only {exact}/145 byte-exact"
    new = sorted(set(misses) - known_misses)
    assert not new, f"NEW fixture misses (kernel regression): {new}"


def test_thai_fulltext_extract():
    """multilanguage_test.py:74-82 — the th golden is byte-exact under the
    longest-match dictionary segmenter standing in for pythainlp
    (stopwords.py StopWordsThai)."""
    with open(HTML_DIR + "/thai_article.html", encoding="utf-8") as f:
        html = f.read()
    with open(TEXT_DIR + "/thai.txt", encoding="utf-8") as f:
        golden = f.read()
    assert fulltext(html, "th") == golden


def test_thai_stopword_segmentation():
    """Thai runs segment into dictionary words + unknown chunks; stopword
    counts are non-zero on ordinary Thai prose."""
    from stimson_web_scraper_ray.functions.stopwords import StopWordsThai

    ws = StopWordsThai().get_stopword_count(
        "ผู้สื่อข่าวได้รับแจ้งจากนายที่หายไปว่าเป็นของจริง")
    assert ws.get_stopword_count() >= 3
    assert ws.get_word_count() > ws.get_stopword_count()


def test_japanese_stopword_segmentation():
    """ja longest-match segmentation reproduces tinysegmenter's
    published example splits (the upstream library's README sentence
    and the basic-copula pattern), and counts function words on prose."""
    from stimson_web_scraper_ray.functions.stopwords import (
        StopWordsJapanese,
    )

    s = StopWordsJapanese()
    # tinysegmenter's canonical README example
    assert s.candidate_words("私の名前は中野です") == \
        ["私", "の", "名前", "は", "中野", "です"]
    assert s.candidate_words("これは本です") == ["これ", "は", "本", "です"]
    ws = s.get_stopword_count("私の名前は中野です")
    assert ws.get_stopword_count() == 4          # 私 の は です
    assert ws.get_word_count() == 6
    # mixed latin/ja: non-ja runs pass through whole
    assert s.candidate_words("hello 世界です") == ["hello", "世界", "です"]


def test_extract_stage_poisoned_rows_isolated(ray_session):
    """A poisoned page (None html, binary garbage) becomes an error/empty
    row — it must never kill its Arrow block or its neighbors."""
    import pyarrow as pa
    import ray.data as rd

    from stimson_web_scraper_ray.stages.extract_stage import ExtractArticles

    rows = pa.table({
        "url": pa.array(["http://a.com/good.html", "http://a.com/none.html",
                         "http://a.com/garbage.html"], pa.string()),
        "html": pa.array(
            [b"<html><body><p>a perfectly good paragraph with plenty of "
             b"words for the scorer to keep and format</p></body></html>",
             None,
             b"\xff\xfe\x00\x01 utter garbage \x00"], pa.binary()),
        "lang": pa.array(["en", "en", "en"], pa.string()),
    })
    out = rd.from_arrow(rows).map_batches(
        ExtractArticles, batch_format="pyarrow", batch_size=3,
        concurrency=1).to_pandas().sort_values("url").reset_index(drop=True)
    assert len(out) == 3                      # nothing dropped, no raise
    good = out[out["url"] == "http://a.com/good.html"].iloc[0]
    assert good["status"] == "ok" and "good paragraph" in good["text"]
    # poisoned rows degrade to ok-with-empty-text (decode replacement) or
    # an error status — either way the block survives with empty text
    for u in ("http://a.com/none.html", "http://a.com/garbage.html"):
        row = out[out["url"] == u].iloc[0]
        assert row["text"] == ""
        assert row["status"] == "ok" or row["status"].startswith("error")


def test_extract_stage_passes_through_user_columns(ray_session):
    """additional_data semantics (reference article.py:176, SURVEY §2.10):
    columns the kernel doesn't produce ride through extraction untouched;
    `html` is consumed and extracted columns supersede same-named input."""
    import pyarrow as pa
    import ray.data as rd

    from stimson_web_scraper_ray.stages.extract_stage import ExtractArticles

    rows = pa.table({
        "url": pa.array(["http://a.com/p.html"], pa.string()),
        "html": pa.array([b"<html><body><p>words enough to pass the "
                          b"scorer and come out the other side</p>"
                          b"</body></html>"], pa.binary()),
        "lang": pa.array(["en"], pa.string()),
        "crawl_tag": pa.array(["batch-7"], pa.string()),      # user column
        "text": pa.array(["GOLDEN, not extracted"], pa.string()),
    })
    out = rd.from_arrow(rows).map_batches(
        ExtractArticles, batch_format="pyarrow", concurrency=1).to_pandas()
    assert out.loc[0, "crawl_tag"] == "batch-7"               # rode along
    assert "html" not in out.columns                          # consumed
    assert "words enough" in out.loc[0, "text"]               # superseded
