"""NLP tier, patterns, PDF branch, sinks, CLI — the coverage-completing
operators of SURVEY.md §2."""

import json
import subprocess
import sys

import pyarrow as pa
import pytest

from stimson_web_scraper_ray.functions import nlp, pdf, textutil
from stimson_web_scraper_ray.functions.extract import extract_article

TEXT = ("The engine crawls pages politely and extracts articles from the "
        "web. Extraction uses a scoring model over paragraph nodes. "
        "The scoring model counts stopwords in every candidate paragraph. "
        "Paragraph nodes with many stopwords win the scoring. "
        "A frontier schedules the crawling of every new page. "
        "The frontier is partitioned by host for politeness.")


def test_xx_keywords_algebra():
    kws = nlp.xx_keywords("apple apple apple banana banana cherry 42 42 42")
    # sorted by (freq, word) desc, numerics dropped (article.py:427-459)
    assert kws[0] == "apple"
    assert "42" not in kws
    assert "banana" in kws and "cherry" in kws


def test_textrank_keywords_nonempty_and_relevant():
    kws = nlp.textrank_keywords(TEXT, "en", 10)
    assert kws
    assert any(k.lower() in ("scoring", "paragraph", "frontier", "stopwords",
                             "model", "nodes") for k in kws)
    # deterministic
    assert kws == nlp.textrank_keywords(TEXT, "en", 10)


def test_document_keywords_fallback():
    # degenerate text → textrank empty → frequency fallback fires
    assert nlp.document_keywords("word word word", "en") == ["word"]


def test_summarize_first_five_sentences():
    s = nlp.summarize(TEXT, 5)
    assert s.startswith("The engine crawls")
    assert "partitioned by host" not in s  # 6th sentence dropped
    assert len(nlp.split_sentences(TEXT)) == 6


def test_patterns():
    assert textutil.get_email("reach me at foo.bar@example.com; thanks") == \
        "foo.bar@example.com"
    assert textutil.get_email("no email here") is None
    assert textutil.get_mobile_number("call 415-555-2671 now") is not None
    assert textutil.get_voltage("12 volts") is None
    assert textutil.domain_to_filename("cnn.com/") == "cnn.com.txt"
    assert textutil.is_media_news("http://x.co/video/abc")
    assert not textutil.is_media_news("http://x.co/story/abc")


def test_pdf_branch():
    payload = pdf.make_minimal_pdf(
        ["Hello world from a PDF.", "Second line."],
        author="Jane Author", creation="20140210")
    assert pdf.is_pdf(payload)
    art = extract_article(payload, url="http://x.co/report/file.pdf")
    assert art["status"] == "ok"
    assert "Hello world from a PDF." in art["text"]
    assert art["authors"] == ["Jane Author"]
    assert art["publish_date"] == "2014-02-10"
    assert art["workflow"] == ["INIT", "DOWNLOADED", "PARSED"]


def test_pdf_unsupported_is_error_row_not_exception():
    art = extract_article(b"%PDF-1.4\ncompressed gibberish only")
    assert art["status"] == "pdf_unsupported"
    assert art["text"] == ""


def test_wikitable_column():
    html = ('<html><body><table class="wikitable"><caption>T</caption>'
            "<tr><th>a</th><th>b</th></tr><tr><td>1</td><td>2</td></tr>"
            "</table><p>Some of the words that we have all seen before "
            "and liked a lot.</p></body></html>")
    art = extract_article(html, url="http://en.wikipedia.org/wiki/Thing")
    tables = json.loads(art["tables"])
    assert tables[0]["name"] == "T"
    assert tables[0]["rows"][1] == ["1", "2"]


def test_nlp_stage_batch(ray_session):
    import ray.data as rd

    from stimson_web_scraper_ray.stages.nlp_stage import NlpArticles

    ds = rd.from_items([{"text": TEXT, "meta_lang": "en"}] * 4)
    out = ds.map_batches(NlpArticles, batch_format="pyarrow",
                         concurrency=1).to_pandas()
    assert len(out) == 4
    assert all(len(k) > 0 for k in out["keywords"])
    assert out["summary"].str.startswith("The engine").all()


def test_tables_tsv_sink(ray_session, tmp_path):
    import ray.data as rd

    from stimson_web_scraper_ray.sources.sinks import write_tables_tsv

    tables_json = json.dumps([{"name": "T", "rows": [["a", "b"], ["1", "2"]]}])
    ds = rd.from_items([{"url": "http://x.co/1", "tables": tables_json}])
    out_dir = str(tmp_path / "tsv")
    write_tables_tsv(ds, out_dir)
    import glob

    files = glob.glob(out_dir + "/*")
    assert files
    content = open(files[0]).read()
    assert "a\tb" in content


def test_articles_json_sink_roundtrip(ray_session, tmp_path):
    """S7: article JSON-lines sink writes rows ray.data can read back
    identically (url/title/text survive, row count preserved)."""
    import glob
    import ray.data as rd

    from stimson_web_scraper_ray.sources.sinks import write_articles_json

    rows = [{"url": f"http://x.co/{i}", "title": f"T{i}",
             "text": f"body {i}", "status": 200} for i in range(5)]
    out_dir = str(tmp_path / "json")
    write_articles_json(rd.from_items(rows), out_dir)
    files = glob.glob(out_dir + "/*.json")
    assert files
    back = rd.read_json(out_dir).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert len(back) == 5
    assert back["title"].tolist() == [f"T{i}" for i in range(5)]
    assert back["text"].tolist() == [f"body {i}" for i in range(5)]
    # every line is standalone JSON (the Article.get_json contract)
    line = open(files[0]).readline()
    assert json.loads(line)["url"].startswith("http://x.co/")


def test_articles_json_sink_full_schema_roundtrip(ray_session, tmp_path):
    """S7 at the REAL articles schema: extract actual pages (all 22
    ARTICLE_FIELDS columns incl. the nested list<string> ones), write
    JSON lines, read back with ray.data, and require value equality per
    url for every column — the full-fidelity sink contract."""
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.config import EngineConfig
    from stimson_web_scraper_ray.sources.pages import pages_path_for
    from stimson_web_scraper_ray.sources.sinks import write_articles_json
    from stimson_web_scraper_ray.stages.extract_stage import (
        ARTICLE_FIELDS,
        ExtractArticles,
    )

    pages_path = pages_path_for("/root/testdata/sf0.001")
    pages = rd.read_parquet(pages_path, columns=["url", "html", "lang"]) \
        .limit(12)
    arts = pages.map_batches(ExtractArticles, batch_format="pyarrow",
                             batch_size=12, concurrency=1,
                             fn_constructor_kwargs={
                                 "config": EngineConfig()}).to_pandas()
    assert len(arts) == 12
    out_dir = str(tmp_path / "articles_json")
    write_articles_json(rd.from_pandas(arts), out_dir)
    back = rd.read_json(out_dir).to_pandas()
    assert len(back) == 12
    a = arts.sort_values("url").reset_index(drop=True)
    b = back.sort_values("url").reset_index(drop=True)
    list_cols = {name for name, typ in ARTICLE_FIELDS
                 if typ == pa.list_(pa.string())}
    for name, _typ in ARTICLE_FIELDS:
        assert name in b.columns, f"column {name} lost by the JSON sink"
        if name in list_cols:
            av = [list(x) if x is not None else [] for x in a[name]]
            bv = [list(x) if x is not None else [] for x in b[name]]
        else:
            av, bv = a[name].tolist(), b[name].tolist()
            if name == "publish_date":
                # the JSON READER type-infers ISO date strings into
                # timestamps; the sink wrote the string faithfully
                bv = ["" if pd.isna(x) else
                      (x.strftime("%Y-%m-%d")
                       if hasattr(x, "strftime") else str(x))
                      for x in bv]
                av = [x or "" for x in av]
        assert av == bv, f"column {name} changed through the round-trip"
    # nested-list columns must carry real content somewhere in the sample
    assert any(len(x) for x in a["workflow"]), "workflow column empty"
    assert any(len(x) for x in a["meta_keywords"]), "keywords empty"


def test_cli_html_file(tmp_path):
    html_path = tmp_path / "page.html"
    html_path.write_text(
        "<html lang='en'><head><title>T Story Here</title></head><body>"
        "<div><p>One of the many things that we all know about the world "
        "is that it keeps on turning around all of us every day.</p>"
        "<p>Another of the many things that we all know about the world "
        "is that the sun comes up in the morning for all of us.</p>"
        "<p>A third of the many things that we all know is that the rain "
        "falls down on everyone there at some point in the day.</p>"
        "</div></body></html>")
    proc = subprocess.run(
        [sys.executable, "-m", "stimson_web_scraper_ray",
         "-u", "http://x.co/2014/02/10/t-story", "--html-file",
         str(html_path), "--json"],
        capture_output=True, text=True, cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr
    art = json.loads(proc.stdout)
    assert art["title"] == "T Story Here"
    assert art["text"].startswith("One of the many things")
    assert art["keywords"]


def test_textrank_cnn_keyword_parity():
    """article_test.py:194-208 expects a 12-keyword set from the spaCy
    NOUN/PROPN TextRank. The tagger-free approximation (binary window
    adjacency, self-pairs, pre-lowered text, NUM/-ly exclusion —
    named_entity_recognition.py:67-103 algebra) reaches >=10/12 on the
    cnn fixture. Ratchet up, never down."""
    from stimson_web_scraper_ray.functions.extract import extract_article
    from stimson_web_scraper_ray.functions.nlp import textrank_keywords

    html = open(
        "/root/reference/tests/fixtures/html/cnn_article.html", "rb").read()
    art = extract_article(html, url="http://cnn.com/x")
    kws = textrank_keywords(art["text"], "en", 10)
    expect = {"storm", "weather", "new", "york", "flight", "balloons",
              "roads", "delays", "parade", "people", "winds", "snow"}
    assert len(set(kws) & expect) >= 10
    assert all(k == k.lower() for k in kws)   # analyze(text.lower())


def test_fast_date_parse_matches_dateutil():
    """parse_date_str's regex fast path must agree with dateutil on every
    string its grammar accepts (metadata.py::_FAST_DATE); anything else
    falls through to dateutil by construction, so agreement on the
    accepted set IS full parity."""
    from dateutil.parser import parse as du

    from stimson_web_scraper_ray.functions.metadata import (
        _FAST_DATE,
        parse_date_str,
    )

    accepted = [
        "2014-06-01", "2014/06/01", "2014-6-1", "1999/12/31",
        "2014-01-01T10:00:00Z", "2023-04-05T12:30:00+05:30",
        "2023-04-05t12:30:00z", "2020-02-29 23:59:59",
        "2020-07-01T00:00:00-08:00", "2020-07-01T00:00:00-0800",
        "2021-11-03T04:05:06.123Z", "2021-11-03T04:05:06.123456+00:00",
        "  2014-06-01  ", "2014-06-01T10:30",
    ]
    for s in accepted:
        assert _FAST_DATE.match(s), s
        assert parse_date_str(s) == du(s), s
    # rejected by the fast grammar or by date validation → dateutil rules
    fall_through = ["June 1, 2014", "2014-13-05", "01-06-2014",
                    "2014-02-30", "20140601", "2014-06-01T10:00:00EST"]
    for s in fall_through:
        got = parse_date_str(s)
        try:
            want = du(s)
        except (ValueError, OverflowError):
            want = None
        assert got == want, (s, got, want)
