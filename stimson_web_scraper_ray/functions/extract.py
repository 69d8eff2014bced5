"""The per-row extraction invariant kernel: html bytes → article fields.

Composes decode (parser.py:52-64) → parse → metadata (article.py:245-280)
→ clean (document_cleaner.py:63-83) → best node (content_extractor.py:
610-672) → post_cleanup → format (output_formatter.py:43-79) → set_*
normalizers (article.py:637-717), reproducing ``Article.parse()``
(article.py:227-302) and the pure ``fulltext()`` composition
(utils.py:269-294).

Everything here is a pure function of (html, url, language, config): the
DOM never crosses the function boundary, exactly as in the reference where
only strings cross stage boundaries (SURVEY.md §3.1). This is what makes a
single fused ``map_batches`` semantically exact.
"""

from __future__ import annotations

import copy
import hashlib
import json

from ..config import EngineConfig
from . import dom, metadata
from .cleaner import DocumentCleaner
from .formatter import OutputFormatter
from .pdf import extract_pdf, is_pdf
from .scoring import BestNodeScorer
from .urlnorm import extract_domain, prepare_url

_DATE_FORMAT = "%Y-%m-%d"  # article.py:44

LANGUAGE_CODES = frozenset(
    "af ar bg bn ca cs da de el en es et eu fa fi fr ga gu he hi hr hu hy id "
    "is it ja kn ko lb lij lt lv ml mr nb nl pl pt ro ru si sk sl sq sr sv "
    "ta te th tl tr tt uk ur vi xx yo zh".split()
)  # utils.py:192-253


def fulltext(html, language: str = "en") -> str:
    """html → body text; byte-compatible with reference ``fulltext()``
    (utils.py:269-294). No normalizers applied (those are Article.set_text's
    job, see extract_article)."""
    doc = dom.fromstring(html)
    cleaner = DocumentCleaner()
    scorer = BestNodeScorer(language)
    formatter = OutputFormatter(language)
    doc = cleaner.clean(doc)
    top_node = scorer.calculate_best_node(doc, html)
    if top_node is None:
        return ""
    top_node = scorer.post_cleanup(top_node)
    return formatter.get_formatted(top_node)


def _normalize_text(text: str, meta_lang: str | None, max_len: int) -> str:
    """Article.set_text / set_title semantics (article.py:637-658): en-only
    single-pass double-space collapse, then truncation."""
    if not text:
        return ""
    if meta_lang == "en":
        text = text.replace("  ", " ")
    return text[:max_len]


def harvest_outlinks_from_doc(doc, page_url: str) -> list[str]:
    """<a href> harvest off an already-parsed DOM (M21): absolutize via
    prepare_url(href, page_url), order-preserving dedup."""
    out, seen = [], set()
    for a in dom.get_elements_by_tag(doc, tag="a"):
        href = a.attrib.get("href")
        if not href:
            continue
        prepared = prepare_url(href, page_url)
        if prepared and prepared not in seen:
            seen.add(prepared)
            out.append(prepared)
    return out


def harvest_anchors_from_doc(doc, page_url: str) -> list:
    """(absolutized href, inner-trimmed anchor text) pairs in document
    order, one row PER OCCURRENCE — anchor corpora weight targets by
    citation count, so unlike harvest_outlinks_from_doc (M21's deduped
    frontier feed) repeats are signal, not noise."""
    out = []
    for a in dom.get_elements_by_tag(doc, tag="a"):
        href = a.attrib.get("href")
        if not href:
            continue
        prepared = prepare_url(href, page_url)
        if prepared:
            out.append((prepared, dom.inner_trim(a.text_content())))
    return out


def extract_article(html, url: str = "", language: str = "en",
                    config: EngineConfig | None = None,
                    collect_outlinks: bool = False) -> dict:
    """Full ``Article.parse()`` equivalent (article.py:227-302). Returns a
    flat dict of article fields (schema SURVEY.md §1.2); nested meta_data is
    JSON-encoded. Never raises on malformed input — error text goes to the
    ``status`` field so a poisoned page cannot kill an Arrow block
    (mirrors exhaustive_test.py:55-58 per-url try/except)."""
    cfg = config or EngineConfig()
    out = {
        "url": url, "canonical_link": "", "link_hash": "",
        "title": "", "text": "", "summary": "",
        "authors": [], "publish_date": "",
        "meta_lang": "", "meta_description": "", "meta_keywords": [],
        "meta_site_name": "", "meta_favicon": "", "meta_data": "{}",
        "tags": [], "top_image": "", "images": [], "movies": [],
        "meta_refresh_url": "", "tables": "[]",
        "workflow": ["INIT", "DOWNLOADED"], "status": "ok",
    }
    try:
        if isinstance(html, (bytes, bytearray)) and is_pdf(bytes(html)):
            # PDF branch (network.py:77-88; article.py:204-210): text +
            # author + creation date, straight to PARSED, no HTML parse
            pdf = extract_pdf(bytes(html))
            out.update({k: pdf[k] for k in
                        ("text", "publish_date", "status", "workflow")})
            out["authors"] = pdf["authors"] or (
                [extract_domain(url)[0]] if url else [])
            if not out["publish_date"]:
                out["publish_date"] = cfg.run_date
            out["link_hash"] = hashlib.md5(bytes(html)).hexdigest()
            return out
        html_text = dom.decode_html(html)
        out["link_hash"] = hashlib.md5(
            html_text.encode("utf-8", "replace")).hexdigest()  # utils.py:39-45 (time suffix dropped: non-deterministic)
        doc = dom.fromstring(html_text)
        # The reference deepcopies the doc (article.py:232) only because it
        # cleans FIRST and extracts metadata from the pristine copy; every
        # metadata extractor is a pure reader, so running the whole metadata
        # pass (and outlink/image harvest) BEFORE cleaning is equivalent and
        # saves a full-tree copy per page (~5% of kernel time).
        clean_doc = doc
        # read-only pass → one tree walk per distinct tag
        with dom.tag_cache():
            if collect_outlinks:
                out["outlinks"] = harvest_outlinks_from_doc(clean_doc, url)

            # metadata pass over the *not-yet-cleaned* doc (article.py:245-280)
            title = metadata.get_title(clean_doc)
            meta_lang = metadata.get_meta_lang(clean_doc)
            if meta_lang and meta_lang in LANGUAGE_CODES:
                out["meta_lang"] = meta_lang  # set_meta_language, article.py:725-730
            effective_lang = out["meta_lang"] or language

            authors = metadata.get_authors(clean_doc)
            # set_authors (article.py:707-717): dedup already done; cap; tld fallback
            final_authors = []
            for a in authors:
                if a and a not in final_authors and len(final_authors) < cfg.max_authors:
                    final_authors.append(a)
            if not final_authors and url:
                final_authors.append(extract_domain(url)[0])
            out["authors"] = final_authors

            # meta-refresh target (utils.py:111-131; followed ≤1 hop by the
            # crawl round loop instead of download-time recursion)
            for el in dom.get_elements_by_tag(clean_doc, tag="meta"):
                if (el.attrib.get("http-equiv") or "").lower() == "refresh":
                    content = el.attrib.get("content", "")
                    if ";" in content:
                        _wait, url_part = content.split(";", 1)
                        if url_part.lower().startswith("url="):
                            out["meta_refresh_url"] = url_part[4:] \
                                .replace('"', "").replace("'", "")
                    break
            out["meta_favicon"] = metadata.get_favicon(clean_doc)
            out["meta_site_name"] = metadata.get_meta_site_name(clean_doc)
            out["meta_description"] = metadata.get_meta_description(clean_doc)
            out["canonical_link"] = metadata.get_canonical_link(url, clean_doc)
            out["tags"] = sorted(metadata.extract_tags(clean_doc))
            mk = metadata.get_meta_keywords(clean_doc)
            out["meta_keywords"] = [k.strip() for k in mk.split(",")] if mk else []  # article.py:732-735
            out["meta_data"] = json.dumps(metadata.get_meta_data(clean_doc),
                                          sort_keys=True, ensure_ascii=False)
            pub = metadata.get_publishing_date(url, clean_doc)
            out["publish_date"] = pub.strftime(_DATE_FORMAT) if pub else cfg.run_date
            # (reference defaults publish_date to *today* when absent,
            #  article.py:126-127 — frozen to cfg.run_date for determinism)
            meta_img = metadata.get_meta_img_url(url, clean_doc)
            out["images"] = sorted(metadata.get_img_urls(url, clean_doc))

        # body pass over the cleaned DOM (article.py:283-295)
        scorer = BestNodeScorer(language)
        formatter = OutputFormatter(language)
        if cfg.use_meta_language and out["meta_lang"]:
            scorer.update_language(out["meta_lang"])
            formatter.update_language(out["meta_lang"])
        cleaner = DocumentCleaner(cfg)
        doc = cleaner.clean(doc)
        top_node = scorer.calculate_best_node(doc, html_text)
        if top_node is not None:
            out["movies"] = [prepare_url(m) for m in
                             metadata.get_videos(top_node) if m]
            top_node = scorer.post_cleanup(top_node)
            text = formatter.get_formatted(top_node)
            out["text"] = _normalize_text(text, out["meta_lang"], cfg.max_text)
            out["top_image"] = (meta_img
                                or metadata.get_first_img_url(url, top_node))
        else:
            out["top_image"] = meta_img

        if ".wikipedia.org/wiki/" in url.lower():
            # wikitable pass, wikipedia-only like the reference
            # (article.py:299-301) but on the already-fetched html instead
            # of a re-download
            out["tables"] = json.dumps(parse_tables(html_text, url),
                                       ensure_ascii=False)
        # set_title runs BEFORE set_meta_language in Article.parse
        # (article.py:245-253), so no en double-space collapse applies here
        out["title"] = title[:cfg.max_text]
        out["workflow"] = ["INIT", "DOWNLOADED", "PARSED"]
    except Exception as exc:  # noqa: BLE001 — error rows, not exceptions
        out["status"] = f"error: {type(exc).__name__}: {exc}"
    return out


def parse_tables(html, url: str = "") -> list[dict]:
    """Wikitable → {name, rows} with colspan/rowspan expansion
    (article.py:461-529; applied to wikipedia.org pages only,
    article.py:299-301). Uses the already-fetched html instead of
    re-downloading like the reference does."""
    doc = dom.fromstring(html)
    tables_out = []
    wikitables = [t for t in dom.get_elements_by_tag(doc, tag="table")
                  if "wikitable" in (t.attrib.get("class") or "")]
    for tn, table in enumerate(wikitables):
        captions = dom.get_elements_by_tag(table, tag="caption")
        name = dom.get_text(captions[0]).rstrip() if captions else f"{tn}"
        rows = dom.get_elements_by_tag(table, tag="tr")
        cells_per_row = [dom.get_elements_by_tag(r, tag="th")
                         + dom.get_elements_by_tag(r, tag="td")
                         for r in rows]
        if not rows:
            tables_out.append({"name": name, "rows": []})
            continue
        ncols = max(len(c) for c in cells_per_row)
        data = [["" for _ in range(ncols)] for _ in range(len(rows))]
        for i, row_cells in enumerate(cells_per_row):
            for j, cell in enumerate(row_cells):
                cspan = int(cell.attrib.get("colspan", 1) or 1)
                rspan = int(cell.attrib.get("rowspan", 1) or 1)
                text = cell.text_content()
                shift = 0
                for k in range(rspan):
                    if i + k >= len(data):
                        break
                    try:
                        while data[i + k][j + shift]:
                            shift += 1
                    except IndexError:
                        if shift:
                            shift -= 1
                    for m in range(cspan):
                        cell_n = min(j + shift + m, len(data[i + k]) - 1)
                        data[i + k][cell_n] += text
        tables_out.append({"name": name, "rows": data})
    return tables_out
