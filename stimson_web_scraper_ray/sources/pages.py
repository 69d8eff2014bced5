"""The ``pages`` input table (BASELINE.json ``input_hint``):

    url: string, warc_ts: timestamp[us], html: binary, text: string,
    lang: string

Synthesized deterministically (seed fixed, no external data) from the
driver's ``documents`` table per FIXTURES.md §1: news-style URLs across a
Zipf-skewed host set (one heavy host to exercise salted splits), template
HTML with og:/author/date metas, boilerplate divs matching the cleaner
kill-list (document_cleaner.py:26-42), a nav link farm (high link density)
and ``<a href>`` outlinks wiring the crawl graph; the golden ``text``
column is produced by the engine's own reference-semantics kernel
(functions.extract.fulltext + set_text normalization, validated separately
against the reference fixture corpus in tests/test_extract.py).
"""

from __future__ import annotations

import datetime
import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.extract import _normalize_text, fulltext

HOSTS = (
    ["news.bignews.com"] * 6          # heavy host: ~30% of rows (Zipf head)
    + ["www.dailytimes.com"] * 3
    + ["www.cityherald.com"] * 3
    + ["journal.example.org"] * 2
    + ["www.smallpress.net"] * 2
    + ["blog.nicheoutlet.io"] * 2
    + ["www.lonelywire.co"] * 1
    + ["www.quietpost.com"] * 1
)

_BASE_TS = datetime.datetime(2014, 6, 1)

_FILLER = (
    "the report said that many of the people there were not able to see "
    "what would come next and the group has said it will make more of an "
    "effort to find out how all of this could have happened over the years"
).split()

# per-language stopword-dense filler so the goose scorer (which counts
# language-specific stopwords) fires on non-English pages too
_FILLER_BY_LANG = {
    "en": _FILLER,
    "es": ("el informe dice que muchas de las personas no han podido ver lo "
           "que viene y el grupo ha dicho que va a hacer más de un esfuerzo "
           "para saber cómo todo esto pudo pasar durante los años").split(),
    "de": ("der bericht sagt dass viele von den menschen dort nicht sehen "
           "konnten was als nächstes kommt und die gruppe hat gesagt dass "
           "sie mehr tun wird um zu erfahren wie das alles über die jahre "
           "passieren konnte").split(),
    "fr": ("le rapport dit que beaucoup de ces personnes ne pouvaient pas "
           "voir ce qui allait venir et le groupe a dit que il va faire "
           "plus de efforts pour savoir comment tout cela a pu se passer "
           "pendant les années").split(),
    "zh": list("的了是在我有他这中大来上个到说们为你地出道也时年得就那要下"),
    "ar": ("في من على إلى عن أن كان هذا هذه التي الذي ما لا لم هو هي نحن "
           "ثم لكن إذا كل بعد قبل مع قد").split(),
}


def _filler_for(lang: str):
    return _FILLER_BY_LANG.get((lang or "en")[:2], _FILLER)


def _slug_words(doc_text: str, rng: np.random.Generator) -> str:
    words = [w for w in doc_text.split()[:8] if w.isalpha()][:6]
    while len(words) < 6:
        words.append(_FILLER[int(rng.integers(len(_FILLER)))])
    return "-".join(words)


def _page_url(i: int, doc_text: str, rng: np.random.Generator) -> tuple[str, str]:
    host = HOSTS[i % len(HOSTS)]
    slug = _slug_words(doc_text, rng)
    kind = i % 10
    if kind < 5:    # date-in-path article url (valid_url: DATE_REGEX branch)
        month = (i % 12) + 1
        day = (i % 27) + 1
        path = f"/2014/{month:02d}/{day:02d}/{slug}.html"
    elif kind < 8:  # GOOD_PATHS branch
        good = ["story", "article", "news"][i % 3]
        path = f"/{good}/section{i % 7}/{slug}.html"
    else:           # slug-with->4-dashes branch
        path = f"/posts/{slug}-{i}-part-two-of-many.html"
    return f"http://{host}{path}", host


def _reject_url(i: int) -> str:
    """Shapes valid_url must reject (urls.py:106-241)."""
    host = HOSTS[i % len(HOSTS)]
    choices = [
        f"http://{host}/about/",
        f"http://{host}/contact/us.html",
        f"http://{host}/images/pic{i}.jpg",
        f"http://{host}/careers/",
        f"http://{host}/tag/stuff",
    ]
    return choices[i % len(choices)]


def _paragraphize(text: str, rng: np.random.Generator,
                  lang: str = "en") -> list[str]:
    """Split a document's word stream into 3-8 stopword-rich paragraphs,
    interleaving filler in the page's own language so the per-language
    stopword scorer fires (non-en pages extract real text, not '')."""
    filler = _filler_for(lang)
    words = text.split()
    if len(words) < 30:
        words = (words + filler * 3)[: max(60, len(words) * 3)]
    paras, i = [], 0
    n_paras = 3 + int(rng.integers(6))
    per = max(18, len(words) // n_paras)
    while i < len(words) and len(paras) < n_paras:
        chunk = words[i:i + per]
        i += per
        # interleave filler (stopword-dense) so the goose scorer fires
        merged = []
        for j, w in enumerate(chunk):
            merged.append(w)
            if j % 3 == 2:
                merged.append(filler[(i + j) % len(filler)])
        paras.append(" ".join(merged).capitalize() + ".")
    return paras or ["The quick brown fox jumped over all of the lazy dogs."]


def build_page_html(i: int, doc_text: str, lang: str, url: str,
                    outlinks: list[str], rng: np.random.Generator) -> bytes:
    title_main = " ".join(doc_text.split()[:5]).title() or f"Story {i}"
    site = url.split("/")[2].split(".")[-2].title()
    paras = _paragraphize(doc_text, rng, lang)
    month = (i % 12) + 1
    day = (i % 27) + 1
    author = f"Alex Writer{i % 17}"
    nav = "".join(f'<a href="{o}">read {j}</a> ' for j, o in enumerate(outlinks))
    body_paras = "\n".join(f"<p>{p}</p>" for p in paras)
    inline_link = (f'<p>Also of note to all of those who were there is '
                   f'<a href="{outlinks[0]}">this related story</a> which many '
                   f'of the people had already seen before the day was '
                   f'over.</p>' if outlinks else "")
    meta_refresh = ""
    if i % 97 == 3:  # a few meta-refresh pages (utils.py:111-131 path)
        target = outlinks[0] if outlinks else url
        meta_refresh = f'<meta http-equiv="refresh" content="0;URL=\'{target}\'">'
    html = f"""<!DOCTYPE html>
<html lang="{lang}"><head>
<meta charset="utf-8">
<title>{title_main} | {site} News</title>
<meta property="og:title" content="{title_main}">
<meta property="og:site_name" content="{site} News">
<meta name="description" content="{' '.join(doc_text.split()[:12])}">
<meta name="author" content="{author}">
<meta property="article:published_time" content="2014-{month:02d}-{day:02d}T10:00:00Z">
<meta name="keywords" content="news, {lang}, section{i % 7}">
<link rel="canonical" href="{url}">
<link rel="shortcut icon" href="http://{url.split('/')[2]}/favicon.ico">
{meta_refresh}
</head>
<body class="page">
<div class="navbar">{nav}</div>
<div id="breadcrumbs"><a href="/">home</a> / <a href="/news">news</a></div>
<h1>{title_main}</h1>
<div class="byline">By {author}</div>
<article>
<div class="article-body" itemprop="articleBody">
{body_paras}
{inline_link}
</div>
</article>
<div class="social-tools"><a href="http://twitter.com/share">tweet</a></div>
<div class="footer"><p>About us and contact and careers and terms of use here.</p></div>
<script>var x = 1; // tracking</script>
</body></html>"""
    return html.encode("utf-8")


def synthesize_pages(n_docs_source, seed: int = 42,
                     copies: int = 1) -> pa.Table:
    """documents rows (list of (doc_id, text, lang)) → pages arrow table.

    Deterministic in (inputs, seed). ``copies`` > 1 replicates each doc into
    that many distinct pages (distinct urls + a variation word in the text)
    to scale the table for throughput benchmarks without external data."""
    rng = np.random.default_rng(seed)
    rows = list(n_docs_source)
    if copies > 1:
        rows = [(doc_id * copies + c,
                 f"{text} variation copy {c} edition" if text else text,
                 lang)
                for (doc_id, text, lang) in rows for c in range(copies)]
    n = len(rows)

    urls, hosts = [], []
    for i, (_doc_id, text, _lang) in enumerate(rows):
        u, h = _page_url(i, text or "", rng)
        urls.append(u)
        hosts.append(h)

    # outlink graph: each page links to ~6 other pages (deterministic ring
    # + skip edges) plus one reject-shaped url
    all_out = []
    for i in range(n):
        outs = [urls[(i * 3 + k + 1) % n] for k in range(5)]
        outs.append(_reject_url(i))
        all_out.append(outs)

    htmls, texts, ts = [], [], []
    for i, (_doc_id, text, lang) in enumerate(rows):
        lang = (lang or "en")[:2]
        html = build_page_html(i, text or "", lang, urls[i], all_out[i], rng)
        htmls.append(html)
        golden = _normalize_text(fulltext(html, lang), lang, 100_000)
        texts.append(golden)
        ts.append(_BASE_TS + datetime.timedelta(
            minutes=int(i) * 7 + int(rng.integers(5))))

    langs = [(r[2] or "en")[:2] for r in rows]
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(ts, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })


def _synthesize_pages_parallel(rows: list, seed: int = 42) -> pa.Table:
    """Ray-parallel page synthesis for large tables: plan urls/outlinks on
    the driver (cheap string work), fan the expensive part (html render +
    golden fulltext) out over map_batches. Requires an active Ray session."""
    import ray.data as rd

    rng = np.random.default_rng(seed)
    n = len(rows)
    urls = []
    for i, (_doc_id, text, _lang) in enumerate(rows):
        u, _h = _page_url(i, text or "", rng)
        urls.append(u)
    all_out = [[urls[(i * 3 + k + 1) % n] for k in range(5)] + [_reject_url(i)]
               for i in range(n)]

    plan = pa.table({
        "i": pa.array(range(n), pa.int64()),
        "doc_text": pa.array([r[1] or "" for r in rows], pa.string()),
        "lang": pa.array([(r[2] or "en")[:2] for r in rows], pa.string()),
        "url": pa.array(urls, pa.string()),
        "outlinks": pa.array(all_out, pa.list_(pa.string())),
    })

    def render(batch: pa.Table) -> pa.Table:
        out_urls, out_ts, out_html, out_text, out_lang = [], [], [], [], []
        for i, text, lang, url, outs in zip(
                batch["i"].to_pylist(), batch["doc_text"].to_pylist(),
                batch["lang"].to_pylist(), batch["url"].to_pylist(),
                batch["outlinks"].to_pylist()):
            # per-row rng keyed by index → deterministic under any sharding
            row_rng = np.random.default_rng(seed * 1_000_003 + i)
            html = build_page_html(i, text, lang, url, outs, row_rng)
            golden = _normalize_text(fulltext(html, lang), lang, 100_000)
            out_urls.append(url)
            out_ts.append(_BASE_TS + datetime.timedelta(
                minutes=i * 7 + int(row_rng.integers(5))))
            out_html.append(html)
            out_text.append(golden)
            out_lang.append(lang)
        return pa.table({
            "i": batch["i"],
            "url": pa.array(out_urls, pa.string()),
            "warc_ts": pa.array(out_ts, pa.timestamp("us")),
            "html": pa.array(out_html, pa.binary()),
            "text": pa.array(out_text, pa.string()),
            "lang": pa.array(out_lang, pa.string()),
        })

    ds = rd.from_arrow(plan).repartition(64)
    tables = [ray_get for ray_get in
              ds.map_batches(render, batch_format="pyarrow").to_arrow_refs()]
    import ray

    # to_arrow_refs hands blocks back in COMPLETION order (build-dependent
    # under the streaming executor); re-sort by the plan index so parallel
    # synthesis is order-deterministic like the serial path
    out = pa.concat_tables([ray.get(t) for t in tables])
    return out.sort_by("i").drop_columns(["i"])


def pages_path_for(sf_dir: str, cache_dir: str = "/tmp/swsr_pages",
                   copies: int = 1) -> str:
    """Build (once) and cache the pages parquet for a testdata sf dir.

    The cache key includes the documents file fingerprint so different SFs
    get different tables. Written atomically (tmp + rename) so concurrent
    builders are safe. Uses the Ray-parallel builder when a session is up
    and the table is large; note the parallel and serial builders differ in
    rng stream (different cache keys via the b-tag) — all consumers use one
    builder per file so determinism holds per path."""
    import ray

    doc_path = os.path.join(sf_dir, "documents.parquet")
    stat = os.stat(doc_path)
    n_docs_meta = pq.read_metadata(doc_path).num_rows
    use_parallel = ray.is_initialized() and n_docs_meta * copies > 4000
    btag = "p" if use_parallel else "s"
    key = hashlib.md5(
        f"{doc_path}:{stat.st_size}:{stat.st_mtime_ns}:c{copies}:{btag}:v9"
        .encode()).hexdigest()[:16]
    out_path = os.path.join(cache_dir, f"pages_{key}.parquet")
    if os.path.exists(out_path):
        return out_path
    os.makedirs(cache_dir, exist_ok=True)
    docs = pq.read_table(doc_path, columns=["doc_id", "text", "lang"])
    rows = list(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist(),
                    docs["lang"].to_pylist()))
    if copies > 1:
        rows = [(doc_id * copies + c,
                 f"{text} variation copy {c} edition" if text else text,
                 lang)
                for (doc_id, text, lang) in rows for c in range(copies)]
    if use_parallel:
        table = _synthesize_pages_parallel(rows)
    else:
        table = synthesize_pages(rows)
    # global url sort → contiguous per-file url ranges: fetch probes prune
    # whole files + row groups via min/max stats, and readers parallelize
    # across files (a single file reads as ONE serial task in Ray Data).
    # Synthesis-order tiebreak: arrow's multi-threaded sort is NOT stable,
    # so duplicate urls (synthesis collisions at copies>1) otherwise land
    # in a build-dependent order — and which copy is LAST decides which
    # html a fetch returns, making rebuilds flip crawl outputs by a few
    # pages (observed: 248 of 225k dup urls changed winners across two
    # builds of identical input)
    import pyarrow as _pa

    table = table.append_column(
        "_synth_order", _pa.array(range(table.num_rows), _pa.int64()))
    table = table.sort_by([("url", "ascending"),
                           ("_synth_order", "ascending")])
    table = table.drop_columns(["_synth_order"])
    n_files = max(1, min(64, table.num_rows // 4096))
    tmp = out_path + f".tmp{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    per = -(-table.num_rows // n_files)
    for fi in range(n_files):
        chunk = table.slice(fi * per, per)
        if chunk.num_rows:
            # 512-row row groups: the fetch probe reads whole row groups
            # per wanted url (parquet's random-access floor), so rg size
            # is the point-read amplification factor — 512 × ~5 KB html
            # ≈ 2.5 MB per group keeps scattered probes (seed rounds) 4×
            # cheaper than the 2048-row layout while dense host-range
            # scans read the same bytes either way
            pq.write_table(chunk, os.path.join(tmp, f"part-{fi:04d}.parquet"),
                           row_group_size=512)
    os.replace(tmp, out_path)
    return out_path


def seed_urls(pages_path: str, n_seeds: int = 8) -> list[str]:
    """Deterministic seed list, file order (FIXTURES.md §2: seed order =
    file order, the crawl-ordering invariant's anchor). The first seeds
    cover distinct hosts; beyond that, urls are taken in stride so large
    seed lists (benchmarks) spread across the table."""
    import pyarrow.dataset as pads

    t = pads.dataset(pages_path, format="parquet").to_table(columns=["url"])
    urls = t["url"].to_pylist()
    seen_hosts, seeds, seed_set = set(), [], set()
    for u in urls:
        h = u.split("/")[2]
        if h not in seen_hosts:
            seen_hosts.add(h)
            seeds.append(u)
            seed_set.add(u)
        if len(seeds) >= n_seeds:
            return seeds
    stride = max(1, len(urls) // max(1, n_seeds - len(seeds) + 1))
    for i in range(0, len(urls), stride):
        if urls[i] not in seed_set:
            seeds.append(urls[i])
            seed_set.add(urls[i])
        if len(seeds) >= n_seeds:
            break
    return seeds
