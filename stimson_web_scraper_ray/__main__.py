"""CLI entry point — the S10 surface (reference cli.py:20-35:
``-u url -l lang`` → build → print keywords, summary, text).

Offline analogue: the page body comes from ``--html-file`` (the
``file://`` / raw-HTML injection path, article.py:198-224) or is looked up
in a pages parquet table via ``--pages``. Owns its Ray session (guarded),
per the driver contract that library code never calls ray.init.

    python -m stimson_web_scraper_ray -u URL --pages /tmp/swsr_pages/...
    python -m stimson_web_scraper_ray -u URL --html-file page.html -l en
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="stimson_web_scraper_ray")
    ap.add_argument("-u", "--url", required=True)
    ap.add_argument("-l", "--language", default="en")
    ap.add_argument("--html-file", help="read page html from this file")
    ap.add_argument("--pages", help="pages parquet path/dir to look up url")
    ap.add_argument("--json", action="store_true", help="emit full JSON")
    args = ap.parse_args(argv)

    from .functions.extract import extract_article
    from .functions.nlp import document_keywords, summarize

    if args.html_file:
        with open(args.html_file, "rb") as f:
            html = f.read()
    elif args.pages:
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        t = pads.dataset(args.pages, format="parquet").to_table(
            columns=["url", "html"],
            filter=pc.field("url") == args.url)
        if t.num_rows == 0:
            print(f"url not found in pages table: {args.url}",
                  file=sys.stderr)
            return 1
        html = t["html"][0].as_py()
    else:
        print("offline engine: provide --html-file or --pages",
              file=sys.stderr)
        return 2

    art = extract_article(html, url=args.url, language=args.language,
                          collect_outlinks=True)
    lang = art["meta_lang"] or args.language
    art["keywords"] = document_keywords(art["text"], lang)
    art["summary"] = summarize(art["text"], meta_lang=lang)

    if args.json:
        print(json.dumps(art, ensure_ascii=False, indent=2))
    else:
        # cli.py:29-34 print order: keywords, summary, text
        print(art["keywords"])
        print(art["summary"])
        print(art["text"])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
