"""top-node → article text.

Port of /root/reference/scraper/output_formatter.py:43-180. **This defines
the byte-identical output**, including its quirks:

- a literal two-character ``\\n`` marker (backslash + n, NOT a newline) is
  written into ``<br>``/``<li>`` text and later split on
  (output_formatter.py:76, 87, 93);
- negative-gravity nodes are removed with plain detach (``getparent().
  remove``), i.e. *without* the tail-relocation of parser.remove
  (output_formatter.py:103-113);
- empty tags are dropped walking the node list in reverse
  (output_formatter.py:125-144);
- paragraphs are joined with a blank line after ``html.unescape`` +
  ``innerTrim`` (output_formatter.py:65-79).
"""

from __future__ import annotations

from html import unescape

from . import dom
from .dom import Node

_LITERAL_NL = r"\n"  # two chars: backslash, n

NON_MEDIA_CLASSES = ("zn-body__read-all",)


class OutputFormatter:
    def __init__(self, language: str = "en"):
        self.language = language
        self.top_node: Node | None = None

    def update_language(self, meta_lang):
        if meta_lang:
            self.language = meta_lang

    def get_formatted(self, top_node: Node) -> str:
        # output_formatter.py:43-63 (keep_article_html path omitted: the
        # engine emits text; article_html is reconstructable from top_node)
        self.top_node = top_node
        self.remove_negativescores_nodes()
        self.links_to_text()
        self.add_newline_to_br()
        self.add_newline_to_li()
        self.replace_with_text()
        self.remove_empty_tags()
        self.remove_trailing_media_div()
        return self.convert_to_text()

    def convert_to_text(self) -> str:
        # output_formatter.py:65-79
        txts = []
        for node in list(self.top_node):
            txt = dom.get_text(node)
            if txt:
                txt = unescape(txt)
                txt_lis = dom.inner_trim(txt).split(_LITERAL_NL)
                txts.extend(n.strip(" ") for n in txt_lis)
        return "\n\n".join(txts)

    def add_newline_to_br(self):
        # output_formatter.py:85-87
        for e in dom.get_elements_by_tag(self.top_node, tag="br"):
            e.text = _LITERAL_NL

    def add_newline_to_li(self):
        # output_formatter.py:89-95
        for e in dom.get_elements_by_tag(self.top_node, tag="ul"):
            li_list = dom.get_elements_by_tag(e, tag="li")
            for li in li_list[:-1]:
                li.text = dom.get_text(li) + _LITERAL_NL
                for c in li.getchildren():
                    dom.remove(c)

    def links_to_text(self):
        # output_formatter.py:97-101
        dom.strip_tags(self.top_node, "a")

    def remove_negativescores_nodes(self):
        # output_formatter.py:103-113 — plain detach, no tail relocation
        for item in list(self.top_node.iterdescendants()):
            score = item.attrib.get("gravityScore")
            if score is None:
                continue
            if (float(score) if score else 0) < 1 and item.parent is not None:
                item.parent.remove_child(item)

    def replace_with_text(self):
        # output_formatter.py:115-123
        dom.strip_tags(self.top_node, "b", "strong", "i", "br", "sup")

    def remove_empty_tags(self):
        # output_formatter.py:125-144
        all_nodes = [n for n in self.top_node.iterdescendants()
                     if n.tag != dom.COMMENT]
        all_nodes.reverse()
        for el in all_nodes:
            tag = el.tag
            text = dom.get_text(el)
            if (tag != "br" or text != "\\r") \
                    and not text \
                    and not dom.get_elements_by_tag(el, tag="object") \
                    and not dom.get_elements_by_tag(el, tag="embed") \
                    and not dom.get_elements_by_tag(el, tag="img") \
                    and tag != "img" \
                    and el.parent is not None:
                dom.remove(el)

    def remove_trailing_media_div(self):
        # output_formatter.py:146-180
        top_level_nodes = self.top_node.getchildren()
        if len(top_level_nodes) < 3:
            return
        last_node = top_level_nodes[-1]
        if last_node.attrib.get("class") in NON_MEDIA_CLASSES:
            return
        if dom.node_depth(last_node) >= 2:
            dom.remove(last_node)


def format_top_node(top_node: Node, language: str = "en") -> str:
    return OutputFormatter(language).get_formatted(top_node)
