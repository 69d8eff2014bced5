"""NLP tier: keywords, summary, TextRank — the ``Article.nlp()`` stage
(article.py:305-372) re-expressed without spaCy (not available here).

- ``textrank_keywords``: the TextRank algebra of the reference's
  TextRank4Keyword (named_entity_recognition.py:200-245): sentence
  segmentation → vocab → co-occurrence pairs within window 4 →
  column-normalized matrix → damped pagerank (d=0.85, 10 steps,
  min_diff 1e-5) → top alnum words. Deviation: candidate filtering is
  stopword/length-based instead of spaCy POS tags (NOUN/PROPN), since no
  tagger ships in this environment.
- ``xx_keywords``: exact port of the frequency fallback
  (article.py:427-459): count, sort (freq, word) desc, drop numerics, cap.
- ``summarize``: first N sentences (reference get_sentences,
  named_entity_recognition.py:129-134, N=5) with a regex sentence splitter
  standing in for spaCy sents.

All pure functions; the Ray stage is ``stages.nlp_stage.NlpArticles``.
This tier is feature-flagged out of the throughput baseline, as the
reference itself warns nlp() can take "A MINUTE OR TWO" per article
(article.py:347-348).
"""

from __future__ import annotations

import re

import numpy as np

from .stopwords import get_stopwords
from .textutil import split_words

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")
_WORD = re.compile(r"[A-Za-z0-9_一-龥']+")

D = 0.85
STEPS = 10
MIN_DIFF = 1e-5


def split_sentences(text: str) -> list[str]:
    if not text:
        return []
    return [s for s in _SENT_SPLIT.split(text) if s.strip()]


def textrank_keywords(text: str, language: str = "en", count: int = 10,
                      window_size: int = 4) -> list[str]:
    """Top-``count`` TextRank keywords of one document."""
    stop = get_stopwords(language)
    # analyze(self.text.lower(), ...) — the reference pre-lowers the
    # whole document before segmentation (article.py:350)
    text = (text or "").lower()
    sentences = []
    for sent in split_sentences(text):
        # candidate_pos=['NOUN','PROPN'] approximation without a tagger:
        # exclude stopwords (is_stop), numerics (NUM pos), single chars,
        # and -ly adverbs; open-class residue stands in for nouns
        words = [w for w in _WORD.findall(sent)
                 if w not in stop and len(w) > 1
                 and not w.isnumeric() and not w.endswith("ly")]
        if words:
            sentences.append(words)
    if not sentences:
        return []

    vocab: dict[str, int] = {}
    for sent in sentences:
        for w in sent:
            if w not in vocab:
                vocab[w] = len(vocab)
    n = len(vocab)

    # get_matrix (named_entity_recognition.py:86-103): BINARY adjacency —
    # each distinct ordered window pair contributes exactly 1 (the
    # reference dedups token_pairs), self-pairs included
    g = np.zeros((n, n), dtype=np.float64)
    for sent in sentences:
        for i, w1 in enumerate(sent):
            for j in range(i + 1, min(i + window_size, len(sent))):
                g[vocab[w1], vocab[sent[j]]] = 1.0
    g = g + g.T - np.diag(g.diagonal())          # symmetrize (get_matrix)
    norm = g.sum(axis=0)
    g = np.divide(g, norm, where=norm != 0)

    pr = np.ones(n)
    prev = 0.0
    for _ in range(STEPS):
        pr = (1 - D) + D * g.dot(pr)
        if abs(prev - pr.sum()) < MIN_DIFF:
            break
        prev = pr.sum()

    order = sorted(vocab.items(), key=lambda kv: pr[kv[1]], reverse=True)
    keywords = []
    for i, (word, _idx) in enumerate(order):
        if word.isalnum():
            keywords.append(word)
            if i > count:
                break
    return keywords


def xx_keywords(text: str, language: str = "en", count: int = 10) -> list[str]:
    """Frequency fallback keywords — article.py:427-459 verbatim algebra."""
    stop = get_stopwords(language)
    words = split_words(text)
    top = []
    if words:
        words = [w for w in words if w not in stop]
        freq: dict[str, int] = {}
        for w in words:
            freq[w] = freq.get(w, 0) + 1
        ranked = sorted(freq.items(), key=lambda kv: (kv[1], kv[0]),
                        reverse=True)[: min(count, len(freq))]
        index = 1
        for k, _v in ranked:
            if index > count:
                break
            if not k.isnumeric():
                top.append(k)
                index += 1
    return top


def document_keywords(text: str, language: str = "en",
                      count: int = 10, max_keywords: int = 35) -> list[str]:
    """nlp() keyword policy: TextRank first, frequency fallback when empty
    (article.py:352-357), capped by MAX_KEYWORDS (set_keywords)."""
    kws = textrank_keywords(text, language, count)
    if not kws:
        kws = xx_keywords(text, language, count)
    return kws[:max_keywords]


def summarize(text: str, n_sentences: int = 5, meta_lang: str = "en",
              max_summary: int = 5_000) -> str:
    """First-N-sentence summary + set_summary normalization
    (article.py:645-651: en double-space collapse, 5000-char cap)."""
    sents = split_sentences(text or "")[:n_sentences]
    summary = "".join(sents)
    if summary and meta_lang == "en":
        summary = summary.replace("  ", " ")
    return summary[:max_summary]
