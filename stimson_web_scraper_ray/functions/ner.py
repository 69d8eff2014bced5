"""Named-entity tier: dates, persons, education degrees.

Reference surface: named_entity_recognition.py:136-198 (get_dates via
spaCy DATE ents + dateparser + date_extractor; get_persons via spaCy
PERSON ents; get_education via the degree-token scan) and the
publish-date NER fallback in article.py:362-371. spaCy/dateparser are
not available here, so dates and persons are re-derived with regex +
gazetteer heuristics calibrated to the reference's own unit tests
(named_entity_recognition_test.py:42-76 date formats incl. the Japanese
YYYY年M月D日 case; test_methods persons/education); get_education is the
same pure-string algorithm as the reference (no spaCy needed there
beyond sentence splitting). Deviations: persons come from a
capitalized-sequence rule with an organization-suffix exclusion list
instead of a statistical NER model — documented, deterministic, and
testable."""

from __future__ import annotations

import datetime
import re

MONTHS = {
    "january": 1, "february": 2, "march": 3, "april": 4, "may": 5,
    "june": 6, "july": 7, "august": 8, "september": 9, "october": 10,
    "november": 11, "december": 12,
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "jun": 6, "jul": 7, "aug": 8,
    "sep": 9, "sept": 9, "oct": 10, "nov": 11, "dec": 12,
}

_MONTH_ALT = "|".join(sorted(MONTHS, key=len, reverse=True))

# ordered patterns; first match wins per position. Calibrated to the
# reference's test_dates formats (named_entity_recognition_test.py:48-76).
_DATE_PATTERNS: list[tuple[re.Pattern, str]] = [
    # 1937-01-04 (ISO)
    (re.compile(r"\b(19|20)(\d{2})-(\d{1,2})-(\d{1,2})\b"), "iso"),
    # 01/04/1937 (US month/day/year, like dateparser's default order)
    (re.compile(r"\b(\d{1,2})/(\d{1,2})/((?:19|20)\d{2})\b"), "mdy_slash"),
    # January 4, 1937 / Jan 4 1937 (weekday prefix handled by the regex
    # simply not consuming it)
    (re.compile(r"\b(" + _MONTH_ALT + r")\.?\s+(\d{1,2})(?:st|nd|rd|th)?" +
                r"\s*,?\s+((?:19|20)\d{2})\b", re.IGNORECASE), "mdy_name"),
    # 4 January 1937
    (re.compile(r"\b(\d{1,2})(?:st|nd|rd|th)?\s+(" + _MONTH_ALT +
                r")\.?\s*,?\s+((?:19|20)\d{2})\b", re.IGNORECASE), "dmy_name"),
    # 1937年1月4日 (the reference's ja_core_news_sm case)
    (re.compile(r"((?:19|20)\d{2})年(\d{1,2})月(\d{1,2})日"), "cjk"),
    # bare year ("I arrived in that city in 1937") — lowest priority
    (re.compile(r"\b((?:19|20)\d{2})\b"), "year"),
]


def _mk_date(y: int, m: int, d: int) -> datetime.datetime | None:
    try:
        return datetime.datetime(y, m, d)
    except ValueError:
        return None


def extract_dates(text: str) -> list[datetime.datetime]:
    """All dates found in text, in order of pattern priority then
    position. A full date at any position suppresses the bare-year
    pattern for that year (so '01/04/1937' yields one date, not two)."""
    if not text:
        return []
    out: list[datetime.datetime] = []
    seen_spans: list[tuple[int, int]] = []
    for pat, kind in _DATE_PATTERNS:
        for mo in pat.finditer(text):
            span = mo.span()
            if any(a < span[1] and span[0] < b for a, b in seen_spans):
                continue
            if kind == "iso":
                dt = _mk_date(int(mo.group(1) + mo.group(2)),
                              int(mo.group(3)), int(mo.group(4)))
            elif kind == "mdy_slash":
                dt = _mk_date(int(mo.group(3)), int(mo.group(1)),
                              int(mo.group(2)))
            elif kind == "mdy_name":
                dt = _mk_date(int(mo.group(3)),
                              MONTHS[mo.group(1).lower()], int(mo.group(2)))
            elif kind == "dmy_name":
                dt = _mk_date(int(mo.group(3)),
                              MONTHS[mo.group(2).lower()], int(mo.group(1)))
            elif kind == "cjk":
                dt = _mk_date(int(mo.group(1)), int(mo.group(2)),
                              int(mo.group(3)))
            else:  # bare year
                dt = _mk_date(int(mo.group(1)), 1, 1)
            if dt is not None:
                out.append(dt)
                seen_spans.append(span)
    # re-sort to document order (patterns ran by priority, not position)
    order = sorted(range(len(out)), key=lambda i: seen_spans[i][0])
    return [out[i] for i in order]


# organization/place suffix words that disqualify a capitalized sequence
# from being a PERSON (the reference gets this from the spaCy model; the
# gazetteer mirrors the common ORG patterns its tests exercise)
_ORG_WORDS = frozenset({
    "university", "college", "institute", "school", "academy", "center",
    "centre", "corp", "corporation", "inc", "ltd", "llc", "company", "co",
    "group", "bank", "ministry", "department", "agency", "council",
    "committee", "association", "society", "union", "church", "hospital",
    "press", "times", "post", "journal", "news", "media", "city", "county",
    "state", "republic", "kingdom", "province", "street", "avenue", "road",
})

# common sentence-initial words that look like name starts
_NOT_NAME = frozenset({
    "the", "a", "an", "i", "he", "she", "it", "we", "they", "this", "that",
    "monday", "tuesday", "wednesday", "thursday", "friday", "saturday",
    "sunday", "january", "february", "march", "april", "may", "june",
    "july", "august", "september", "october", "november", "december",
})

# joiner is [ \t] only — a newline ends a candidate (so 'Alan Cooper\n
# Temple University' is two candidates, not one org-tainted span)
_HONORIFICS = frozenset({
    "mr", "mrs", "ms", "dr", "prof", "professor", "president", "senator",
    "chancellor", "minister", "sir", "dame", "lord", "lady", "rev",
    "general", "colonel", "captain", "judge", "justice", "mayor",
})

_CAP_SEQ = re.compile(
    r"\b([A-Z][a-z]+(?:[-'][A-Z][a-z]+)?(?:[ \t]+[A-Z]\.)?"
    r"(?:[ \t]+[A-Z][a-z]+(?:[-'][A-Z][a-z]+)?){1,3})\b")


def extract_persons(text: str) -> list[str]:
    """PERSON candidates: sequences of 2-4 capitalized words, excluding
    sequences containing organization-suffix words, month/pronoun
    starters, or all-caps tokens. Deduped, document order (matches the
    reference's list-of-ent-texts shape,
    named_entity_recognition.py:162)."""
    if not text:
        return []
    out: list[str] = []
    seen: set[str] = set()
    for mo in _CAP_SEQ.finditer(text):
        cand = mo.group(1)
        words = cand.split()
        while words and words[0].strip(".").lower() in _HONORIFICS:
            words = words[1:]
        if len(words) < 2:
            continue
        cand = " ".join(words)
        low = [w.strip(".").lower() for w in words]
        if any(w in _ORG_WORDS for w in low):
            continue
        if low[0] in _NOT_NAME or low[-1] in _NOT_NAME:
            continue
        if cand not in seen:
            seen.add(cand)
            out.append(cand)
    return out


# the reference's degree-token list VERBATIM
# (named_entity_recognition.py:168-178) with two faithful quirks: the
# missing comma concatenates 'M.S' 'BTECH' into one 'M.SBTECH' token (so
# neither 'M.S' nor 'BTECH' alone matches), and the membership test is
# tex.upper() against this mixed-case list, so the 'PhD'/'Ph.D.'/'DPhil'
# entries can never match ('PHD' != 'PhD') — both preserved for parity
EDUCATION_TOKENS = frozenset({
    "BE", "B.E.", "B.E",
    "BS", "B.S.", "B.S",
    "BA", "B.A", "B.A",
    "ME", "M.E.", "M.E",
    "MS", "M.S.",
    "M.SBTECH", "B.TECH",
    "M.TECH", "MTECH",
    "PhD", "Ph.D.", "Ph.D", "DPhil",
    "SSC", "HSC", "CBSE", "ICSE", "X", "XII",
})

_SENT_SPLIT = re.compile(r"(?:\n+|(?<=[.!?])\s+(?=[A-Z0-9]))")
_EDU_STRIP = re.compile(r"[?|$|.|!|,]")  # reference's own character class
_YEAR_RE = re.compile(r"(((20|19)(\d{2})))")


def extract_education(text: str, stopwords=frozenset()):
    """The reference's get_education algorithm
    (named_entity_recognition.py:164-198) re-hosted on a regex sentence
    splitter: scan sentence tokens, strip [?|$.!,], match the degree
    list, attach the sentence + following sentence as context, then pull
    a 19xx/20xx year out of the context if present. Returns
    [(degree, year)] or [degree] entries, insertion-ordered."""
    if not text:
        return []
    sents = [s.strip() for s in _SENT_SPLIT.split(text) if s.strip()]
    edu: dict[str, str] = {}
    for idx, sent in enumerate(sents):
        for tok in sent.split():
            cleaned = _EDU_STRIP.sub("", tok)
            if cleaned.upper() in EDUCATION_TOKENS and tok not in stopwords:
                nxt = sents[idx + 1] if idx + 1 < len(sents) else ""
                edu[cleaned] = sent + nxt
    education: list = []
    for key, ctx in edu.items():
        year = _YEAR_RE.search(ctx)
        if year:
            education.append((key, "".join(year.group(0))))
        else:
            education.append(key)
    return education


def best_publish_date(text: str) -> datetime.datetime | None:
    """The article.py:362-371 fallback: when HTML metadata yielded no
    publish date, the first date found in the raw text is 'usually the
    best to use'."""
    dates = extract_dates(text)
    return dates[0] if dates else None
