"""NER tier tests mirroring the reference's
named_entity_recognition_test.py (test_methods, test_dates) without
spaCy/dateparser — same inputs, same expected outputs."""

import sys

sys.path.insert(0, "/root/repo")

from stimson_web_scraper_ray.functions.ner import (  # noqa: E402
    best_publish_date,
    extract_dates,
    extract_education,
    extract_persons,
)

RESUME = ("Alan Cooper\nTemple University\nB.A.\n"
          "email:\tcooper@pobox.com\nmobile:+1555.555.5555")


def test_persons_and_education_reference_case():
    # named_entity_recognition_test.py:28-39
    assert extract_education(RESUME) == ["BA"]
    persons = extract_persons(RESUME)
    assert len(persons) == 1
    assert "Alan Cooper" in persons


def test_dates_reference_formats():
    # named_entity_recognition_test.py:42-76 — every format must resolve
    # to 1937-01-04
    for text in [
        "I departed that city on 01/04/1937",
        "I arrived in that city on January 4, 1937",
        "commencing on January 4, 1937, (the “Lease Commencement Date”)",
        "Saturday January 4, 1937",
        "I departed that city on 1937-01-04",
        "1937年1月4日",
    ]:
        dates = extract_dates(text)
        assert dates, text
        assert dates[0].strftime("%Y-%m-%d") == "1937-01-04", text


def test_bare_year():
    dates = extract_dates("I arrived in that city in 1937")
    assert dates[0].year == 1937


def test_full_date_suppresses_bare_year():
    assert len(extract_dates("on 01/04/1937 exactly")) == 1


def test_persons_exclude_orgs_and_honorifics():
    text = ("President Barack Obama met Angela Merkel near "
            "Temple University on Monday January 4, 1937.")
    persons = extract_persons(text)
    assert "Barack Obama" in persons
    assert "Angela Merkel" in persons
    assert not any("University" in p for p in persons)
    assert not any(p.startswith("President") for p in persons)


def test_education_year_attachment():
    text = "He finished his B.S. at the lab. Graduated 1998 with honors."
    edu = extract_education(text)
    assert edu == [("BS", "1998")]


def test_education_phd_quirk_preserved():
    # the reference compares tex.upper() against a mixed-case list, so
    # PhD can never match there; parity requires it not to match here
    assert extract_education("She holds a PhD. From 2001.") == []


def test_best_publish_date_fallback():
    assert best_publish_date("no dates here at all") is None
    d = best_publish_date("posted on 2014-05-08 by staff")
    assert d.strftime("%Y-%m-%d") == "2014-05-08"


def test_invalid_dates_skipped():
    # 13/40/1937 is no valid m/d; 1937-13-40 no valid iso — both ignored,
    # but the year survives as a bare-year match
    ds = extract_dates("logged 13/40/1937 oddly")
    assert all(d.year == 1937 for d in ds)
