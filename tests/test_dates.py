import datetime as dt

import numpy as np

from crawler_ray.functions.dates import (GDPR_DATE, PINNED_NOW,
                                         parse_date_multi, parse_dates_multi,
                                         retain_window)
from crawler_ray.functions.hashing import (composite_doc_key, doc_key, md5_hex)


def test_parse_formats():
    assert parse_date_multi("31.12.2020") == dt.date(2020, 12, 31)
    assert parse_date_multi("31-12-2020") == dt.date(2020, 12, 31)
    assert parse_date_multi("2020-12-31") == dt.date(2020, 12, 31)
    assert parse_date_multi("5.6.2021") == dt.date(2021, 6, 5)


def test_parse_rejects():
    for bad in ["", None, "not a date", "2020-13-45", "32.01.2020",
                "12/31/2020"]:
        assert parse_date_multi(bad) is None


def test_retain_window_pinned():
    dates = parse_dates_multi(["24.05.2018", "25.05.2018", "01.01.2020",
                               "25.05.2024", "nope"])
    mask = retain_window(dates, now=PINNED_NOW)
    assert mask.tolist() == [False, True, True, True, False]
    assert GDPR_DATE == dt.date(2018, 5, 25)


def test_doc_keys():
    h = md5_hex("Decision 001-00001 on cookies")
    assert len(h) == 32
    assert composite_doc_key(h, "2020-01-02") == f"{h}-2020-01-02"
    assert composite_doc_key(h, None) == h
    k1 = doc_key("2020-01-02", "at", 7)
    assert k1 == doc_key("2020-01-02", "at", 7)       # deterministic
    assert k1.startswith("K200102-0007") and k1.endswith("AT")
