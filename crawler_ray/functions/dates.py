"""Multi-format date parsing + the GDPR date-window filter.

Reference parity:

- per-site ``strptime`` formats ``%d.%m.%Y`` (``austria:91``),
  ``%d-%m-%Y`` (``denmark:125``), ``%Y-%m-%d`` (``edpb:104``) — here a
  single tolerant parser that tries the formats in a fixed order;
- the retain window ``today - margin <= date <= today + margin`` with
  ``margin = today - 2018-05-25``
  (``specifications/should_retain_document_specification.py:5-9``,
  ``policies/gdpr_policy.py:4-5``). The reference reads the wall
  clock; our data plane takes a **pinned** ``now`` so results are
  reproducible (FIXTURES.md §6 determinism rule).
"""

from __future__ import annotations

import datetime as _dt
import re

import numpy as np

__all__ = ["PINNED_NOW", "GDPR_DATE", "parse_date_multi", "parse_dates_multi",
           "retain_window"]

GDPR_DATE = _dt.date(2018, 5, 25)        # policies/gdpr_policy.py:4-5
PINNED_NOW = _dt.date(2024, 5, 25)       # pinned 'today' for the data plane

_PATTERNS = [
    (re.compile(r"^(\d{1,2})\.(\d{1,2})\.(\d{4})$"), ("d", "m", "y")),
    (re.compile(r"^(\d{1,2})-(\d{1,2})-(\d{4})$"), ("d", "m", "y")),
    (re.compile(r"^(\d{4})-(\d{1,2})-(\d{1,2})$"), ("y", "m", "d")),
    # greece:91-97 — dd/mm/yyyy in the decisions table's <time> text
    (re.compile(r"^(\d{1,2})/(\d{1,2})/(\d{4})$"), ("d", "m", "y")),
]


def parse_date_multi(s: str | None) -> _dt.date | None:
    """Parse one date string in any of the three reference formats.
    Returns None on empty/unparseable (NoDate semantics)."""
    if not s:
        return None
    s = s.strip()
    for pat, order in _PATTERNS:
        m = pat.match(s)
        if m:
            parts = dict(zip(order, m.groups()))
            try:
                return _dt.date(int(parts["y"]), int(parts["m"]), int(parts["d"]))
            except ValueError:
                return None
    return None


def parse_dates_multi(strings) -> np.ndarray:
    """Vector wrapper: list[str] -> np.ndarray[datetime64[D]] with NaT
    for unparseable values."""
    out = np.full(len(strings), np.datetime64("NaT"), dtype="datetime64[D]")
    for i, s in enumerate(strings):
        d = parse_date_multi(s)
        if d is not None:
            out[i] = np.datetime64(d.isoformat(), "D")
    return out


def retain_window(dates: np.ndarray, now: _dt.date = PINNED_NOW) -> np.ndarray:
    """Boolean mask of the reference's GDPR retain window, vectorized.
    NaT → False (docs without a parseable date are dropped, recorded in
    metrics — reference silently skips them)."""
    margin = now - GDPR_DATE
    lo = np.datetime64((now - margin).isoformat(), "D")   # == GDPR_DATE
    hi = np.datetime64((now + margin).isoformat(), "D")
    dates = np.asarray(dates, dtype="datetime64[D]")
    valid = ~np.isnat(dates)
    return valid & (dates >= lo) & (dates <= hi)
