"""Deterministic coordinate extraction from web-page text.

Per BASELINE.json input_hint, pages carry coordinates embedded in their
text (FIXTURES.md §1: a ``geo:{lat},{lng}`` token). Extraction must be
byte-identical per url across runs — so it is a pure function of the
text bytes: first ``geo:`` token wins, full float syntax, no locale.
This plays the role of the reference loadtester's point source
(cmd/loadtester/main.go:106-107), made deterministic.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

GEO_RE = re.compile(r"geo:([-+]?\d+(?:\.\d+)?),([-+]?\d+(?:\.\d+)?)")


def extract_coords_series(text: "pd.Series"):
    """Vectorized extraction over a pandas Series of page text.

    Returns (lat, lng) float64 Series (NaN when no geo token)."""
    ext = text.str.extract(GEO_RE, expand=True)
    lat = pd.to_numeric(ext[0], errors="coerce")
    lng = pd.to_numeric(ext[1], errors="coerce")
    return lat.astype(np.float64), lng.astype(np.float64)


def extract_text_from_html(html: bytes) -> str:
    """Byte-deterministic text extraction from the fixture html shape
    (``<html><body>TEXT</body></html>``). Kept intentionally trivial and
    pure so the per-url byte-identical invariant holds."""
    s = html.decode("utf-8")
    start = s.find("<body>")
    end = s.rfind("</body>")
    if start == -1 or end == -1:
        return s
    return s[start + len("<body>") : end]
