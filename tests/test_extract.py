"""Coordinate-extraction determinism (BASELINE.json per-row invariant:
byte-identical extracted text per url)."""

import numpy as np
import pandas as pd

from insideout_spark.geo import extract


def test_extract_basic():
    s = pd.Series(["page 3 geo:47.1234567,-2.0000001", "no token here", "geo:1.5,2.5 x"])
    lat, lng = extract.extract_coords_series(s)
    assert lat[0] == 47.1234567 and lng[0] == -2.0000001
    assert np.isnan(lat[1])
    assert lat[2] == 1.5 and lng[2] == 2.5


def test_extract_deterministic_repeat():
    texts = pd.Series([f"page {i} geo:{40+i*0.001:.7f},{i*0.002:.7f}" for i in range(500)])
    a = extract.extract_coords_series(texts)
    b = extract.extract_coords_series(texts)
    assert (a[0].fillna(-1) == b[0].fillna(-1)).all()
    assert (a[1].fillna(-1) == b[1].fillna(-1)).all()


def test_html_text_roundtrip_byte_identical():
    text = "page 7 geo:47.1000000,2.2000000 é-ü"
    html = f"<html><body>{text}</body></html>".encode()
    assert extract.extract_text_from_html(html) == text
    assert extract.extract_text_from_html(html).encode() == text.encode()


def test_pages_synth_deterministic(spark):
    """Same ids -> byte-identical text regardless of partitioning."""
    from insideout_spark.sources.pages import synth_pages

    a = {r["url"]: r["text"] for r in synth_pages(spark, 100, partitions=2).collect()}
    b = {r["url"]: r["text"] for r in synth_pages(spark, 100, partitions=7).collect()}
    assert a == b
    # golden rows present
    assert a["https://example.org/00000001"].endswith("geo:47.3965063,-2.9876391")
