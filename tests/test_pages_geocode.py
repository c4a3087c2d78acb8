"""Pages source determinism + geocode extractor behavior (FIXTURES F1,
invariants 7-8)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cuda_gis_smoothing_ray.functions import geocode as gc
from cuda_gis_smoothing_ray.sources.pages import (
    PAGES_SCHEMA,
    generate_pages_table,
    pages_from_documents_batch,
    read_pages,
)
from cuda_gis_smoothing_ray.stages.geoencode import GeoEncode


def test_pages_schema_matches_input_hint():
    t = generate_pages_table(50)
    assert t.schema.equals(PAGES_SCHEMA)
    assert str(t.schema.field("warc_ts").type) == "timestamp[us]"
    assert t.schema.field("html").type == pa.binary()


def test_pages_deterministic():
    a, b = generate_pages_table(200), generate_pages_table(200)
    assert a.equals(b)


def test_html_wraps_text_bytes():
    t = generate_pages_table(20)
    for i in range(20):
        html = t.column("html")[i].as_py()
        text = t.column("text")[i].as_py()
        assert html == b"<html><body>" + text.encode() + b"</body></html>"


def test_replicate_preserves_text_per_url_group():
    import pyarrow.parquet as pq

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    t = pages_from_documents_batch(docs, replicate=3)
    assert t.num_rows == docs.num_rows * 3
    df = t.to_pandas()
    # same url -> same text bytes (replicas share url and text)
    assert (df.groupby("url")["text"].nunique() == 1).all()


def test_extractor_finds_mentions():
    ex = gc.LatLonExtractor()
    lat, lon, found = ex(
        ["noise lat 12.3456 lon -65.4321 trailing", "nothing here", None, "lat 1.5 lon 2.5 lat 9.9 lon 8.8"]
    )
    assert found.tolist() == [True, False, False, True]
    assert lat[0] == 12.3456 and lon[0] == -65.4321
    assert lat[3] == 1.5 and lon[3] == 2.5  # first match wins


def test_geoencode_mention_overrides_centroid():
    t = generate_pages_table(500, mention_rate=0.5)
    enc = GeoEncode(res=7)
    out = enc(t).to_pandas()
    assert out.has_mention.mean() > 0.3
    # mentioned coords are echoed exactly
    ex = gc.LatLonExtractor()
    lat, lon, found = ex(out.text.tolist())
    m = out.has_mention.to_numpy()
    np.testing.assert_array_equal(found, m)
    np.testing.assert_allclose(out.lat.to_numpy()[m], lat[m], atol=0)


def test_zipf_skew_produces_hot_cell():
    """Invariant 8: the TLD distribution concentrates >=8% of pages in one
    cell (drives the salted-aggregation path)."""
    t = generate_pages_table(2000, mention_rate=0.0)
    out = GeoEncode(res=7)(t).to_pandas()
    assert out.cell.value_counts().iloc[0] / len(out) > 0.05


def test_read_pages_streams(ray_session, sf_dir):
    ds = read_pages(sf_dir, include_html=False)
    assert ds.count() == 500
    assert "html" not in ds.schema().names


def test_text_byte_identity_through_geocode(sf_dir, ray_session):
    """input_hint per-row invariant: extracted text is byte-identical per
    url through the encode stage (the full page-side pipeline)."""
    from cuda_gis_smoothing_ray.sources.pages import read_pages
    from cuda_gis_smoothing_ray.stages.geoencode import geo_encode

    src = read_pages(sf_dir, include_html=False).to_pandas()
    out = geo_encode(read_pages(sf_dir, include_html=False), res=7).to_pandas()
    a = src.set_index("url")["text"].sort_index()
    b = out.set_index("url")["text"].sort_index()
    assert len(a) == len(b)
    assert (a.values == b.values).all()
    assert out["text"].map(lambda s: isinstance(s, str)).all()


def test_geoencode_actor_pool_matches_task_path(sf_dir, ray_session):
    """The actor-pool form of the encode stage (stateful __init__ per actor)
    produces the identical table to the default task form."""
    from cuda_gis_smoothing_ray.sources.pages import read_pages
    from cuda_gis_smoothing_ray.stages.geoencode import geo_encode

    a = (
        geo_encode(read_pages(sf_dir, include_html=False), res=7)
        .to_pandas().sort_values("page_id").reset_index(drop=True)
    )
    b = (
        geo_encode(read_pages(sf_dir, include_html=False), res=7,
                   use_actors=True, concurrency=(1, 2))
        .to_pandas().sort_values("page_id").reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_extract_text_byte_identical_per_url(sf_dir):
    """BASELINE.json input_hint invariant: byte-identical extracted text per
    url — extraction from the html bytes must reproduce documents.text
    exactly (bytes, not just str equality)."""
    import pyarrow.parquet as pq
    import pytest

    from cuda_gis_smoothing_ray.sources.pages import read_pages
    from cuda_gis_smoothing_ray.stages import extract

    got = extract.extract_text(read_pages(sf_dir, include_html=True)).sort("page_id").to_pandas()
    src = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    src = src.sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(src)
    assert (got["page_id"].to_numpy() == src["doc_id"].to_numpy()).all()
    assert all(
        a.encode() == b.encode() for a, b in zip(got["text"], src["text"])
    )
    # a real parser isn't shipped in this container: asking for one must fail
    # loudly, never silently fall back to the synthetic inverse
    with pytest.raises(NotImplementedError):
        extract.extract_text(read_pages(sf_dir, include_html=True), parser="trafilatura")
