"""Pipeline-config surface: the reference's option sweep (scripts/test-v5.sh
runs configs {first-order, both-orders} x {single, fused}) driven through
ONE PipelineConfig, plus CLI-flag parsing parity."""

from __future__ import annotations

import numpy as np
import pytest


def test_from_args_matches_reference_flags():
    from cuda_gis_smoothing_ray.pipelines.config import PipelineConfig

    c = PipelineConfig.from_args([])
    assert (c.k, c.profile, c.fused) == (1, "gaussian", True)
    c = PipelineConfig.from_args(["--second-order", "--uniform", "--single"])
    assert (c.k, c.profile, c.fused) == (2, "uniform", False)
    c = PipelineConfig.from_args(["--levels", "5", "--no-reorder", "--salted"])
    assert c.res == 5 and c.salted
    with pytest.raises(ValueError):
        PipelineConfig.from_args(["--bogus"])


@pytest.mark.parametrize(
    "args",
    [
        ["--single"],                      # config 1: first-order, single
        [],                                # config 2: first-order, fused
        ["--second-order", "--single"],    # config 3: both orders, single
        ["--second-order"],                # config 4: both orders, fused
    ],
    ids=["k1-single", "k1-fused", "k2-single", "k2-fused"],
)
def test_config_sweep_matches_direct_stages(sf_dir, args):
    """Each test-v5.sh configuration, built via the config surface, equals
    the directly-composed stages."""
    from cuda_gis_smoothing_ray.pipelines.config import PipelineConfig
    from cuda_gis_smoothing_ray.pipelines.flagship import METRIC_COLS, cell_metrics
    from cuda_gis_smoothing_ray.sources.pages import read_pages
    from cuda_gis_smoothing_ray.stages.geoencode import geo_encode
    from cuda_gis_smoothing_ray.stages.smooth import smooth_cells

    cfg = PipelineConfig.from_args(["--levels", "6", *args])
    got = cfg.flagship(sf_dir).to_pandas().sort_values("cell").reset_index(drop=True)

    cells = cell_metrics(geo_encode(read_pages(sf_dir, include_html=False), res=6))
    cols = METRIC_COLS if cfg.fused else ["chars_mean"]
    want = (
        smooth_cells(cells, cols, k=cfg.k, profile=cfg.profile)
        .to_pandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    assert (got["cell"].to_numpy() == want["cell"].to_numpy()).all()
    for c in got.columns:
        if c != "cell":
            assert np.allclose(got[c].to_numpy(), want[c].to_numpy(), rtol=0, atol=1e-12), c
    # fused configs smooth all 4 metric columns in the one shuffle
    assert sum(c.endswith("_sm") for c in got.columns) == (4 if cfg.fused else 1)


def test_resumable_from_config(sf_dir, tmp_path):
    """flagship_resumable built from a config equals the direct flagship
    (same config), and a config change re-runs only the affected phase."""
    from cuda_gis_smoothing_ray.pipelines.config import PipelineConfig

    cfg = PipelineConfig.from_args(["--levels", "6", "--uniform"])
    out = str(tmp_path / "ckpt")
    got = (
        cfg.resumable(sf_dir, out, n_shards=2)
        .to_pandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    want = cfg.flagship(sf_dir).to_pandas().sort_values("cell").reset_index(drop=True)
    assert (got["cell"].to_numpy() == want["cell"].to_numpy()).all()
    for c in want.columns:
        if c != "cell":
            assert np.allclose(got[c].to_numpy(), want[c].to_numpy(), rtol=0, atol=1e-9), c

    # smoothing-only change (profile) must NOT invalidate the shard partials
    import json
    import os

    man_path = os.path.join(out, "manifest.jsonl")
    n_lines_before = sum(1 for _ in open(man_path))
    cfg2 = PipelineConfig.from_args(["--levels", "6"])  # gaussian now
    cfg2.resumable(sf_dir, out, n_shards=2).to_pandas()
    lines = [json.loads(l) for l in open(man_path)]
    new = lines[n_lines_before:]
    assert all(l["partition"] == "final" for l in new), new  # only the reduce re-ran
