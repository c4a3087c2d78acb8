"""Unified pipeline-config surface — the reference's option set
(``hex_smooth_cuda_v5.cu:855-880``: ``--second-order --uniform --single
--no-reorder --levels N`` + ``setOptions``) as ONE dataclass that composes
the engine's stages, so a user sweeping res/k/profile/fusion/salting across
flagship AND resumable runs plumbs the knobs once.

Mapping (reference flag -> field):

* ``--second-order`` -> ``k=2`` (both-orders smoothing)
* ``--uniform``      -> ``profile="uniform"`` (default Gaussian)
* ``--single``       -> ``fused=False`` (one variable instead of 4)
* ``--levels N``     -> ``res=N`` — the engine's layout analog: bisection
  reorder depth controlled GPU memory locality; hex resolution controls
  the cell-key partitioning granularity here (``--no-reorder`` has no
  engine meaning — Arrow blocks have no thread-coalescing layout)
* (engine-only) ``--salted`` -> explicit two-phase hot-key reduce
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class PipelineConfig:
    res: int = 7               # hex resolution (partitioning granularity)
    k: int = 1                 # 1 = first-order, 2 = both orders
    profile: str = "gaussian"  # "gaussian" | "uniform"
    fused: bool = True         # multi-variable fusion (False = single var)
    salted: bool = False       # explicit salted two-phase reduce
    replicate: int = 1         # input replication (bench scaling)

    @classmethod
    def from_args(cls, argv: list[str]) -> "PipelineConfig":
        """Parse the reference's CLI flags (``hex_smooth_cuda_v5.cu:870-880``)."""
        kw: dict = {}
        i = 0
        while i < len(argv):
            a = argv[i]
            if a == "--second-order":
                kw["k"] = 2
            elif a == "--uniform":
                kw["profile"] = "uniform"
            elif a == "--single":
                kw["fused"] = False
            elif a == "--salted":
                kw["salted"] = True
            elif a == "--levels" and i + 1 < len(argv):
                kw["res"] = int(argv[i + 1])
                i += 1
            elif a == "--no-reorder":
                pass  # no engine meaning (see module docstring)
            else:
                raise ValueError(f"unknown pipeline option {a!r}")
            i += 1
        return cls(**kw)

    @property
    def smooth_cols(self) -> list[str]:
        from .flagship import METRIC_COLS

        return list(METRIC_COLS) if self.fused else ["chars_mean"]

    # ---- composed pipelines -------------------------------------------------

    def cells(self, sf_dir: str):
        """pages -> geocode/H3-encode -> cell metric table."""
        from ..sources.pages import read_pages
        from ..stages.geoencode import geo_encode
        from .flagship import cell_metrics

        pages = read_pages(sf_dir, replicate=self.replicate, include_html=False)
        return cell_metrics(geo_encode(pages, res=self.res, batch_size=None))

    def smooth(self, cells_ds):
        from ..stages.smooth import smooth_cells

        return smooth_cells(cells_ds, self.smooth_cols, k=self.k,
                            profile=self.profile, salted=self.salted)

    def flagship(self, sf_dir: str):
        """Full pipeline -> smoothed cell table Dataset."""
        return self.smooth(self.cells(sf_dir))

    def resumable(self, sf_dir: str, out_dir: str, n_shards: int = 8,
                  verbose: bool = False):
        from .resumable import flagship_resumable

        return flagship_resumable(sf_dir, out_dir, n_shards=n_shards,
                                  config=self, verbose=verbose)
