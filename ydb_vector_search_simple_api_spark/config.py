"""Engine configuration: column remapping, search strategies, defaults.

Mirrors the reference's env-driven config surface
(``/root/reference/app.py:40-66``, ``env.example``):

* column-name remapping for the 5-column store (``app.py:47-51``)
* the 5 distance strategies and their legal names (``env.example:15-17``)
* strategy -> sort-direction rule: DESC iff name ends with
  ``"Similarity"`` (``app.py:54-55``)
* defaults: k=4 (``app.py:363``), index search width 10 (``app.py:60``)
* filter x index mutual exclusion (``app.py:170-172``) as a compat mode
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, asdict

#: The 5 legal search strategies (/root/reference/env.example:15-17).
STRATEGIES: tuple[str, ...] = (
    "CosineSimilarity",
    "InnerProductSimilarity",
    "CosineDistance",
    "EuclideanDistance",
    "ManhattanDistance",
)

DEFAULT_K = 4  # /root/reference/app.py:363
DEFAULT_SEARCH_TOP_SIZE = 10  # /root/reference/app.py:60

#: The only three store fields the reference allows equality filters on
#: (/root/reference/app.py:176-181).
FILTERABLE_FIELDS: tuple[str, ...] = ("title", "vendor", "description")


def sort_descending(strategy: str) -> bool:
    """DESC iff the strategy is a similarity (reference ``app.py:54-55``:
    ``"DESC" if SEARCH_STRATEGY.endswith("Similarity") else "ASC"``)."""
    return strategy.endswith("Similarity")


def validate_strategy(strategy: str) -> str:
    if strategy not in STRATEGIES:
        raise ValueError(
            f"Unknown search strategy {strategy!r}; legal values: {STRATEGIES}"
        )
    return strategy


@dataclass(frozen=True)
class ColumnMap:
    """Physical-to-logical column mapping for the 5-column store.

    The reference remaps physical column names via env vars
    (``app.py:47-51``); here the same knob is a dataclass. Defaults
    target the driver testdata ``documents``+``embeddings`` tables,
    which reconstruct the reference's store shape
    (id/title/vendor/description/embedding).
    """

    id: str = "doc_id"
    title: str = "source"
    vendor: str = "lang"
    description: str = "text"
    embedding: str = "embedding"

    @classmethod
    def from_env(cls) -> "ColumnMap":
        # same env names as the reference (app.py:47-51)
        return cls(
            id=os.environ.get("YDB_ID_COLUMN", cls.id),
            title=os.environ.get("YDB_TITLE_COLUMN", cls.title),
            vendor=os.environ.get("YDB_VENDOR_COLUMN", cls.vendor),
            description=os.environ.get("YDB_DESCRIPTION_COLUMN", cls.description),
            embedding=os.environ.get("YDB_EMBEDDING_COLUMN", cls.embedding),
        )


@dataclass(frozen=True)
class SearchConfig:
    """Engine-level knobs; reference equivalents in comments."""

    strategy: str = "CosineSimilarity"  # SEARCH_STRATEGY, app.py:54
    index_enabled: bool = False  # INDEX_ENABLED, app.py:58
    search_top_size: int = DEFAULT_SEARCH_TOP_SIZE  # app.py:60
    #: compat mode: when True, reject filter+index together exactly like
    #: the reference (app.py:170-172). When False (native mode) the
    #: filter is applied after cluster pruning — a documented divergence.
    strict_filter_index_exclusion: bool = True
    columns: ColumnMap = field(default_factory=ColumnMap)

    def __post_init__(self) -> None:
        validate_strategy(self.strategy)
        if self.search_top_size < 1:
            raise ValueError("search_top_size must be a positive integer")

    def describe(self) -> dict:
        """Config echo, the engine-side analogue of GET /config
        (app.py:393-405)."""
        d = asdict(self)
        d["sort_order"] = "DESC" if sort_descending(self.strategy) else "ASC"
        return d
