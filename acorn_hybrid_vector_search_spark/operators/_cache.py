"""Session-scoped pinned materialization for relations consumed by
multiple plan subtrees (self-join sides, count-then-probe patterns).

Spark's exchange reuse does not fire across two consumers of the same
subtree when the consuming joins carry extra conjuncts or sit in
different stages, so an expensive shared relation (signature table,
tokenized corpus) would be computed once PER CONSUMER. Persisting and
eagerly materializing it restores compute-once; at production scale the
same relation is what a pipeline writes to an intermediate table, and
persist is the in-session equivalent (MEMORY_AND_DISK — these relations
are row-scaled).

A small LRU bounds the pinned set: repeated operator calls (bench loops,
notebooks) would otherwise accumulate cache entries without limit and
degrade the whole session. Evicting an entry a caller still holds only
costs recompute on next use — never correctness.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

__all__ = ["materialize"]

_PINNED: list[DataFrame] = []
_PINNED_MAX = 4


def materialize(df: DataFrame) -> DataFrame:
    """Persist + eagerly compute ``df`` (the eager count matters: lazy
    persistence lets consumer stages race and each compute the subtree
    anyway). Returns the persisted frame."""
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    _PINNED.append(df)
    while len(_PINNED) > _PINNED_MAX:
        _PINNED.pop(0).unpersist()
    return df
