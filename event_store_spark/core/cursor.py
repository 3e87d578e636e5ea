"""Replay cursors: the ``(lsn, id)`` row-value keyset.

Mirrors the reference's replication cursor semantics
(`EventReplicatorWorker.java:54-72`): resume strictly *after* (lsn, id),
which skips already-replicated rows even when several rows share an lsn
(same-commit siblings). Persisted format ``"<lsn>:<id>"`` like the
reference's progress values (`EventReplicatorWorker.java:262-297` — there
``"0/17:23"`` with a pg_lsn; here lsn is a plain long).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True, order=True)
class Cursor:
    lsn: int
    id: int

    def serialize(self) -> str:
        return f"{self.lsn}:{self.id}"

    @classmethod
    def parse(cls, s: str) -> "Cursor":
        lsn, _, id_ = s.partition(":")
        return cls(int(lsn), int(id_))

    #: replay-from-the-beginning cursor (reference initializes to "0/0:0")
    @classmethod
    def zero(cls) -> "Cursor":
        return cls(0, -1)


def keyset_after(cursor: Cursor, lsn: Column | str = "lsn", id: Column | str = "id") -> Column:
    """Row-value predicate ``(lsn, id) > (cursor.lsn, cursor.id)``.

    Spark has no row-value comparison; the expanded disjunction is
    equivalent and still pushes down to the scan (file skipping via
    parquet min/max stats on an lsn-sorted layout — the same role the
    reference's lsn index plays, events_schema.sql:12).
    """
    lsn_c = F.col(lsn) if isinstance(lsn, str) else lsn
    id_c = F.col(id) if isinstance(id, str) else id
    return lsn_c.isNotNull() & (
        (lsn_c > cursor.lsn) | ((lsn_c == cursor.lsn) & (id_c > cursor.id))
    )
