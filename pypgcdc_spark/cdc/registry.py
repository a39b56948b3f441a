"""Versioned dynamic schema registry.

Twin of the reference's ``MetadataStore`` (``stores.py:121-156``) — four
flat dicts keyed ``(db, relation_id)`` — upgraded to *versioned* entries so
a mid-stream ``ALTER TABLE`` replaces rather than silently keeps the stale
schema (reference defect Q4, ``reader.py:246-248``).

The registry lives on the driver; it is a plain picklable dict so it can be
broadcast to executors or serialized into the streaming checkpoint dir.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from pypgcdc_spark.cdc.models import ColumnDefinition, TableSchema
from pypgcdc_spark.cdc.pgoutput import Relation

# Minimal OID -> type-name map for the types the reference exercises
# (tests/fixtures use integer, bigint, text, timestamptz, numeric, jsonb —
# SURVEY §1.2).  A live source would resolve unknown OIDs via
# ``format_type`` catalog queries (reference utils.py:79-83); the replay
# backend has no catalog, so unknown OIDs degrade to text, which is always
# safe because pgoutput values arrive text-formatted anyway.
PG_OID_TYPES = {
    16: "boolean",
    17: "bytea",
    20: "bigint",
    21: "smallint",
    23: "integer",
    25: "text",
    114: "json",
    700: "real",
    701: "double precision",
    1043: "character varying",
    1082: "date",
    1114: "timestamp without time zone",
    1184: "timestamp with time zone",
    1700: "numeric",
    3802: "jsonb",
}


@dataclass
class SchemaVersion:
    version: int
    schema: TableSchema
    first_lsn: int  # LSN at/after which this version applies


@dataclass
class SchemaRegistry:
    """``(db, relation_id) -> [SchemaVersion...]`` with latest-wins lookup."""

    database: str = "replay"
    _versions: Dict[Tuple[str, int], List[SchemaVersion]] = field(default_factory=dict)
    # Versions dropped by prune_below: the revision watermark stays
    # monotone (and equal to what a from-scratch log rescan would count)
    # by accounting for pruned history.
    _pruned: int = 0

    def register_relation(self, rel: Relation, lsn: int = 0, db: Optional[str] = None) -> TableSchema:
        """Upsert from a decoded ``R`` message. New version only on change."""
        db = db or self.database
        cols = [
            ColumnDefinition(
                name=c.name,
                part_of_pkey=c.part_of_pkey,
                type_id=c.type_id,
                type_name=PG_OID_TYPES.get(c.type_id, "text"),
                optional=not c.part_of_pkey,
                atttypmod=c.atttypmod,
            )
            for c in rel.columns
        ]
        schema = TableSchema(
            db=db,
            namespace=rel.namespace,
            table=rel.relation_name,
            relation_id=rel.relation_id,
            column_definitions=cols,
        )
        key = (db, rel.relation_id)
        chain = self._versions.setdefault(key, [])
        # Idempotent by LSN: a partition reader replays R frames the driver
        # scan already registered. If the version in force at `lsn` is this
        # exact schema, the re-feed is a no-op — blindly appending would put
        # an OLD schema at the chain tail and corrupt get_at_lsn (the chain
        # must stay ordered by first_lsn).
        in_force = None
        for v in chain:
            if v.first_lsn <= lsn:
                in_force = v
        if in_force is not None and in_force.schema == schema:
            return in_force.schema
        if chain and chain[-1].schema == schema:
            return chain[-1].schema
        chain.append(SchemaVersion(version=len(chain) + 1, schema=schema, first_lsn=lsn))
        chain.sort(key=lambda v: v.first_lsn)
        # Renumber after the sort: an out-of-LSN-order registration (a
        # replayed R frame introducing a different schema at an older
        # LSN) must leave version numbers aligned with chain position,
        # or history-view suffixes drift from LSN-span order.
        for i, v in enumerate(chain):
            v.version = i + 1
        return schema

    def get(self, relation_id: int, db: Optional[str] = None) -> Optional[TableSchema]:
        chain = self._versions.get((db or self.database, relation_id))
        return chain[-1].schema if chain else None

    def get_at_lsn(self, relation_id: int, lsn: int, db: Optional[str] = None) -> Optional[TableSchema]:
        """Schema version in force at ``lsn`` (typed views over history)."""
        chain = self._versions.get((db or self.database, relation_id))
        if not chain:
            return None
        current = chain[0]
        for v in chain:
            if v.first_lsn <= lsn:
                current = v
        return current.schema

    def tables(self) -> List[TableSchema]:
        return [chain[-1].schema for chain in self._versions.values()]

    def prune_below(self, lsn_floor: int) -> int:
        """Drop schema versions that can never be consulted again.

        For each relation, keep the version IN FORCE at ``lsn_floor``
        (the newest version with ``first_lsn <= floor``) and everything
        after it; versions wholly superseded below the floor are dead —
        no replayable batch starts below a durably-acked offset, so
        ``get_at_lsn`` will never be asked about their span again.

        This is the version-history analog of the reader's snapshot GC:
        without it the registry (and so every persisted snapshot) grows
        O(total versions) — under the round-8 soak's DDL storm (1,599
        ALTERs) the latest snapshot reached 147 MB because every
        column-add version was retained forever.  Returns the number of
        versions dropped; ``revision`` is unchanged (the monotone
        watermark accounts for pruned history, and a from-scratch log
        rescan re-counts the same total)."""
        dropped = 0
        for chain in self._versions.values():
            keep_from = 0
            for i, v in enumerate(chain):
                if v.first_lsn <= lsn_floor:
                    keep_from = i
            if keep_from:
                dropped += keep_from
                del chain[:keep_from]
        self._pruned += dropped
        return dropped

    # -- persistence (checkpoint survival; the reference loses its registry
    # -- on restart and re-learns from Relation messages) -------------------
    @property
    def revision(self) -> int:
        """Monotone mutation watermark: the total number of schema
        versions across all relations.  Log scanning is deterministic,
        so the registry content at revision N is identical no matter
        how many times the scan is rebuilt — N keys a stable snapshot
        (the offset watermark of the ``pgcdc`` source)."""
        return self._pruned + sum(len(chain) for chain in self._versions.values())

    def dumps(self) -> str:
        return json.dumps(
            {
                "database": self.database,
                "pruned": self._pruned,
                "entries": [
                    {
                        "db": db,
                        "relation_id": rid,
                        "versions": [
                            {
                                "version": v.version,
                                "first_lsn": v.first_lsn,
                                "namespace": v.schema.namespace,
                                "table": v.schema.table,
                                "columns": [vars(c) for c in v.schema.column_definitions],
                            }
                            for v in chain
                        ],
                    }
                    for (db, rid), chain in self._versions.items()
                ],
            }
        )

    @classmethod
    def loads(cls, s: str) -> "SchemaRegistry":
        data = json.loads(s)
        reg = cls(database=data["database"])
        reg._pruned = int(data.get("pruned", 0))  # absent in pre-r8 snapshots
        for e in data["entries"]:
            chain = []
            for v in e["versions"]:
                cols = [ColumnDefinition(**c) for c in v["columns"]]
                ts = TableSchema(
                    db=e["db"],
                    namespace=v["namespace"],
                    table=v["table"],
                    relation_id=e["relation_id"],
                    column_definitions=cols,
                )
                chain.append(SchemaVersion(v["version"], ts, v["first_lsn"]))
            reg._versions[(e["db"], e["relation_id"])] = chain
        return reg
