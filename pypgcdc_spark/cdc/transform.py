"""Decoded pgoutput message stream -> ChangeEvent envelope rows.

Capability twin of the reference's transform layer (``reader.py:203-398``,
operators T1-T12 in SURVEY §2.1): holds the open-transaction context across
a Begin..Commit span, maintains the schema registry on Relation messages,
extracts keys per replica identity, and emits one envelope row per
I/U/D/T message.  Runs inside the source partition reader (executor-side),
one instance per transaction range — no cross-partition mutable state.

Deliberate fixes vs the reference (SURVEY §7.4):
Q2 Origin/Type messages are counted and skipped (reference crashes);
Q3 TRUNCATE emits a real ``op='T'`` row per relation (reference dead code);
Q6 TOAST 'u' becomes the ``TOAST_UNCHANGED`` sentinel (reference: None).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Iterator, Optional

from pypgcdc_spark.cdc import pgoutput as pg
from pypgcdc_spark.cdc.models import TOAST_UNCHANGED, ChangeEvent, TableSchema
from pypgcdc_spark.cdc.registry import SchemaRegistry


def _tuple_to_dict(td: pg.TupleData, schema: TableSchema) -> Dict[str, Optional[str]]:
    """Positional zip of wire columns with registered definitions
    (reference T2, ``reader.py:52-58``) + TOAST sentinel (Q6)."""
    out: Dict[str, Optional[str]] = {}
    for cdef, cdata in zip(schema.column_definitions, td.columns):
        if cdata.category == pg.COL_TEXT:
            out[cdef.name] = cdata.value
        elif cdata.category == pg.COL_UNCHANGED_TOAST:
            out[cdef.name] = TOAST_UNCHANGED
        else:
            out[cdef.name] = None
    return out


@dataclass
class _TxContext:
    tx_id: int
    begin_lsn: int  # frame LSN of the Begin message itself
    final_lsn: int  # Begin.final_lsn = the transaction's END lsn (spec)
    commit_ts: object


@dataclass
class TransformStats:
    ignored_origin: int = 0
    ignored_type: int = 0
    relations: int = 0
    events: int = 0


@dataclass
class MessageTransformer:
    registry: SchemaRegistry = field(default_factory=SchemaRegistry)
    stats: TransformStats = field(default_factory=TransformStats)
    _tx: Optional[_TxContext] = None

    def feed(self, lsn: int, payload: bytes) -> Iterator[ChangeEvent]:
        """Transform one raw replication message; yields 0..n envelope rows."""
        msg = pg.decode_message(payload)
        if isinstance(msg, pg.Begin):
            # begin_lsn = the Begin frame's own LSN; Begin.final_lsn is the
            # tx *end* LSN per spec and populates commit_lsn (ADVICE r1: the
            # two were previously conflated, both set to final_lsn).
            self._tx = _TxContext(msg.tx_xid, lsn, msg.final_lsn, msg.commit_ts)
            return
        if isinstance(msg, pg.Commit):
            # Offset to ack is the commit *end* LSN — named what it is,
            # unlike the reference's begin_lsn-that-is-really-end (Q7).
            self._tx = None
            return
        if isinstance(msg, pg.Origin):
            self.stats.ignored_origin += 1
            return
        if isinstance(msg, pg.PgType):
            self.stats.ignored_type += 1
            return
        if isinstance(msg, pg.Relation):
            self.registry.register_relation(msg, lsn=lsn)
            self.stats.relations += 1
            return
        if isinstance(msg, pg.Truncate):
            for rid in msg.relation_ids:
                schema = self.registry.get(rid)
                yield self._event("T", lsn, schema)
                self.stats.events += 1
            return
        if isinstance(msg, pg.Insert):
            schema = self._schema(msg.relation_id)
            after = _tuple_to_dict(msg.new_tuple, schema)
            ev = self._event("I", lsn, schema, after=after)
            ev.key = {k: after.get(k) for k in schema.get_key_columns()}
            self.stats.events += 1
            yield ev
            return
        if isinstance(msg, pg.Update):
            schema = self._schema(msg.relation_id)
            after = _tuple_to_dict(msg.new_tuple, schema)
            before = (
                _tuple_to_dict(msg.old_tuple, schema) if msg.old_tuple is not None else None
            )
            key_cols = schema.get_key_columns()
            if before is not None:
                old_key = {k: before.get(k) for k in key_cols}
                new_key = {k: after.get(k) for k in key_cols}
                if old_key != new_key and any(
                    old_key[k] is not None for k in key_cols
                ):
                    # Pkey-CHANGING update (Postgres only sends an old image
                    # under RI DEFAULT when the key changed): a single U
                    # keyed by the old pkey would strand the new key —
                    # current_state would never materialize the row under
                    # it (ADVICE r2). Keyed last-writer-wins semantics
                    # require the D(old-key) + I(new-key) pair.
                    d = self._event("D", lsn, schema, before=before)
                    d.key = old_key
                    self.stats.events += 1
                    yield d
                    ins = self._event("I", lsn, schema, after=after)
                    ins.key = new_key
                    self.stats.events += 1
                    yield ins
                    return
            ev = self._event("U", lsn, schema, before=before, after=after)
            # Key: ALWAYS the pkey projection (values from the before-image
            # when replica identity sent one, else from after). A full
            # before-image key (RI FULL / 'K' padding) would never collide
            # with the pkey-projected Insert keys, so current_state's
            # key-partitioned dedup would keep superseded rows (ADVICE r1).
            key_src = before if before is not None else after
            ev.key = {k: key_src.get(k) for k in schema.get_key_columns()}
            self.stats.events += 1
            yield ev
            return
        if isinstance(msg, pg.Delete):
            schema = self._schema(msg.relation_id)
            before = _tuple_to_dict(msg.old_tuple, schema)
            ev = self._event("D", lsn, schema, before=before)
            # Same pkey projection as Insert/Update — a Delete must land in
            # the same key partition as the rows it tombstones (ADVICE r1).
            ev.key = {k: before.get(k) for k in schema.get_key_columns()}
            self.stats.events += 1
            yield ev
            return
        raise ValueError(f"unhandled pgoutput message {type(msg).__name__}")

    def _schema(self, relation_id: int) -> TableSchema:
        schema = self.registry.get(relation_id)
        if schema is None:
            raise LookupError(
                f"relation {relation_id} seen before its Relation message; "
                "replay must start at a point that includes the R message"
            )
        return schema

    def _event(
        self,
        op: str,
        lsn: int,
        schema: Optional[TableSchema],
        before: Optional[Dict[str, Optional[str]]] = None,
        after: Optional[Dict[str, Optional[str]]] = None,
    ) -> ChangeEvent:
        tx = self._tx
        return ChangeEvent(
            op=op,
            lsn=lsn,
            tx_id=tx.tx_id if tx else None,
            begin_lsn=tx.begin_lsn if tx else None,
            commit_lsn=tx.final_lsn if tx else None,
            commit_ts=tx.commit_ts if tx else None,
            database=schema.db if schema else None,
            namespace=schema.namespace if schema else None,
            table=schema.table if schema else None,
            before=before,
            after=after,
        )
