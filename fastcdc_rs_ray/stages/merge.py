"""MERGE INTO (upsert + delete) — the lakehouse write-side operator.

Applies a change set (inserts / updates / deletes) to a base table in
ONE keyed exchange: base rows and change rows tag-union on the key, and
each partition resolves precedence locally (delete > update > base;
inserts are new keys).  This is the Delta/Iceberg ``MERGE INTO`` shape —
the op a crawl-store runs per snapshot to fold the day's changes into
the corpus — kept exact and SQL-oracled by deriving the change set
deterministically from the base table itself:

    update: doc_id % 7 == 0  -> text || ' [v2]'
    delete: doc_id % 13 == 0   (wins over update)
    insert: doc_id % 11 == 0 -> new row (doc_id + INSERT_OFFSET)

Output: (doc_id, n_chars, op) of the merged table — op in
{'base','update','insert'} records provenance (deleted keys emit no
row).  Exchange rows are (key, n_chars, op-code) fixed width; text
never moves (lengths are computed block-locally before the exchange).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

INSERT_OFFSET = 1_000_000

_MID = pa.schema([
    ("doc_id", pa.int64()), ("n_chars", pa.int64()), ("code", pa.int8()),
])
# code: 0 base, 1 update, 2 delete, 3 insert

_OUT = pa.schema([
    ("doc_id", pa.int64()), ("n_chars", pa.int64()), ("op", pa.string()),
])


def merge_snapshot(documents_ds, num_partitions: int = 8):
    def rows(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _MID.empty_table()
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        # synthetic-insert keys must not collide with real ones: a
        # colliding insert would silently shadow the base row in the
        # engine's max-code precedence while the SQL oracle's UNION ALL
        # emits both — RAISE instead of diverging (advice r02)
        if len(ids) and int(ids.max()) >= INSERT_OFFSET:
            raise ValueError(
                f"merge_snapshot: doc_id >= INSERT_OFFSET "
                f"({INSERT_OFFSET}) — raise the offset to keep synthetic "
                f"insert keys collision-free")
        nch = pc.utf8_length(t["text"]).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        out_id = [ids]
        out_n = [nch]
        out_c = [np.zeros(len(ids), np.int8)]
        upd = ids % 7 == 0
        if upd.any():
            out_id.append(ids[upd])
            out_n.append(nch[upd] + len(" [v2]"))
            out_c.append(np.full(int(upd.sum()), 1, np.int8))
        dele = ids % 13 == 0
        if dele.any():
            out_id.append(ids[dele])
            out_n.append(np.zeros(int(dele.sum()), np.int64))
            out_c.append(np.full(int(dele.sum()), 2, np.int8))
        ins = ids % 11 == 0
        if ins.any():
            new_ids = ids[ins] + INSERT_OFFSET
            # inserted text: 'new ' || doc_id  (length = 4 + digits)
            ln = np.asarray([4 + len(str(i)) for i in new_ids.tolist()],
                            np.int64)
            out_id.append(new_ids)
            out_n.append(ln)
            out_c.append(np.full(int(ins.sum()), 3, np.int8))
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_id), pa.int64()),
            "n_chars": pa.array(np.concatenate(out_n), pa.int64()),
            "code": pa.array(np.concatenate(out_c), pa.int8()),
        }).cast(_MID)

    mid = documents_ds.select_columns(["doc_id", "text"]).map_batches(
        rows, batch_format="pyarrow"
    ).repartition(num_blocks=num_partitions, keys=["doc_id"])

    def resolve(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _OUT.empty_table()
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        nch = t["n_chars"].combine_chunks().to_numpy(zero_copy_only=False)
        code = t["code"].combine_chunks().to_numpy(zero_copy_only=False)
        # precedence per key: delete(2) kills; else max code wins
        # (update 1 > base 0; insert 3 is a fresh key)
        order = np.lexsort((-code.astype(np.int64), ids))
        ids, nch, code = ids[order], nch[order], code[order]
        first = np.concatenate([[True], ids[1:] != ids[:-1]])
        ids, nch, code = ids[first], nch[first], code[first]
        keep = code != 2
        names = np.array(["base", "update", "delete", "insert"])
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "n_chars": pa.array(nch[keep], pa.int64()),
            "op": pa.array(names[code[keep]].tolist(), pa.string()),
        }).cast(_OUT)

    return mid.map_batches(resolve, batch_format="pyarrow", batch_size=None)


MERGE_SNAPSHOT_SQL = f"""
WITH merged AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN strlen(text) + 5
              ELSE strlen(text) END AS n_chars,
         CASE WHEN doc_id % 7 = 0 THEN 'update' ELSE 'base' END AS op
  FROM documents
  WHERE doc_id % 13 <> 0
  UNION ALL
  SELECT doc_id + {INSERT_OFFSET},
         4 + strlen(CAST(doc_id + {INSERT_OFFSET} AS VARCHAR)),
         'insert'
  FROM documents WHERE doc_id % 11 = 0
)
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, op FROM merged
"""
