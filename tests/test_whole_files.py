"""pre_partitioned contract vs Ray's dynamic block splitting.

A conversation-contiguous FILE layout only implies conversation-contiguous
BLOCKS if the read doesn't split a file's rows mid-conversation; Ray's
read_parquet does exactly that when its target parallelism exceeds the
file count (observed: ~0.3% of conversations fragmented -> duplicate
signature rows -> duplicate cluster rows on the driver-CC path).
``read_transcripts(whole_files=True)`` pins one block per file, restoring
the contract."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from fastcdc_rs_ray.stages.assemble import assemble
from fastcdc_rs_ray.sources.transcripts import read_transcripts


def _write_corpus(root, n_convs_per_file=800, n_files=2, turns=6):
    root.mkdir(exist_ok=True)
    k = 0
    for f in range(n_files):
        conv = []
        tidx = []
        text = []
        for _ in range(n_convs_per_file):
            cid = f"c{k:07d}"
            k += 1
            for t in range(turns):
                conv.append(cid)
                tidx.append(t)
                text.append(f"turn {t} of {cid} " + "x" * (17 + (k * 7 + t) % 40))
        pq.write_table(
            pa.table({
                "conv_id": pa.array(conv, pa.string()),
                "turn_idx": pa.array(tidx, pa.int32()),
                "text": pa.array(text, pa.string()),
            }),
            root / f"part-{f:03d}.parquet",
        )
    return k


def test_whole_files_read_preserves_conversation_contiguity(ray_session):
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as td:
        root = Path(td) / "corpus"
        n = _write_corpus(root)
        ds = read_transcripts(str(root), columns=["conv_id", "turn_idx", "text"],
                              whole_files=True)
        conv = assemble(ds, pre_partitioned=True)
        tbl = pa.concat_tables([
            b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
            for b in conv.select_columns(["conv_id", "n_turns"]).iter_batches(
                batch_format="pyarrow")
        ])
        ids = tbl["conv_id"].to_pylist()
        # exactly one assembled row per conversation, each with ALL its turns
        assert len(ids) == n == len(set(ids))
        assert np.all(tbl["n_turns"].to_numpy() == 6)
