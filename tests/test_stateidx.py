"""incremental_dedup: sharded-actor index keeps min doc_id per distinct
content, with duplicate groups deliberately split across blocks."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from fastcdc_rs_ray.stages.stateidx import incremental_dedup


def test_incremental_dedup_min_id(ray_session, tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(23)
    base = [f"doc body {i} " + "x" * int(rng.integers(5, 40))
            for i in range(60)]
    # duplicate every 3rd text under higher ids, shuffled so groups span blocks
    texts = base + [base[i] for i in range(0, 60, 3)]
    ids = np.arange(len(texts), dtype=np.int64)
    perm = rng.permutation(len(texts))
    t = pa.table({
        "doc_id": pa.array(ids[perm], pa.int64()),
        "text": pa.array([texts[i] for i in perm], pa.string()),
    })
    path = str(tmp_path / "docs.parquet")
    pq.write_table(t, path)

    out = incremental_dedup(
        rd.read_parquet(path).repartition(9), n_shards=3
    ).to_pandas()

    # numpy reference: min doc_id per distinct text
    ref = {}
    for i, txt in zip(ids[perm], [texts[i] for i in perm]):
        ref[txt] = min(ref.get(txt, 1 << 62), int(i))
    assert sorted(out["doc_id"]) == sorted(ref.values())
    assert len(out) == 60  # one survivor per distinct text
